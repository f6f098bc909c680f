"""Same-window A/B of the refine-on pipeline: round-3 per-job hook vs the
per-state device scorer (ROADMAP round-4 #3).

The old implementation (one job per (state, assigned-node), host packing per
job, (jobs, 780) logits readback, host softmax) is reconstructed here as a
RefineHook subclass from the still-present building blocks so both variants
run in ONE process/window — the only methodology under which tunnel numbers
are comparable (BASELINE.md contention note).

    python scripts/refine_ab.py [--num 256] [--reps 3]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/hierdiff_tpu_xla"))

import argparse
import random

import numpy as np


def build(args):
    import jax
    import jax.numpy as jnp

    from bench import make_models
    from hierdiff_tpu.chem.mol_tree import Vocab
    from hierdiff_tpu.data.assets import load_geom_histogram
    from hierdiff_tpu.data.denoise import make_denoise_batch
    from hierdiff_tpu.data.refine import make_refine_batch
    from hierdiff_tpu.data.synthetic import SyntheticTreeGenerator
    from hierdiff_tpu.models.refine import NodeRefine
    from hierdiff_tpu.sampling.pipeline import GenerationPipeline
    from hierdiff_tpu.sampling.refine_hook import RefineHook

    class OldRefineHook(RefineHook):
        """Round-3 check_batch: per-job packing + host softmax."""

        def check_batch(self, states):
            results = [(s, 0.0, False) for s in states]
            meta, jobs = [], []
            for si, s in enumerate(states):
                assigned = np.nonzero(s.wids >= 0)[0]
                if len(assigned) * self.check_frac <= 1:
                    continue
                meta.append((si, assigned, len(jobs)))
                jobs.extend((s, s.wids, int(n)) for n in assigned)
            if not jobs:
                return results
            logits = self._score_nodes(jobs)
            pending = []
            for si, assigned, off in meta:
                s = states[si]
                wids = s.wids.copy()
                logps, top = self._logps_from_logits(
                    wids, assigned, logits[off: off + len(assigned)])
                total = logps.sum()
                order = np.argsort(logps)
                n_check = int(len(assigned) * self.check_frac)
                cand = [(int(i), int(top[i])) for i in order[:n_check]
                        if i < len(assigned) * 0.5 and top[i] != wids[assigned[i]]]
                if cand:
                    pending.append([si, assigned, wids, total, cand])
            while pending:
                jobs, spans = [], []
                for si, assigned, wids, total, cand in pending:
                    pos, new_wid = cand[0]
                    new_wids = wids.copy()
                    new_wids[int(assigned[pos])] = new_wid
                    spans.append((len(jobs), new_wids))
                    jobs.extend((states[si], new_wids, int(n)) for n in assigned)
                logits = self._score_nodes(jobs)
                nxt = []
                for (si, assigned, wids, total, cand), (off, new_wids) in zip(pending, spans):
                    pos, new_wid = cand.pop(0)
                    node = int(assigned[pos])
                    new_logps, _ = self._logps_from_logits(
                        new_wids, assigned, logits[off: off + len(assigned)])
                    ok = new_logps.sum() > total
                    if ok:
                        perturbed = states[si].clone()
                        perturbed.wids = new_wids
                        if self.can_assemble is not None and not self.can_assemble(perturbed, node):
                            ok = False
                        else:
                            results[si] = (perturbed, float(total - new_logps.sum()), True)
                    if not ok and cand:
                        nxt.append([si, assigned, wids, total, cand])
                pending = nxt
            return results

    coarse, cparams, denoise = make_models(coarse_kw={"compute_dtype": "bfloat16"})
    gen = SyntheticTreeGenerator(seed=0)
    dummy = {k: jnp.asarray(v) for k, v in
             make_denoise_batch(gen.sample_trees(2, n=8), random.Random(0), max_n=8).items()}
    dparams = jax.jit(denoise.init)(jax.random.PRNGKey(2), dummy)
    rmodel = NodeRefine()
    rb = {k: jnp.asarray(v) for k, v in
          make_refine_batch(gen.sample_trees(2, n=8), random.Random(1), max_n=8).items()}
    rparams = jax.jit(rmodel.init)(jax.random.PRNGKey(3), rb)
    sizes = np.asarray(Vocab().mol_sizes)

    def make_pipe(kind):
        cls = OldRefineHook if kind == "old" else RefineHook
        gate = None
        if args.gate_reject > 0:
            from bench import _synthetic_gate
            gate = _synthetic_gate(args.gate_reject)
        hook = cls(rmodel, rparams, sizes, can_assemble=gate)
        return GenerationPipeline(coarse, cparams, denoise, dparams,
                                  histogram=load_geom_histogram(), beam_size=5,
                                  refine_hook=hook, can_assemble=gate)

    return make_pipe


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num", type=int, default=256)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--gate-reject", type=float, default=0.0,
                   help="synthetic assembly-gate rejection rate (bench.py "
                        "--gate-reject): A/B the hooks under beam backtracking")
    p.add_argument("--stats", action="store_true",
                   help="print per-rep hook dispatch/pack counters")
    args = p.parse_args()
    import jax

    make_pipe = build(args)
    pipes = {k: make_pipe(k) for k in ("old", "new")}
    for k, pipe in pipes.items():   # compile both before any timing
        pipe.run(jax.random.PRNGKey(3), args.num, reconstruct=False, batch_size=64)
    best = {}
    for rep in range(args.reps):
        for k, pipe in pipes.items():   # interleave arms within the window
            t0 = time.perf_counter()
            r = pipe.run(jax.random.PRNGKey(3), args.num, reconstruct=False,
                         batch_size=64)
            dt = time.perf_counter() - t0
            ok = sum(t is not None for t in r.trees)
            best[k] = min(best.get(k, 1e9), dt)
            print(f"rep{rep} {k}: {dt:.2f}s ({ok}/{args.num} ok, "
                  f"{ok / dt:.1f} mol/s)", flush=True)
            if args.stats:
                st = pipe.sampler.refine_hook.stats
                print(f"        stats: {st['score_calls']} dispatches "
                      f"({st['score_rows']} rows, {st['score_s']:.2f}s), "
                      f"{st['pack_calls']} packs ({st['pack_s']:.2f}s)",
                      flush=True)
                for key in st:
                    st[key] = 0 if isinstance(st[key], int) else 0.0
    print(f"BEST old={best['old']:.2f}s new={best['new']:.2f}s "
          f"speedup={best['old'] / best['new']:.2f}x")


if __name__ == "__main__":
    main()
