"""Breakdown of the refine-on pipeline cost (ROADMAP round-4 #3).

Instruments the per-state fleet scorer (RefineHook._pack_states /
_score_states) to split the refine-hook cost into host packing, device
dispatch+compute, and readback; prints a summary after a refine-on pipeline
run. Drives the same configuration as `bench.py --stage pipeline --refine`.

    python scripts/profile_refine_hook.py [--num 64]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num", type=int, default=64)
    p.add_argument("--beam", type=int, default=5)
    args = p.parse_args()

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

    coarse, cparams, denoise = make_models(coarse_kw={"compute_dtype": "bfloat16"})
    gen = SyntheticTreeGenerator(seed=0)
    dummy = {k: jnp.asarray(v) for k, v in
             make_denoise_batch(gen.sample_trees(2, n=8), random.Random(0), max_n=8).items()}
    dparams = jax.jit(denoise.init)(jax.random.PRNGKey(2), dummy)

    rmodel = NodeRefine()
    rb = {k: jnp.asarray(v) for k, v in
          make_refine_batch(gen.sample_trees(2, n=8), random.Random(1), max_n=8).items()}
    rparams = jax.jit(rmodel.init)(jax.random.PRNGKey(3), rb)
    hook = RefineHook(rmodel, rparams, np.asarray(Vocab().mol_sizes))

    stats = {"pack_s": 0.0, "score_s": 0.0, "calls": 0, "states": 0,
             "pad_states": 0, "check_host_s": 0.0, "check_calls": 0}

    orig_pack = hook._pack_states
    orig_score = hook._score_states
    orig_check = hook.check_batch

    def timed_pack(states, nb, sp):
        t0 = time.perf_counter()
        out = orig_pack(states, nb, sp)
        jax.block_until_ready(out)
        stats["pack_s"] += time.perf_counter() - t0
        return out

    def timed_score(base, wids_rows, nb, sp):
        t0 = time.perf_counter()
        out = orig_score(base, wids_rows, nb, sp)
        stats["score_s"] += time.perf_counter() - t0
        stats["calls"] += 1
        stats["states"] += len(wids_rows)
        stats["pad_states"] += sp
        return out

    def timed_check(states):
        t0 = time.perf_counter()
        out = orig_check(states)
        stats["check_host_s"] += time.perf_counter() - t0
        stats["check_calls"] += 1
        return out

    hook._pack_states = timed_pack
    hook._score_states = timed_score
    hook.check_batch = timed_check

    pipe = GenerationPipeline(coarse, cparams, denoise, dparams,
                              histogram=load_geom_histogram(), beam_size=args.beam,
                              refine_hook=hook)
    pipe.run(jax.random.PRNGKey(3), args.num, reconstruct=False, batch_size=64)  # compile
    for k in stats:
        stats[k] = 0
    t0 = time.perf_counter()
    result = pipe.run(jax.random.PRNGKey(3), args.num, reconstruct=False, batch_size=64)
    wall = time.perf_counter() - t0
    ok = sum(t is not None for t in result.trees)

    other = stats["check_host_s"] - stats["pack_s"] - stats["score_s"]
    print(f"molecules={args.num} ok={ok} wall={wall:.2f}s")
    print(f"refine-hook total   {stats['check_host_s']:.2f}s "
          f"({100 * stats['check_host_s'] / wall:.0f}% of wall, "
          f"{stats['check_calls']} fleet rounds)")
    print(f"  pack (host)       {stats['pack_s']:.2f}s")
    print(f"  score (device+rb) {stats['score_s']:.2f}s")
    print(f"  host select/other {other:.2f}s")
    print(f"  calls={stats['calls']} states={stats['states']} "
          f"padded={stats['pad_states']}")


if __name__ == "__main__":
    main()
