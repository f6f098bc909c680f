"""Benchmark: molecule generation throughput on one TPU chip.

Default (driver mode) prints ONE JSON line for the headline metric —
the REFERENCE-SHAPED end-to-end pipeline: 1000-step coarse EDM sampling +
beam-5 lattice AR assembly WITH the check_tree refine perturbation on every
queue pop, exactly the configuration the reference always runs
(generation/ar_sampling_nosize.py:138-143), 1024 molecules at batch 256
(256-molecule chunks leave the group round-robin nothing to pipeline
across — 1024 measures the steady state the 10k sweep runs at):

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline divides by the measured reference throughput in
BASELINE_MEASURED.json (1000 sequential torch EGNN forwards at the same
config; scripts/measure_baseline.py) — reference hardware there is torch-CPU
since its GPU env is unavailable; see BASELINE.md for the caveat. The
reference's end-to-end rate is strictly below its coarse stage alone, so
the ratio is a LOWER bound on the true end-to-end speedup.

Extra modes (one JSON line each):
  python bench.py --stage coarse                   # coarse stage alone
  python bench.py --stage coarse --max-n 48        # GEOM-realistic bucket
  python bench.py --stage coarse --max-n 96 --pallas
  python bench.py --stage fine                     # lattice AR assembly
  python bench.py --stage pipeline --num 10000     # 10k sweep (no refine)
  python bench.py --gate-reject 0.2                # + synthetic assembly gate

The coarse mode also reports achieved TFLOP/s and MFU (XLA compiled-cost
FLOPs / wall clock / peak; peak defaults to 197 TFLOP/s bf16 for v5e —
override with BENCH_PEAK_TFLOPS).
"""

import argparse
import json
import os
import time
from pathlib import Path

import numpy as np


def _baseline(key: str):
    f = Path(__file__).parent / "BASELINE_MEASURED.json"
    if f.exists():
        return json.loads(f.read_text()).get(key, {}).get("molecules_per_sec")
    return None


def _emit(metric, value, unit, ref, **extra):
    vs = round(value / ref, 2) if ref else 0.0
    rec = {"metric": metric, "value": round(value, 3), "unit": unit,
           "vs_baseline": vs}
    rec.update(extra)
    print(json.dumps(rec))


def make_models(coarse_kw=None, denoise_kw=None):
    import jax
    import jax.numpy as jnp

    from hierdiff_tpu.models import CoarseDiffusion
    from hierdiff_tpu.models.edge_denoise import EdgeDenoise
    from hierdiff_tpu.sampling import make_masks_for_counts

    coarse = CoarseDiffusion(in_node_nf=8, timesteps=1000, hidden_nf=256,
                             n_layers=6, inv_sublayers=2,
                             noise_schedule="learned", **(coarse_kw or {}))
    nm, em = make_masks_for_counts(np.array([6, 8]), 8)
    cb = {"positions": jnp.zeros((2, 8, 3)), "node_feature": jnp.zeros((2, 8, 8)),
          "atom_mask": jnp.asarray(nm), "edge_mask": jnp.asarray(em)}
    cparams = jax.jit(lambda r, b, r2: coarse.init(r, b, r2, train=True))(
        jax.random.PRNGKey(0), cb, jax.random.PRNGKey(1))
    denoise = EdgeDenoise(**(denoise_kw or {}))
    return coarse, cparams, denoise


def _egnn_matmul_flops(b: int, n: int, h: int, n_layers: int, inv: int,
                       e_dim: int = 2, attention: bool = True) -> float:
    """Analytic matmul FLOPs of one DenseEGNN forward (ops/egnn.py shapes).

    XLA's compiled cost_analysis is unreliable through the axon tunnel
    backend (returns ~3 orders of magnitude low), so MFU is computed from
    the exact matmul count: 2*rows*k*m per dense layer, pairwise layers over
    B*N^2 rows. Elementwise FLOPs are excluded (a few % at H=256)."""
    mm = lambda rows, k, m: 2.0 * rows * k * m
    gcl = (2 * mm(b * n, h, h)            # edge_in w_src + w_dst
           + mm(b * n * n, e_dim, h)      # edge_in w_e
           + mm(b * n * n, h, h)          # edge_out
           + (mm(b * n * n, h, 1) if attention else 0.0)
           + mm(b * n, 2 * h, h) + mm(b * n, h, h))   # node MLP
    coord = (2 * mm(b * n, h, h) + mm(b * n * n, e_dim, h)
             + mm(b * n * n, h, h) + mm(b * n * n, h, 1))
    return n_layers * (inv * gcl + coord)


def bench_coarse(batch_size: int, max_n: int = 12, use_pallas: bool = False,
                 bf16: bool = False, unroll: int = 1, steps: int = 0):
    import jax
    import jax.numpy as jnp

    from hierdiff_tpu.sampling import make_masks_for_counts, sample_coarse

    coarse, cparams, _ = make_models(coarse_kw={
        "use_pallas": use_pallas,
        "compute_dtype": "bfloat16" if bf16 else None})
    n_steps = steps or coarse.timesteps
    rng = np.random.default_rng(0)
    lo = max(4, max_n - 8)
    counts = rng.integers(lo, max_n + 1, size=batch_size)
    nm, em = make_masks_for_counts(counts, max_n)
    nm, em = jnp.asarray(nm), jnp.asarray(em)

    for i in range(2):  # compile + settle (the tunnel can report early)
        x, h = sample_coarse(coarse, cparams, jax.random.PRNGKey(2 + i), nm, em,
                             unroll=unroll, steps=steps or None)
        np.asarray(x)
    # steps+1 EGNN forwards (scan steps + the final x|z0 read-out)
    flops = (n_steps + 1) * _egnn_matmul_flops(
        batch_size, max_n, coarse.hidden_nf, coarse.n_layers, coarse.inv_sublayers)
    # best-of-reps: the tunneled TPU is shared, and run-to-run contention
    # swings wall clock ~2x; the fastest rep is the uncontended throughput
    reps, times = 5, []
    for i in range(reps):
        t0 = time.perf_counter()
        x, h = sample_coarse(coarse, cparams, jax.random.PRNGKey(10 + i), nm, em,
                             unroll=unroll, steps=steps or None)
        np.asarray(x), np.asarray(h)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    peak = float(os.environ.get("BENCH_PEAK_TFLOPS", "197")) * 1e12
    tflops = flops / dt / 1e12 if flops else 0.0
    mfu = flops / dt / peak if flops else 0.0
    ref = _baseline("ref_batch64_n12_T1000") if max_n == 12 else None
    kernel = "pallas" if use_pallas else ("xla-bf16" if bf16 else "xla")
    if unroll > 1:
        kernel += f"-unroll{unroll}"
    _emit("coarse_sampling_molecules_per_sec_per_chip", batch_size / dt,
          f"molecules/sec/chip ({n_steps}-step EDM, batch {batch_size}, N<={max_n}, {kernel})",
          ref if n_steps == coarse.timesteps else None,
          tflops=round(tflops, 2), mfu=round(mfu, 4))


def bench_fine(n_molecules: int, beam: int, max_n: int = 12,
               fine_bf16: bool = False):
    import jax
    import random

    from hierdiff_tpu.data.denoise import make_denoise_batch
    from hierdiff_tpu.data.synthetic import SyntheticTreeGenerator
    from hierdiff_tpu.sampling.lattice import LatticeSampler
    import jax.numpy as jnp

    _, _, denoise = make_models(denoise_kw=(
        {"compute_dtype": "bfloat16"} if fine_bf16 else {}))
    gen = SyntheticTreeGenerator(seed=0)
    dummy = {k: jnp.asarray(v) for k, v in
             make_denoise_batch(gen.sample_trees(2, n=8), random.Random(0), max_n=8).items()}
    dparams = jax.jit(denoise.init)(jax.random.PRNGKey(2), dummy)
    sampler = LatticeSampler(denoise, dparams, beam_size=beam)
    blur = [{"x": t.pos, "h": np.concatenate([np.round(t.feats[:, :5]), t.feats[:, 5:]], 1)}
            for t in gen.sample_trees(n_molecules, n=max_n)]
    sampler.sample(blur)  # compile all touched buckets
    t0 = time.perf_counter()
    results = sampler.sample(blur)
    dt = time.perf_counter() - t0
    ok = sum(r is not None for r in results)
    kern = "bf16" if fine_bf16 else "f32"
    _emit("fine_assembly_trees_per_sec_per_chip", ok / dt,
          f"trees/sec/chip (lattice AR, beam {beam}, {n_molecules} molecules, "
          f"N={max_n}, {kern})",
          None)


def _synthetic_gate(reject_frac: float):
    """Deterministic stand-in for the RDKit can_assemble gate: rejects a
    tunable fraction of (fragment, typed-neighbor-set) combos by hash, like
    the memoized real gate (chem/assemble_gate.py) but runnable without
    RDKit. Characterizes beam-search backtracking churn under rejection —
    the reference's actual cost driver (ar_sampling_nosize.py:199-200)."""
    import zlib

    stats = {"calls": 0, "rejects": 0}

    def verdict(wid: int, neis: tuple) -> bool:
        h = zlib.crc32(repr((int(wid), tuple(neis))).encode()) / 0xFFFFFFFF
        ok = h >= reject_frac
        stats["calls"] += 1
        stats["rejects"] += not ok
        return ok

    def gate(state, i: int) -> bool:
        wid = int(state.wids[i])
        if wid < 0:
            return True
        row = np.nonzero(state.adj[i])[0]
        neis = tuple(sorted(int(state.wids[j]) for j in row
                            if j != i and int(state.wids[j]) >= 0))
        if not neis:
            return True
        return verdict(wid, neis)

    gate.verdict = verdict  # native beam search fast path
    gate.stats = stats      # unique-key verdict calls (C++ memoizes keys)
    return gate


def bench_pipeline(n_molecules: int, beam: int, batch_size: int = 64,
                   steps: int = 0, bf16: bool = True, refine: bool = False,
                   gate_reject: float = 0.0, fine_buckets: bool = False,
                   reps: int = 3, size_variant: bool = False):
    import jax
    import random
    import jax.numpy as jnp

    from hierdiff_tpu.data.assets import load_geom_histogram
    from hierdiff_tpu.data.denoise import make_denoise_batch
    from hierdiff_tpu.data.synthetic import SyntheticTreeGenerator
    from hierdiff_tpu.sampling.pipeline import GenerationPipeline

    # --size-variant: the reference's ar_sampling.py:62-134 configuration —
    # fragment-type choices feed back into the trajectory
    # (vocab_conditioning), and each node's vocab support is restricted to
    # fragments matching its rounded heavy-atom-count feature
    # (size_support_indices, ar_sampling_nosize.py:115-122). This forces the
    # round-based ARSampler (one jitted ar_step per search round) instead of
    # the one-scan lattice shortcut — the cost of type feedback is the metric.
    coarse, cparams, denoise = make_models(
        coarse_kw={"compute_dtype": "bfloat16" if bf16 else None},
        denoise_kw={"vocab_conditioning": True} if size_variant else None)
    allowed_fn = None
    if size_variant:
        from hierdiff_tpu.data.refine import size_support_indices

        v = denoise.out_node_nf
        # blur h layout [hbd, fp0..fp4, tpsa, asa]; fp col 3 = heavy atoms
        allowed_fn = lambda feats: [
            np.asarray(size_support_indices(int(round(float(f[4]))), v),
                       np.int64) for f in feats]
    gen = SyntheticTreeGenerator(seed=0)
    dummy = {k: jnp.asarray(v) for k, v in
             make_denoise_batch(gen.sample_trees(2, n=8), random.Random(0), max_n=8).items()}
    dparams = jax.jit(denoise.init)(jax.random.PRNGKey(2), dummy)

    # SAMPLING_BUCKETS is the pipeline default since the round-4 TPU A/B
    # (+16%: BASELINE.md); --default-buckets restores the coarse set
    sample_buckets = None
    if fine_buckets == "default":
        from hierdiff_tpu.data.collate import DEFAULT_BUCKETS
        sample_buckets = DEFAULT_BUCKETS

    refine_hook = None
    if refine:
        # the reference ALWAYS runs the check_tree perturbation on every
        # queue pop (ar_sampling_nosize.py:138-143); this measures that cost
        # at the trained config scale (hidden 256)
        from hierdiff_tpu.chem.mol_tree import Vocab
        from hierdiff_tpu.data.refine import make_refine_batch
        from hierdiff_tpu.models.refine import NodeRefine
        from hierdiff_tpu.sampling.refine_hook import RefineHook

        rmodel = NodeRefine()
        rb = {k: jnp.asarray(v) for k, v in
              make_refine_batch(gen.sample_trees(2, n=8), random.Random(1),
                                max_n=8).items()}
        rparams = jax.jit(rmodel.init)(jax.random.PRNGKey(3), rb)
        refine_hook = RefineHook(rmodel, rparams, np.asarray(Vocab().mol_sizes),
                                 buckets=sample_buckets)

    gate = _synthetic_gate(gate_reject) if gate_reject > 0 else None

    # refine-on search pipelining A/B knobs (cap 0 = lockstep single
    # search; merge 1 = one dispatch per group round)
    rgc = os.environ.get("HIERDIFF_REFINE_GROUP_CAP")
    rgm = os.environ.get("HIERDIFF_REFINE_MERGE")
    pipe = GenerationPipeline(coarse, cparams, denoise, dparams,
                              histogram=load_geom_histogram(), beam_size=beam,
                              refine_hook=refine_hook, can_assemble=gate,
                              allowed_fn=allowed_fn,
                              sample_steps=steps or None,
                              sample_buckets=sample_buckets,
                              refine_group_cap=int(rgc) if rgc else None,
                              refine_merge=int(rgm) if rgm else None)
    # same key for warmup and timing: molecule sizes (and thus the set of
    # compiled buckets) must match or compiles leak into the timed region
    pipe.run(jax.random.PRNGKey(3), n_molecules, reconstruct=False,
             batch_size=batch_size)  # compile
    if refine_hook is not None:
        refine_hook.stats = {k: type(v)() for k, v in refine_hook.stats.items()}
    trace_dir = os.environ.get("HIERDIFF_BENCH_TRACE")
    if trace_dir:
        # profile exactly the timed (warm) run; parse with scripts/roofline
        # --parse-only or the offline per-source recipe in BASELINE.md
        jax.profiler.start_trace(trace_dir)
    # best-of-reps: the tunneled chip is SHARED and same-config readings
    # swing ~±20% between windows (BASELINE.md documents 38.9-56.9 mol/s
    # for this config) — a single timed run is a noisy snapshot. Like
    # coarse mode's best-of-5, take the fastest rep and report the spread.
    rep_times, result = [], None
    for _ in range(max(1, reps)):
        t0 = time.perf_counter()
        r = pipe.run(jax.random.PRNGKey(3), n_molecules, reconstruct=False,
                     batch_size=batch_size)
        rep_times.append(time.perf_counter() - t0)
        if result is None or rep_times[-1] == min(rep_times):
            result = r
    dt = min(rep_times)
    if trace_dir:
        jax.profiler.stop_trace()
    if refine_hook is not None and os.environ.get("HIERDIFF_BENCH_STATS"):
        # where the refine-on fine stage's wall goes (see RefineHook.stats)
        out = {"hook_stats": {
            k: (round(v, 3) if isinstance(v, float) else v)
            for k, v in refine_hook.stats.items()}}
        if gate is not None:
            out["gate_stats"] = dict(gate.stats)
        print(json.dumps(out), flush=True)
    ok = sum(t is not None for t in result.trees)
    st = result.stats or {}
    n_steps = steps or coarse.timesteps
    tags = ("+refine" if refine else "") + (
        f"+gate{gate_reject:g}" if gate_reject else "") + (
        "+default-buckets" if fine_buckets == "default" else "") + (
        "+size-variant(round-based AR)" if size_variant else "")
    # vs_baseline: the reference pipeline is not runnable here (RDKit), but
    # its measured coarse stage ALONE (torch-CPU, BASELINE_MEASURED.json) is
    # an upper bound on its end-to-end rate, so the ratio is a LOWER bound
    # on the true end-to-end speedup.
    _emit("pipeline_molecules_per_sec_per_chip", ok / dt,
          f"molecules/sec/chip ({n_steps}-step EDM + beam-{beam} lattice AR{tags}, "
          f"{n_molecules} molecules; vs_baseline is a lower bound vs the "
          f"reference's coarse stage alone)",
          _baseline("ref_batch64_n12_T1000"),
          t_coarse=round(st.get("t_coarse", 0.0), 2),
          t_fine=round(st.get("t_fine", 0.0), 2),
          assembled=ok,
          rep_mol_per_s=[round(ok / t, 1) for t in rep_times])


def main():
    from hierdiff_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    # default batch = the measured-best production batch (scripts/
    # batch_sweep.py: 1024 amortizes dispatch/scan gaps to 54% wall MFU,
    # +50% mol/s over batch 64; BASELINE.md round-4 lever (b))
    p.add_argument("batch", nargs="?", type=int, default=None)
    p.add_argument("--batch", dest="batch_flag", type=int, default=None,
                   help="alias for the positional batch size")
    p.add_argument("--stage", choices=["coarse", "fine", "pipeline"],
                   default=None,
                   help="default: the reference-shaped refine-on pipeline "
                        "(1024 molecules, batch 256)")
    p.add_argument("--num", type=int, default=None)
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--max-n", type=int, default=12)
    p.add_argument("--pallas", action="store_true")
    # bf16 edge pipeline is the framework's default inference path (sampled
    # distributions measured identical to f32 on trained weights); the unit
    # string labels the kernel either way
    p.add_argument("--bf16", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--unroll", type=int, default=1)
    p.add_argument("--steps", type=int, default=0,
                   help="strided reverse steps (0 = full 1000)")
    p.add_argument("--refine", action="store_true",
                   help="pipeline: run the check_tree refine hook on every "
                        "pop like the reference (ar_sampling_nosize.py:138)")
    p.add_argument("--fine-bf16", action="store_true",
                   help="fine stage: bf16 dense GCL pipelines (opt-in, "
                        "see ops/gcl.py compute_dtype)")
    p.add_argument("--gate-reject", type=float, default=0.0,
                   help="pipeline: synthetic assembly gate rejecting this "
                        "fraction of candidate expansions (measures "
                        "beam-search backtracking churn)")
    p.add_argument("--fine-buckets", action="store_true",
                   help="(no-op: SAMPLING_BUCKETS is the default since the "
                        "round-4 TPU A/B; see --default-buckets)")
    p.add_argument("--default-buckets", action="store_true",
                   help="pipeline: restore the coarser DEFAULT_BUCKETS pad "
                        "set (fewer compiles, -16%% throughput)")
    p.add_argument("--reps", type=int, default=3,
                   help="pipeline: timed repetitions (best-of; the shared "
                        "chip swings ~±20%% between windows)")
    p.add_argument("--size-variant", action="store_true",
                   help="pipeline: the ar_sampling.py size variant — "
                        "vocab_conditioning + per-node size-restricted "
                        "vocab support via the round-based ARSampler")
    args = p.parse_args()
    if args.stage is None:
        # driver headline: the reference-shaped pipeline (refine on every
        # pop, ar_sampling_nosize.py:138-143) — see module docstring
        args.stage = "pipeline"
        args.refine = True
        if args.num is None:
            args.num = 1024
        if args.batch is None and args.batch_flag is None:
            args.batch = 256
    if args.num is None:
        args.num = 32
    if args.batch is None:
        args.batch = args.batch_flag if args.batch_flag is not None else 1024
    if args.stage == "coarse":
        bench_coarse(args.batch, max_n=args.max_n, use_pallas=args.pallas,
                     bf16=args.bf16, unroll=args.unroll, steps=args.steps)
    elif args.stage == "fine":
        bench_fine(args.num, args.beam, max_n=args.max_n,
                   fine_bf16=args.fine_bf16)
    else:
        bench_pipeline(args.num, args.beam, batch_size=args.batch,
                       steps=args.steps, bf16=args.bf16, refine=args.refine,
                       gate_reject=args.gate_reject,
                       fine_buckets="default" if args.default_buckets else False,
                       reps=args.reps, size_variant=args.size_variant)


if __name__ == "__main__":
    main()
