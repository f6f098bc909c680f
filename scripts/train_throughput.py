"""Training-throughput sweep: steps/sec for the coarse stage on one chip.

Measures the round-2 levers (ROADMAP #4 / VERDICT #8): host->device
prefetch (data_iters.prefetch_to_device) and gradient rematerialization
(DenseEGNN remat) at GEOM-realistic buckets. Prints one JSON line per
config; numbers land in BASELINE.md.

  python scripts/train_throughput.py [--steps 20] [--batch 64]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import argparse
import itertools
import json
import time

import numpy as np


def measure(bucket: int, batch: int, remat: bool, prefetch: bool, steps: int,
            compute_dtype=None, pallas_vjp=False, remat_edges=False):
    import jax
    import jax.numpy as jnp
    import optax

    from hierdiff_tpu.config import load_config
    from hierdiff_tpu.data.synthetic import SyntheticTreeGenerator
    from hierdiff_tpu.models.diffusion import CoarseDiffusion
    from hierdiff_tpu.parallel import TrainState, make_train_step
    from hierdiff_tpu.train.data_iters import coarse_iter, prefetch_to_device

    cfg = load_config(None, [f"train.batch_size={batch}",
                             f"train.buckets=({bucket},)",
                             "train.num_train_trees=512"])
    model = CoarseDiffusion(in_node_nf=8, timesteps=1000, hidden_nf=256,
                            n_layers=6, inv_sublayers=2,
                            noise_schedule="learned", remat=remat,
                            compute_dtype=compute_dtype,
                            pallas_vjp=pallas_vjp, remat_edges=remat_edges)
    gen = SyntheticTreeGenerator(seed=0)
    # synthetic trees near the bucket size so padding is realistic
    pool = gen.sample_trees(512, n=max(4, bucket - 4))
    raw = coarse_iter(cfg, pool, seed=0)
    it = (prefetch_to_device(raw, size=2) if prefetch
          else ({k: jnp.asarray(v) for k, v in b.items()} for b in raw))

    first = next(it)
    params = jax.jit(lambda r, b, r2: model.init(r, b, r2, train=True))(
        jax.random.PRNGKey(0), first, jax.random.PRNGKey(1))

    def loss_fn(p, b, rng):
        out = model.apply(p, b, rng, train=True)
        return out["loss"], {}

    state = TrainState.create(params, optax.adamw(1e-4), ema_decay=0.999)
    step_fn = make_train_step(loss_fn)
    rng = jax.random.PRNGKey(2)
    # warm up: compile + settle
    for _ in range(3):
        state, m = step_fn(state, next(it), rng)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step_fn(state, next(it), rng)
    float(m["loss"])  # sync
    dt = (time.perf_counter() - t0) / steps
    # training MFU: fwd + bwd ~ 3x the forward matmul FLOPs of one EGNN
    # eval (compute_loss runs phi once per step); peak = bf16 MXU
    import os
    from bench import _egnn_matmul_flops
    flops = 3.0 * _egnn_matmul_flops(batch, bucket, 256, 6, 2)
    peak = float(os.environ.get("BENCH_PEAK_TFLOPS", "197")) * 1e12
    return 1.0 / dt, flops / dt / peak


def main():
    from hierdiff_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--buckets", type=int, nargs="*", default=[48, 96])
    p.add_argument("--sweep",
                   choices=["levers", "dtype", "batch", "vjp", "rematedges"],
                   default="levers",
                   help="levers: remat x prefetch (round-2 sweep); dtype: "
                        "f32 vs bf16 training step at prefetch-on (VERDICT "
                        "r2 weak #5 - reduced-precision training + MFU); "
                        "batch: batch-size amortization at bf16+prefetch "
                        "(training-side analogue of scripts/batch_sweep.py); "
                        "vjp: XLA AD vs the fused custom-VJP GCL backward "
                        "(ops/egnn_pallas.gcl_vjp) at bf16+prefetch; "
                        "rematedges: edge-chain-only jax.checkpoint off/on "
                        "per batch size (VERDICT r4 #7 — drop only the "
                        "(B,N,N,H) residuals the wgrad spills come from)")
    p.add_argument("--batches", type=int, nargs="*", default=[64, 128, 256],
                   help="batch sizes for --sweep batch")
    p.add_argument("--remat", action="store_true",
                   help="--sweep batch: rematerialized EGNN blocks (HBM "
                        "headroom for large batch x bucket products)")
    args = p.parse_args()
    if args.sweep == "levers":
        grid = [(b, args.batch, remat, prefetch, None) for b, remat, prefetch
                in itertools.product(args.buckets, [False, True],
                                     [False, True])]
    elif args.sweep == "dtype":
        grid = [(b, args.batch, False, True, dt) for b, dt in
                itertools.product(args.buckets, [None, "bfloat16"])]
    elif args.sweep == "batch":
        grid = [(b, bs, args.remat, True, "bfloat16", False) for b, bs in
                itertools.product(args.buckets, args.batches)]
    elif args.sweep == "rematedges":
        grid = [(b, bs, False, True, "bfloat16", False, re) for b, bs, re in
                itertools.product(args.buckets, args.batches, [False, True])]
    else:
        grid = [(b, args.batch, False, True, "bfloat16", vjp) for b, vjp in
                itertools.product(args.buckets, [False, True])]
    for cfg_row in grid:
        bucket, batch, remat, prefetch, dtype = cfg_row[:5]
        vjp = cfg_row[5] if len(cfg_row) > 5 else False
        redges = cfg_row[6] if len(cfg_row) > 6 else False
        sps, mfu = measure(bucket, batch, remat, prefetch, args.steps,
                           compute_dtype=dtype, pallas_vjp=vjp,
                           remat_edges=redges)
        print(json.dumps({"bucket": bucket, "batch": batch,
                          "remat": remat, "prefetch": prefetch,
                          "compute_dtype": dtype or "float32",
                          "pallas_vjp": vjp, "remat_edges": redges,
                          "steps_per_sec": round(sps, 3),
                          "train_mfu": round(mfu, 4)}), flush=True)


if __name__ == "__main__":
    main()
