"""Same-window coarse batch-size sweep (ROADMAP round-4 #1 lever b).

The roofline found ~20% of wall clock is dispatch/scan-boundary gaps; the
amortization lever is more molecules per sample_coarse call. This sweeps
batch sizes in ONE process/window (the only comparable methodology on the
shared tunnel chip, BASELINE.md contention note) and reports mol/s + MFU
per batch, best-of-reps.

    python scripts/batch_sweep.py [--max-n 12] [--batches 128,256,512,1024]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/hierdiff_tpu_xla"))

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--max-n", type=int, default=12)
    p.add_argument("--batches", type=str, default="128,256,512,1024")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--steps", type=int, default=0,
                   help="strided reverse chain (0 = full 1000 steps)")
    args = p.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    import jax
    import jax.numpy as jnp

    from bench import _egnn_matmul_flops, make_models
    from hierdiff_tpu.sampling import make_masks_for_counts, sample_coarse

    coarse, cparams, _ = make_models(coarse_kw={"compute_dtype": "bfloat16"})
    n_steps = args.steps or coarse.timesteps
    peak = float(os.environ.get("BENCH_PEAK_TFLOPS", "197")) * 1e12

    rng = np.random.default_rng(0)
    masks = {}
    for b in batches:
        counts = rng.integers(max(4, args.max_n - 8), args.max_n + 1, size=b)
        nm, em = make_masks_for_counts(counts, args.max_n)
        masks[b] = (jnp.asarray(nm), jnp.asarray(em))

    for b in batches:  # compile everything before any timing
        nm, em = masks[b]
        x, h = sample_coarse(coarse, cparams, jax.random.PRNGKey(2), nm, em,
                             steps=args.steps or None)
        np.asarray(x)
        print(f"compiled batch {b}", flush=True)

    best = {b: 1e9 for b in batches}
    for rep in range(args.reps):
        for b in batches:  # interleave so contention hits all arms alike
            nm, em = masks[b]
            t0 = time.perf_counter()
            x, h = sample_coarse(coarse, cparams, jax.random.PRNGKey(10 + rep),
                                 nm, em, steps=args.steps or None)
            np.asarray(x), np.asarray(h)
            best[b] = min(best[b], time.perf_counter() - t0)
        print(f"rep{rep}: " + "  ".join(
            f"b{b}={b / best[b]:.1f}mol/s" for b in batches), flush=True)

    print("\nbatch  mol/s   ms/mol  MFU")
    for b in batches:
        flops = (n_steps + 1) * _egnn_matmul_flops(
            b, args.max_n, coarse.hidden_nf, coarse.n_layers,
            coarse.inv_sublayers)
        mfu = flops / best[b] / peak
        print(f"{b:5d}  {b / best[b]:6.1f}  {1e3 * best[b] / b:6.2f}  "
              f"{100 * mfu:.1f}%")


if __name__ == "__main__":
    main()
