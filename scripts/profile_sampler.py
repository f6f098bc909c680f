"""Capture a jax.profiler trace of the coarse sampler (ROADMAP #1 tooling).

Writes an XPlane trace under --out (open with TensorBoard's profile plugin
or xprof) covering a few timed sampler calls at the given bucket — the
input for deciding where the remaining ~72% of non-MFU time goes
(per-kernel breakdown, fusion boundaries, VPU vs MXU occupancy).

  python scripts/profile_sampler.py [--max-n 24] [--batch 64] [--out /tmp/trace]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import argparse

import numpy as np


def main():
    from hierdiff_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--max-n", type=int, default=24)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--steps", type=int, default=0, help="0 = full 1000")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--out", default="/tmp/hierdiff_trace")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import make_models
    from hierdiff_tpu.sampling import make_masks_for_counts, sample_coarse

    coarse, cparams, _ = make_models()
    rng = np.random.default_rng(0)
    counts = rng.integers(max(4, args.max_n - 8), args.max_n + 1, size=args.batch)
    nm, em = make_masks_for_counts(counts, args.max_n)
    nm, em = jnp.asarray(nm), jnp.asarray(em)
    steps = args.steps or None

    x, h = sample_coarse(coarse, cparams, jax.random.PRNGKey(0), nm, em,
                         steps=steps)   # compile outside the trace
    np.asarray(x)

    with jax.profiler.trace(args.out):
        for i in range(args.reps):
            x, h = sample_coarse(coarse, cparams, jax.random.PRNGKey(1 + i),
                                 nm, em, steps=steps)
            np.asarray(x)
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()
