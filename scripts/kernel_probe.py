"""Micro-bench: one DenseGCL / coord-update layer, XLA vs Pallas, on TPU.

Times a single fused layer call (not the whole sampler) so kernel tweaks get
a fast feedback loop through the tunnel. Prints one JSON line per config.

  python scripts/kernel_probe.py [--n 48 96] [--batch 64] [--reps 20]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import argparse
import json
import time

import numpy as np


VARIANTS = [("xla", {}), ("pallas", {"use_pallas": True}),
            ("xla-bf16", {"compute_dtype": "bfloat16"}),
            ("pallas-bf16", {"use_pallas": True,
                             "compute_dtype": "bfloat16"})]


def probe(b: int, n: int, hidden: int, reps: int, variants=None):
    import jax
    import jax.numpy as jnp

    from hierdiff_tpu.ops.egnn import DenseGCL, coord2diff_dense

    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((b, n, hidden)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    nmask = jnp.ones((b, n, 1), jnp.float32)
    emask = jnp.asarray((np.ones((n, n)) - np.eye(n))[None, :, :, None]
                        .repeat(b, 0).astype(np.float32))
    radial, _ = coord2diff_dense(x)
    eattr = jnp.concatenate([radial, radial], -1)

    gcl = DenseGCL(hidden, normalization_factor=10.0, attention=True)
    params = gcl.init(jax.random.PRNGKey(0), h, eattr, nmask, emask)

    # K chained layer applications inside ONE jitted scan: a single layer is
    # ~0.1 ms on-device while the tunnel round trip is ~30 ms, so standalone
    # per-call timing measures the link, not the kernel
    K = 64
    out = {}
    selected = [(t, kw) for t, kw in VARIANTS
                if variants is None or t in variants]
    for tag, kw in selected:
        m = DenseGCL(hidden, normalization_factor=10.0, attention=True, **kw)

        def chain(p, h0):
            def step(hc, _):
                return m.apply(p, hc, eattr, nmask, emask), ()
            hK, _ = jax.lax.scan(step, h0, None, length=K)
            return hK

        fn = jax.jit(chain)
        r = fn(params, h)
        np.asarray(r)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = fn(params, h)
            np.asarray(r)
            times.append(time.perf_counter() - t0)
        dt = min(times) / K
        flops = 2.0 * b * n * n * hidden * hidden  # edge_out dominates
        out[tag] = {"ms_per_layer": round(dt * 1e3, 3),
                    "tflops_lb": round(flops / dt / 1e12, 1)}
    print(json.dumps({"b": b, "n": n, "hidden": hidden, "chain": K, **out}),
          flush=True)


def main():
    from hierdiff_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, nargs="*", default=[48, 96])
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--variants", nargs="*", default=None,
                   choices=[t for t, _ in VARIANTS],
                   help="subset of variants to run (default: all four); "
                        "lets a tile-budget sweep probe one kernel without "
                        "dying on another variant's compile OOM")
    args = p.parse_args()
    for n in args.n:
        probe(args.batch, n, args.hidden, args.reps, variants=args.variants)


if __name__ == "__main__":
    main()
