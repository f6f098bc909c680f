"""Persistent XLA compilation cache for the CLIs.

The 1000-step sampler, the AR lattice, and the refine hook compile per
(bucket, batch) — 30-90 s each through the tunnel, minutes of cold start per
CLI invocation. The persistent cache makes repeat invocations reuse
compiled executables across processes.

Opt out with HIERDIFF_JAX_CACHE=off; set a path to relocate it.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Enable jax's persistent compilation cache; returns the dir or None."""
    env = os.environ.get("HIERDIFF_JAX_CACHE", "")
    if env.lower() == "off":
        return None
    path = path or env or os.path.expanduser("~/.cache/hierdiff_tpu_xla")
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that takes >1s to compile (the default 60s floor
        # would skip most of our per-bucket kernels)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return path
    except Exception:
        return None
