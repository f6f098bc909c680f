"""Profiling / timing hooks.

TPU-native replacement for the reference's observability knobs (PL
``profiler: simple`` and CUDA_LAUNCH_BLOCKING debugging, SURVEY §5): a
``jax.profiler`` trace context producing Perfetto/XPlane dumps, and a
wall-clock timer that forces device completion only at its boundaries.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/hierdiff_trace",
                  with_perfetto: bool = False) -> Iterator[None]:
    """Capture a device trace viewable in XProf/Perfetto.

        with profile_trace("runs/x/trace"):
            state, m = step(state, batch, rng)
            jax.block_until_ready(m)
    """
    jax.profiler.start_trace(logdir, create_perfetto_link=with_perfetto)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class timed:
    """Wall-clock timer that blocks on device work at entry and exit, so the
    measured window covers exactly the enclosed dispatches.

        with timed("sample") as t: ...
        print(t.seconds)
    """

    def __init__(self, name: str = "", sync: bool = True, verbose: bool = False):
        self.name = name
        self.sync = sync
        self.verbose = verbose
        self.seconds: Optional[float] = None

    def __enter__(self):
        if self.sync:
            jax.effects_barrier()
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync:
            jax.effects_barrier()
        self.seconds = time.perf_counter() - self._t0
        if self.verbose:
            print(f"[timed] {self.name}: {self.seconds:.4f}s", flush=True)
        return False
