"""Profiling and timing utilities.

The reference has no tracing/profiling machinery at all (SURVEY.md
section 5); here a thin wrapper over ``jax.profiler`` plus a steady-state
timer used by bench.py and the benchmarks/ harness.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture a profiler trace (viewable in XProf/TensorBoard) when
    ``log_dir`` is set; no-op otherwise."""
    if log_dir:
        with jax.profiler.trace(log_dir):
            yield
    else:
        yield


def time_fn(fn: Callable, *args, warmup: int = 3, iters: int = 10) -> float:
    """Steady-state seconds per call (blocks on device results)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
