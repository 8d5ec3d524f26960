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


def fetch_overhead_s(samples: int = 5) -> float:
    """Fixed host<->device round-trip cost of fetching one scalar (median).

    Measure this ONCE per process and pass it into time_fn_chained when
    benchmarking several things: the fetch cost has multi-ms jitter, and
    re-sampling it per measurement lets min-taking pair a lucky fetch
    estimate with a lucky loop — producing impossibly low results.
    """
    import statistics

    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1)
    t = jnp.zeros((1,))
    float(f(t)[0])
    obs = []
    for _ in range(samples):
        t0 = time.perf_counter()
        float(f(t)[0])
        obs.append(time.perf_counter() - t0)
    return statistics.median(obs)


def time_fn_chained(
    step: Callable, feedback: Callable, x0, warmup: int = 2, iters: int = 30,
    fetch_s: Optional[float] = None,
) -> float:
    """Honest seconds per call: each iteration's input depends on the
    previous output (defeats dispatch coalescing / early-ack), and the
    loop is closed by fetching a scalar to the host (forces completion).

    step(x) -> out; feedback(x0, out) -> next x (must touch ``out``).
    Use enough ``iters`` that the loop dwarfs the ~25-30 ms fetch cost.
    """
    import jax.numpy as jnp

    fetch = fetch_overhead_s() if fetch_s is None else fetch_s
    cur = x0
    for _ in range(max(1, warmup)):
        out = step(cur)
        cur = feedback(x0, out)
    probe = jax.tree_util.tree_leaves(out)[0]
    float(jnp.ravel(probe)[0])
    t0 = time.perf_counter()
    cur = x0
    for _ in range(iters):
        out = step(cur)
        cur = feedback(x0, out)
    probe = jax.tree_util.tree_leaves(out)[0]
    float(jnp.ravel(probe)[0])
    return max((time.perf_counter() - t0) - fetch, 1e-9) / iters
