"""A/B the max-plus step formulations for Viterbi at wordpiece scale.

Hypothesis: jnp.max + jnp.argmax over the (B, N, N) candidate tensor are
two separate reductions, so XLA materializes (or recomputes) the
candidates twice; one-pass alternatives may win:
  (a) max + argmax            (current)
  (b) lax.top_k(cand, 1)      (one pass, sort-network based)
  (c) argmax, then take_along_axis on a recomputed row (gather fuses)

Chained timing per docs/PERF_R2.md: K data-dependent steps inside one
jit, scalar fetch, best-of-3.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from torch_asg_tpu.utils.profiling import fetch_overhead_s, time_fn_chained

B, N, T = 32, 512, 64  # T scan steps per dispatch chain
K = 1


def run(step_fn, trans, d0):
    def chain(d):
        def body(c, _):
            best, bp = step_fn(trans, c)
            # thread both outputs so neither reduction is dead code
            return best + 1e-9 * bp.astype(best.dtype).sum(axis=1, keepdims=True), None
        c, _ = lax.scan(body, d, None, length=T)
        return c

    f = jax.jit(chain)
    f(d0)
    fetch = fetch_overhead_s()
    t = min(
        time_fn_chained(f, lambda _, out: out, d0, warmup=2, iters=12,
                        fetch_s=fetch)
        for _ in range(3)
    )
    return t / T * 1e6  # us per step


def step_max_argmax(trans, d):
    cand = trans[None, :, :] + d[:, None, :]
    return jnp.max(cand, axis=2), jnp.argmax(cand, axis=2).astype(jnp.int32)


def step_topk(trans, d):
    cand = trans[None, :, :] + d[:, None, :]
    v, i = lax.top_k(cand, 1)
    return v[..., 0], i[..., 0].astype(jnp.int32)


def step_argmax_gather(trans, d):
    cand = trans[None, :, :] + d[:, None, :]
    bp = jnp.argmax(cand, axis=2).astype(jnp.int32)
    best = jnp.take_along_axis(cand, bp[:, :, None], axis=2)[:, :, 0]
    return best, bp


def main():
    r = np.random.default_rng(0)
    trans = jnp.asarray(r.normal(size=(N, N)), jnp.float32)
    d0 = jnp.asarray(r.normal(size=(B, N)), jnp.float32)
    for name, fn in [("max+argmax", step_max_argmax),
                     ("top_k(1)", step_topk),
                     ("argmax+gather", step_argmax_gather)]:
        us = run(fn, trans, d0)
        print(f"{name:16s} {us:8.2f} us/step")


if __name__ == "__main__":
    main()
