"""Chained timing of _prepare pieces."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, T, S, N = 64, 1000, 50, 30
ITERS = 20


def chained(fn, inputs, *rest):
    cur = inputs
    out = fn(cur, *rest)
    probe = jax.tree_util.tree_leaves(out)[0]
    cur = inputs + 0.0 * jnp.sum(probe)
    jax.block_until_ready(cur)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(cur, *rest)
        probe = jax.tree_util.tree_leaves(out)[0]
        cur = inputs + 0.0 * jnp.sum(probe)
    jax.block_until_ready(cur)
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    from torch_asg_tpu.ops.fac import make_aligned
    from torch_asg_tpu.ops.pallas import asg_kernels as ak
    from torch_asg_tpu.ops.pallas.common import pad_axis, round_up, LANE, SUBLANE
    from torch_asg_tpu.utils.lengths import mask_emissions

    r = np.random.default_rng(0)
    inputs = jnp.asarray(r.normal(size=(T, B, N)), jnp.float32)
    trans = jnp.asarray(r.normal(size=(N, N)) * 0.5, jnp.float32)
    targets = jnp.asarray(r.integers(0, N, size=(B, S)), jnp.int32)
    li = jnp.asarray(r.integers(T // 2, T + 1, size=(B,)), jnp.int32)
    lo = jnp.asarray(r.integers(S // 2, S + 1, size=(B,)), jnp.int32)

    NEG_INF = float("-inf")
    n_pad = round_up(max(N, LANE), LANE)
    s_pad = round_up(max(S, LANE), LANE)
    b_pad = round_up(max(B, SUBLANE), SUBLANE)

    base = jax.jit(lambda i: jnp.sum(i) * 1.0)
    print(f"baseline chain overhead: {chained(base, inputs):7.3f} ms")

    f1 = jax.jit(
        lambda i: pad_axis(
            pad_axis(pad_axis(mask_emissions(i, li), n_pad, 2, NEG_INF),
                     b_pad, 1, NEG_INF), 1000, 0, NEG_INF)
    )
    print(f"mask+pad emissions:      {chained(f1, inputs):7.3f} ms")

    f2 = jax.jit(lambda i: make_aligned(trans, i, targets, li, lo).inputs)
    print(f"make_aligned:            {chained(f2, inputs):7.3f} ms")

    f3 = jax.jit(
        lambda i: pad_axis(
            pad_axis(make_aligned(trans, i, targets, li, lo).inputs, s_pad, 2,
                     NEG_INF), b_pad, 1, NEG_INF)
    )
    print(f"make_aligned+pad:        {chained(f3, inputs):7.3f} ms")

    f4 = jax.jit(lambda i: ak._prepare(trans, i, targets, li, lo)[1:9])
    print(f"full _prepare:           {chained(f4, inputs):7.3f} ms")


if __name__ == "__main__":
    main()
