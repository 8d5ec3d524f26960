"""Time the fused op's pieces: _prepare (XLA prep) vs the kernels."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, T, S, N = 64, 1000, 50, 30


def timed(fn, *args, iters=20):
    for _ in range(3):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from torch_asg_tpu.ops.pallas import asg_kernels as ak

    r = np.random.default_rng(0)
    inputs = jnp.asarray(r.normal(size=(T, B, N)), jnp.float32)
    trans = jnp.asarray(r.normal(size=(N, N)) * 0.5, jnp.float32)
    targets = jnp.asarray(r.integers(0, N, size=(B, S)), jnp.int32)
    li = jnp.asarray(r.integers(T // 2, T + 1, size=(B,)), jnp.int32)
    lo = jnp.asarray(r.integers(S // 2, S + 1, size=(B,)), jnp.int32)

    prep = jax.jit(lambda tr, i: ak._prepare(tr, i, targets, li, lo)[1:10])
    print(f"prepare (XLA):  {timed(prep, trans, inputs):7.3f} ms")

    out = jax.jit(lambda tr, i: ak._prepare(tr, i, targets, li, lo))(trans, inputs)
    lat, ip, ap, e, e_t, self_p, next_p, li_col, lo_col, c, dims = out
    num_labels = N

    score = jax.jit(
        lambda *a: ak._run_score(li_col, lo_col, a[0], a[1], a[2], a[3], a[4],
                                 num_labels)
    )
    print(f"score kernel:   {timed(score, e, self_p, next_p, ip, ap):7.3f} ms")

    fwd = jax.jit(
        lambda *a: ak._run_fwd(li_col, lo_col, a[0], a[1], a[2], a[3], a[4], a[5],
                               num_labels)
    )
    print(f"fwd kernel:     {timed(fwd, e, e_t, self_p, next_p, ip, ap):7.3f} ms")

    pa, pb, qa, qb, sful, sfac = fwd(e, e_t, self_p, next_p, ip, ap)
    g = jnp.ones((dims[4], 1), jnp.float32)
    bwd = jax.jit(
        lambda *a: ak._run_bwd(g, g, a[0], a[1], a[2], a[3], a[4], a[5], a[6],
                               a[7], a[8])
    )
    print(
        f"bwd kernel:     "
        f"{timed(bwd, e, e_t, self_p, next_p, pa, pb, qa, qb, ap):7.3f} ms"
    )


if __name__ == "__main__":
    main()
