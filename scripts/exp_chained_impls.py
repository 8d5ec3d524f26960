"""Honest (chained) timing of scan / pallas / fused ASG fwd+bwd and fwd-only.

Each iteration feeds the previous iteration's grad_inputs (or loss) back
into the next call, forcing real sequential execution — plain back-to-back
timing through the axon tunnel can report impossibly fast numbers.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, T, S, N = 64, 1000, 50, 30
ITERS = 20


def main():
    from torch_asg_tpu import asg_loss

    r = np.random.default_rng(0)
    inputs = jnp.asarray(r.normal(size=(T, B, N)), jnp.float32)
    trans = jnp.asarray(r.normal(size=(N, N)) * 0.5, jnp.float32)
    targets = jnp.asarray(r.integers(0, N, size=(B, S)), jnp.int32)
    li = jnp.asarray(r.integers(T // 2, T + 1, size=(B,)), jnp.int32)
    lo = jnp.asarray(r.integers(S // 2, S + 1, size=(B,)), jnp.int32)

    for impl in ("scan", "pallas", "fused"):
        vg = jax.jit(
            jax.value_and_grad(
                lambda tr, i: asg_loss(tr, i, targets, li, lo, impl=impl), (0, 1)
            )
        )
        # fwd+bwd chained: next inputs = inputs + 0*grad_inputs
        cur = inputs
        (l, (gt, gi)) = vg(trans, cur)
        cur = inputs + 0.0 * gi
        jax.block_until_ready(cur)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            (l, (gt, gi)) = vg(trans, cur)
            cur = inputs + 0.0 * gi
        jax.block_until_ready(cur)
        t_fb = (time.perf_counter() - t0) / ITERS * 1e3

        fwd = jax.jit(lambda tr, i: asg_loss(tr, i, targets, li, lo, impl=impl))
        cur = inputs
        l = fwd(trans, cur)
        cur = inputs + 0.0 * l
        jax.block_until_ready(cur)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            l = fwd(trans, cur)
            cur = inputs + 0.0 * l
        jax.block_until_ready(cur)
        t_f = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"{impl:7s} fwd+bwd {t_fb:8.3f} ms   fwd-only {t_f:8.3f} ms")


if __name__ == "__main__":
    main()
