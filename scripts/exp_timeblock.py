"""Experiment: TIME_BLOCK sweep for the FCC beta kernel."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, T, S, N = 64, 1000, 50, 30
WARMUP, ITERS = 3, 20


def timed(fn, *args):
    for _ in range(WARMUP):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    from torch_asg_tpu.ops.pallas import fcc_kernels as fk

    r = np.random.default_rng(0)
    inputs = jnp.asarray(r.normal(size=(T, B, N)), jnp.float32)
    trans = jnp.asarray(r.normal(size=(N, N)) * 0.5, jnp.float32)
    li = jnp.asarray(r.integers(T // 2, T + 1, size=(B,)), jnp.int32)

    for kb in (8, 16, 32, 64, 128):
        fk.TIME_BLOCK = kb
        fwd = jax.jit(lambda tr, i: fk.fcc_score_pallas(tr, i, li).sum())
        vjp = jax.jit(
            jax.value_and_grad(
                lambda tr, i: fk.fcc_score_pallas(tr, i, li).sum(), (0, 1)
            )
        )
        t_f = timed(fwd, trans, inputs)
        t_v = timed(vjp, trans, inputs)
        print(f"TIME_BLOCK={kb:4d}  beta-only {t_f:7.3f} ms   fwd+bwd {t_v:7.3f} ms")


if __name__ == "__main__":
    main()
