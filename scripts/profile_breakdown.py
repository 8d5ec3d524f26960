"""Break down bench-shape timings: fcc/fac x fwd-only/fwd+bwd x impl."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, T, S, N = 64, 1000, 50, 30
WARMUP, ITERS = 3, 20


def make_case(dtype=jnp.float32):
    r = np.random.default_rng(0)
    inputs = jnp.asarray(r.normal(size=(T, B, N)), dtype)
    trans = jnp.asarray(r.normal(size=(N, N)) * 0.5, dtype)
    targets = jnp.asarray(r.integers(0, N, size=(B, S)), jnp.int32)
    li = jnp.asarray(r.integers(T // 2, T + 1, size=(B,)), jnp.int32)
    lo = jnp.asarray(r.integers(S // 2, S + 1, size=(B,)), jnp.int32)
    return trans, inputs, targets, li, lo


def timed(fn, *args):
    for _ in range(WARMUP):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    from torch_asg_tpu.ops.fac import fac_score
    from torch_asg_tpu.ops.fcc import fcc_score
    from torch_asg_tpu.ops.pallas import fac_score_pallas, fcc_score_pallas

    trans, inputs, targets, li, lo = make_case()

    rows = []
    for name, fcc, fac in [
        ("scan", fcc_score, fac_score),
        ("pallas", fcc_score_pallas, fac_score_pallas),
    ]:
        fcc_fwd = jax.jit(lambda tr, i, f=fcc: f(tr, i, li).sum())
        fac_fwd = jax.jit(lambda tr, i, f=fac: f(tr, i, targets, li, lo).sum())
        fcc_vjp = jax.jit(
            jax.value_and_grad(lambda tr, i, f=fcc: f(tr, i, li).sum(), (0, 1))
        )
        fac_vjp = jax.jit(
            jax.value_and_grad(
                lambda tr, i, f=fac: f(tr, i, targets, li, lo).sum(), (0, 1)
            )
        )
        rows.append((f"{name} fcc fwd", timed(fcc_fwd, trans, inputs)))
        rows.append((f"{name} fac fwd", timed(fac_fwd, trans, inputs)))
        rows.append((f"{name} fcc fwd+bwd", timed(fcc_vjp, trans, inputs)))
        rows.append((f"{name} fac fwd+bwd", timed(fac_vjp, trans, inputs)))

    for name, ms in rows:
        print(f"{name:26s} {ms:8.3f} ms")


if __name__ == "__main__":
    main()
