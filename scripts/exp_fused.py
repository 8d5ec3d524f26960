"""Sweep CHAIN_PRECISION x ASG_TIME_BLOCK for the fused kernel on TPU."""

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
    from torch_asg_tpu import asg_loss
    from torch_asg_tpu.ops.pallas import asg_kernels as ak

    r = np.random.default_rng(0)
    inputs = jnp.asarray(r.normal(size=(T, B, N)), jnp.float32)
    trans = jnp.asarray(r.normal(size=(N, N)) * 0.5, jnp.float32)
    targets = jnp.asarray(r.integers(0, N, size=(B, S)), jnp.int32)
    li = jnp.asarray(r.integers(T // 2, T + 1, size=(B,)), jnp.int32)
    lo = jnp.asarray(r.integers(S // 2, S + 1, size=(B,)), jnp.int32)

    scan_step = jax.jit(
        jax.value_and_grad(
            lambda tr, i: asg_loss(tr, i, targets, li, lo, impl="scan"), (0, 1)
        )
    )
    (ls, (gts, gis)) = scan_step(trans, inputs)

    for prec in (jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGH,
                 jax.lax.Precision.HIGHEST):
        for kb in (8, 16):
            import torch_asg_tpu.ops.semiring as _sr; _sr.CHAIN_PRECISION = prec  # knob moved to ops.semiring in r2
            ak.ASG_TIME_BLOCK = kb
            step = jax.jit(
                jax.value_and_grad(
                    lambda tr, i: asg_loss(tr, i, targets, li, lo, impl="fused"),
                    (0, 1),
                )
            )
            fwd = jax.jit(
                lambda tr, i: asg_loss(tr, i, targets, li, lo, impl="fused")
            )
            (lf, (gtf, gif)) = step(trans, inputs)
            ok = (
                abs(float(ls) - float(lf)) < 0.02
                and np.allclose(np.asarray(gts), np.asarray(gtf), rtol=2e-2, atol=2e-3)
                and np.allclose(np.asarray(gis), np.asarray(gif), rtol=2e-2, atol=2e-3)
            )
            t_fb = timed(step, trans, inputs)
            t_f = timed(fwd, trans, inputs)
            print(
                f"prec={str(prec):18s} kb={kb:3d}  fwd+bwd {t_fb:7.3f} ms  "
                f"fwd {t_f:7.3f} ms  gate={'OK' if ok else 'FAIL'} "
                f"dl={abs(float(ls)-float(lf)):.4f} "
                f"dgT={float(jnp.abs(gts-gtf).max()):.5f}"
            )


if __name__ == "__main__":
    main()
