"""Best-of-3 chained sweep: ASG_TIME_BLOCK x CHAIN_PRECISION on TPU."""

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
    from torch_asg_tpu.ops.pallas import asg_kernels as ak

    r = np.random.default_rng(0)
    inputs = jnp.asarray(r.normal(size=(T, B, N)), jnp.float32)
    trans = jnp.asarray(r.normal(size=(N, N)) * 0.5, jnp.float32)
    targets = jnp.asarray(r.integers(0, N, size=(B, S)), jnp.int32)
    li = jnp.asarray(r.integers(T // 2, T + 1, size=(B,)), jnp.int32)
    lo = jnp.asarray(r.integers(S // 2, S + 1, size=(B,)), jnp.int32)

    f0 = jax.jit(lambda x: x + 1)
    float(f0(jnp.zeros((1,)))[0])
    t0 = time.perf_counter()
    for _ in range(3):
        float(f0(jnp.zeros((1,)))[0])
    fetch = (time.perf_counter() - t0) / 3 * 1e3

    def honest(step):
        cur = inputs
        loss, gi = step(trans, cur)
        cur = inputs + 0.0 * gi
        float(loss)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            cur = inputs
            for _ in range(ITERS):
                loss, gi = step(trans, cur)
                cur = inputs + 0.0 * gi
            float(loss)
            best = min(best, ((time.perf_counter() - t0) * 1e3 - fetch) / ITERS)
        return best

    scan_vg = jax.jit(
        jax.value_and_grad(
            lambda tr, i: asg_loss(tr, i, targets, li, lo, impl="scan"), (0, 1)
        )
    )
    (ls, (gts, gis)) = scan_vg(trans, inputs)

    for kb in (8, 16):
        for prec in (jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT):
            ak.ASG_TIME_BLOCK = kb
            import torch_asg_tpu.ops.semiring as _sr; _sr.CHAIN_PRECISION = prec  # knob moved to ops.semiring in r2

            def step(tr, i):
                loss, (gt, gi) = jax.value_and_grad(
                    lambda tr, i: asg_loss(tr, i, targets, li, lo, impl="fused"),
                    (0, 1),
                )(tr, i)
                return loss, gi

            jstep = jax.jit(step)
            vg = jax.jit(
                jax.value_and_grad(
                    lambda tr, i: asg_loss(tr, i, targets, li, lo, impl="fused"),
                    (0, 1),
                )
            )
            (lf, (gtf, gif)) = vg(trans, inputs)
            ok = (
                abs(float(ls) - float(lf)) < max(2e-3, 2e-3 * abs(float(ls)))
                and np.allclose(np.asarray(gts), np.asarray(gtf), rtol=2e-2,
                                atol=2e-3)
                and np.allclose(np.asarray(gis), np.asarray(gif), rtol=2e-2,
                                atol=2e-3)
            )
            print(
                f"kb={kb:2d} prec={str(prec):8s}: {honest(jstep):7.3f} ms "
                f"gate={'OK' if ok else 'FAIL'}"
            )


if __name__ == "__main__":
    main()
