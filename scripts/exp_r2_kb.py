"""Round-2: ASG_TIME_BLOCK sweep under honest (in-graph chained) timing."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import torch_asg_tpu.ops.pallas.asg_kernels as ak
from torch_asg_tpu.utils.profiling import fetch_overhead_s, time_fn_chained

B, T, S, N = 64, 1000, 50, 30
CHAIN_K = 8


def main():
    r = np.random.default_rng(0)
    inputs = jnp.asarray(r.normal(size=(T, B, N)), jnp.float32)
    trans = jnp.asarray(r.normal(size=(N, N)) * 0.5, jnp.float32)
    targets = jnp.asarray(r.integers(0, N, size=(B, S)), jnp.int32)
    li = jnp.asarray(r.integers(T // 2, T + 1, size=(B,)), jnp.int32)
    lo = jnp.asarray(r.integers(S // 2, S + 1, size=(B,)), jnp.int32)
    fetch = fetch_overhead_s()
    print("backend:", jax.default_backend())

    ref = None
    for kb in (4, 8, 16, 32):
        ak.ASG_TIME_BLOCK = kb

        def one_grad(tr_c):
            def loss_fn(a):
                f, al = ak.asg_scores_fused(a, inputs, targets, li, lo)
                return jnp.mean(f - al)
            return jax.value_and_grad(loss_fn)(tr_c)

        def chain_grad(tr):
            def body(tr_c, _):
                loss, gt = one_grad(tr_c)
                return tr_c + 0.0 * loss, (loss, jnp.abs(gt).sum())
            tr_o, (losses, gsums) = jax.lax.scan(body, tr, None, length=CHAIN_K)
            return (losses[-1], gsums[-1]), tr_o

        def chain_fwd(tr):
            def body(tr_c, _):
                f, al = ak.asg_scores_fused(tr_c, inputs, targets, li, lo)
                loss = jnp.mean(f - al)
                return tr_c + 0.0 * loss, loss
            tr_o, losses = jax.lax.scan(body, tr, None, length=CHAIN_K)
            return losses[-1], tr_o

        fg = jax.jit(chain_grad)
        ff = jax.jit(chain_fwd)
        (loss, gsum), _ = fg(trans)
        if ref is None:
            ref = (float(loss), float(gsum))
        ok = np.allclose(float(loss), ref[0], rtol=1e-4) and np.allclose(
            float(gsum), ref[1], rtol=1e-3
        )
        tg = min(
            time_fn_chained(fg, lambda _, out: out[1], trans,
                            warmup=2, iters=30, fetch_s=fetch)
            for _ in range(3)
        ) * 1e3 / CHAIN_K
        tf = min(
            time_fn_chained(ff, lambda _, out: out[1], trans,
                            warmup=2, iters=30, fetch_s=fetch)
            for _ in range(3)
        ) * 1e3 / CHAIN_K
        print(f"kb={kb:2d}  fwd+bwd {tg:7.3f} ms  fwd {tf:7.3f} ms  parity={ok}")


if __name__ == "__main__":
    main()
