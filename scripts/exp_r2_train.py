"""Round-2: production fused fwd+bwd timing with in-graph chaining.

Each dispatch runs CHAIN_K dependent full train steps (value_and_grad of
the mean loss) inside one jit; per-step time = dispatch time / CHAIN_K.
This removes the ~0.3-1 ms/iteration host-dispatch floor that inflated
round-1 numbers (see exp_r2_chain.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from torch_asg_tpu import asg_loss
from torch_asg_tpu.utils.profiling import fetch_overhead_s, time_fn_chained

B, T, S, N = 64, 1000, 50, 30
CHAIN_K = 8


def make_case():
    r = np.random.default_rng(0)
    inputs = jnp.asarray(r.normal(size=(T, B, N)), jnp.float32)
    trans = jnp.asarray(r.normal(size=(N, N)) * 0.5, jnp.float32)
    targets = jnp.asarray(r.integers(0, N, size=(B, S)), jnp.int32)
    li = jnp.asarray(r.integers(T // 2, T + 1, size=(B,)), jnp.int32)
    lo = jnp.asarray(r.integers(S // 2, S + 1, size=(B,)), jnp.int32)
    return trans, inputs, targets, li, lo


def timed(step_chain, x0, fetch, repeats=3, iters=30):
    return min(
        time_fn_chained(step_chain, lambda _, out: out[1], x0,
                        warmup=2, iters=iters, fetch_s=fetch)
        for _ in range(repeats)
    ) * 1e3 / CHAIN_K


def main():
    print("backend:", jax.default_backend())
    trans, inputs, targets, li, lo = make_case()
    fetch = fetch_overhead_s()

    def make_chain(impl, grad=True):
        def one(tr, inp):
            if grad:
                loss, (gt, gi) = jax.value_and_grad(
                    lambda a, b: asg_loss(a, b, targets, li, lo,
                                          reduction="mean", impl=impl),
                    argnums=(0, 1),
                )(tr, inp)
                return loss, gi
            loss = asg_loss(tr, inp, targets, li, lo,
                            reduction="mean", impl=impl)
            return loss, None

        def chain(tr):
            def body(tr_c, _):
                loss, gi = one(tr_c, inputs)
                d = 0.0 * loss if gi is None else 0.0 * gi[0, 0, 0]
                return tr_c + d, loss
            tr_o, losses = jax.lax.scan(body, tr, None, length=CHAIN_K)
            return losses[-1], tr_o

        return jax.jit(chain)

    for name, impl, grad in [
        ("fused fwd+bwd", "fused", True),
        ("fused fwd-only", "fused", False),
        ("scan fwd+bwd", "scan", True),
    ]:
        f = make_chain(impl, grad)
        f(trans)
        t = timed(f, trans, fetch)
        frames = B * T
        print(f"{name:15s} {t:7.3f} ms  ({frames/(t/1e3)/1e6:6.1f} M frames/s)")


if __name__ == "__main__":
    main()
