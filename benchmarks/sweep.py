"""Multi-shape benchmark sweep for the ASG criterion on the local TPU.

Prints one JSON line per configuration (fwd+bwd, forward-only, and
Viterbi decode), using the round-2 honest methodology: CHAIN_K
data-dependent steps run inside ONE jit per dispatch (host-side feedback
ops cost a ~0.3-1 ms dispatch floor through remote TPU tunnels — see
bench.py and docs/PERF_R2.md), closed by a scalar fetch.

Run: python benchmarks/sweep.py [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from torch_asg_tpu import asg_loss, viterbi_decode
from torch_asg_tpu.utils.profiling import fetch_overhead_s, time_fn_chained

# (name, B, T, S, N): the headline BASELINE shape, a long-utterance
# variant, a larger batch, and a wordpiece-scale vocabulary (still within
# the fused kernel's VMEM budget; beyond it, 'auto' falls back to the
# matmul formulation and truly large vocabularies belong on
# parallel.asg_loss_vp).
CONFIGS = [
    ("letters-base", 64, 1000, 50, 30),
    ("letters-long", 32, 2000, 50, 30),
    ("letters-bigbatch", 128, 1000, 50, 30),
    ("wordpiece-512", 32, 500, 30, 512),
]


def make_case(b, t, s, n):
    r = np.random.default_rng(0)
    return (
        jnp.asarray(r.normal(size=(n, n)) * 0.5, jnp.float32),
        jnp.asarray(r.normal(size=(t, b, n)), jnp.float32),
        jnp.asarray(r.integers(0, n, size=(b, s)), jnp.int32),
        jnp.asarray(r.integers(t // 2, t + 1, size=(b,)), jnp.int32),
        jnp.asarray(r.integers(s // 2, s + 1, size=(b,)), jnp.int32),
    )


CHAIN_K = 8


def bench_config(name, b, t, s, n, iters, fetch_s):
    trans, inputs, targets, li, lo = make_case(b, t, s, n)

    def fb_step(inp):
        loss, (gt, gi) = jax.value_and_grad(
            lambda tr, i: asg_loss(tr, i, targets, li, lo), (0, 1)
        )(trans, inp)
        return inp + 0.0 * gi, loss

    def fwd_step(inp):
        loss = asg_loss(trans, inp, targets, li, lo)
        return inp + 0.0 * loss, loss

    def vit_step(inp):
        s_ = viterbi_decode(trans, inp, li).scores.sum()
        return inp + 0.0 * s_, s_

    def make_chain(step):
        def chain(inp):
            inp_o, xs = jax.lax.scan(
                lambda c, _: step(c), inp, None, length=CHAIN_K
            )
            return xs[-1], inp_o
        return jax.jit(chain)

    rows = {}
    for key, fn in [("fwd_bwd", fb_step), ("forward_only", fwd_step),
                    ("viterbi", vit_step)]:
        jfn = make_chain(fn)
        jfn(inputs)
        best = min(
            time_fn_chained(jfn, lambda _, out: out[1], inputs,
                            iters=iters, fetch_s=fetch_s)
            for _ in range(3)
        ) / CHAIN_K
        rows[f"{key}_ms"] = round(best * 1e3, 3)
    frames = b * t
    print(
        json.dumps(
            {
                "config": name,
                "shape": {"B": b, "T": t, "S": s, "N": n},
                "frames_per_sec": round(frames / (rows["fwd_bwd_ms"] / 1e3), 1),
                **rows,
                "backend": jax.default_backend(),
            }
        )
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    fetch_s = fetch_overhead_s()
    for cfg in CONFIGS:
        bench_config(*cfg, iters=args.iters, fetch_s=fetch_s)


if __name__ == "__main__":
    main()
