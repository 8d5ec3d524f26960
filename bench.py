"""Benchmark: ASG fwd+bwd frames/sec/chip at the BASELINE.json config
(B=64, T=1000, N=30 letter vocab), run on the real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no benchmark numbers (README.md:27-34 roadmap item
unchecked; see BASELINE.md), so vs_baseline compares the fused Pallas
kernel against this repo's own XLA lax.scan implementation on the same
chip — the honest stand-in for "the same math without the custom kernels".
A correctness gate (fused vs scan allclose) runs first; a failed gate
reports value 0.

Timing methodology: each iteration's inputs depend on the previous
iteration's outputs (a chained data dependency), and the loop is closed by
fetching a scalar to the host.  Plain back-to-back dispatch with
block_until_ready can report physically impossible numbers through remote
TPU tunnels (async dispatch acknowledges before execution completes);
chain-plus-fetch forces real sequential device execution.
"""

import json
import sys


import jax
import jax.numpy as jnp
import numpy as np

B, T, S, N = 64, 1000, 50, 30
WARMUP, ITERS = 2, 30


def make_case(dtype=jnp.float32):
    r = np.random.default_rng(0)
    inputs = jnp.asarray(r.normal(size=(T, B, N)), dtype)
    trans = jnp.asarray(r.normal(size=(N, N)) * 0.5, dtype)
    targets = jnp.asarray(r.integers(0, N, size=(B, S)), jnp.int32)
    li = jnp.asarray(r.integers(T // 2, T + 1, size=(B,)), jnp.int32)
    lo = jnp.asarray(r.integers(S // 2, S + 1, size=(B,)), jnp.int32)
    return trans, inputs, targets, li, lo


def timed_chained(step, trans, inputs, fetch_s, repeats=3):
    """Best-of-``repeats`` chained timing (ms) via the canonical harness
    in utils.profiling: shared-tunnel TPU access shows ~2x run-to-run
    variance; the minimum is the honest device cost."""
    from torch_asg_tpu.utils.profiling import time_fn_chained

    def feedback(x0, out):
        return x0 + 0.0 * out[1]

    best = min(
        time_fn_chained(
            lambda i: step(trans, i), feedback, inputs,
            warmup=WARMUP, iters=ITERS, fetch_s=fetch_s,
        )
        for _ in range(repeats)
    )
    return best * 1e3


def main():
    from torch_asg_tpu import asg_loss

    trans, inputs, targets, li, lo = make_case()

    def make_step(impl):
        def inner(tr, inp):
            loss, (gt, gi) = jax.value_and_grad(
                lambda tr, inp: asg_loss(
                    tr, inp, targets, li, lo, reduction="mean", impl=impl
                ),
                argnums=(0, 1),
            )(tr, inp)
            return loss, gi

        return jax.jit(inner)

    scan_step = make_step("scan")
    fused_step = make_step("fused")

    # correctness gate (loss + input grads, fused vs scan)
    def grads(impl):
        return jax.jit(
            jax.value_and_grad(
                lambda tr, inp: asg_loss(
                    tr, inp, targets, li, lo, reduction="mean", impl=impl
                ),
                argnums=(0, 1),
            )
        )(trans, inputs)

    (l_s, (gt_s, gi_s)) = grads("scan")
    (l_f, (gt_f, gi_f)) = grads("fused")
    ok = (
        np.allclose(float(l_s), float(l_f), rtol=2e-3, atol=2e-3)
        and np.allclose(np.asarray(gt_s), np.asarray(gt_f), rtol=2e-2, atol=2e-3)
        and np.allclose(np.asarray(gi_s), np.asarray(gi_f), rtol=2e-2, atol=2e-3)
    )
    if not ok:
        print(
            json.dumps(
                {
                    "metric": "ASG fwd+bwd frames/sec/chip (B=64,T=1000,N=30)",
                    "value": 0,
                    "unit": "frames/s",
                    "vs_baseline": 0.0,
                    "error": "fused/scan mismatch",
                }
            )
        )
        return 1

    from torch_asg_tpu.utils.profiling import fetch_overhead_s

    fetch_s = fetch_overhead_s()
    t_scan = timed_chained(scan_step, trans, inputs, fetch_s)
    t_fused = timed_chained(fused_step, trans, inputs, fetch_s)
    frames = B * T
    best = min(t_scan, t_fused)

    # secondary paths for the record: forward-only scoring + Viterbi decode
    def fwd_only_step(tr, inp):
        loss = asg_loss(tr, inp, targets, li, lo, reduction="mean", impl="fused")
        return loss, loss[None, None, None] + 0.0 * inp

    t_fwd = timed_chained(jax.jit(fwd_only_step), trans, inputs, fetch_s)

    from torch_asg_tpu import viterbi_decode

    def vit_step(tr, inp):
        res = viterbi_decode(tr, inp, li)
        return res.scores.sum(), res.scores.sum()[None, None, None] + 0.0 * inp

    t_vit = timed_chained(jax.jit(vit_step), trans, inputs, fetch_s)

    print(
        json.dumps(
            {
                "metric": "ASG fwd+bwd frames/sec/chip (B=64,T=1000,N=30)",
                "value": round(frames / (best / 1e3), 1),
                "unit": "frames/s",
                "vs_baseline": round(t_scan / t_fused, 3),
                "detail": {
                    "fused_ms": round(t_fused, 3),
                    "xla_scan_ms": round(t_scan, 3),
                    "forward_only_ms": round(t_fwd, 3),
                    "viterbi_decode_ms": round(t_vit, 3),
                    "backend": jax.default_backend(),
                    "note": (
                        "reference publishes no numbers; vs_baseline = "
                        "xla_scan_time / fused_kernel_time on the same chip; "
                        "chained+fetch-synced timing"
                    ),
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
