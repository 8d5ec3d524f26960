"""Benchmark: ASG fwd+bwd frames/sec/chip at the BASELINE.json config
(B=64, T=1000, N=30 letter vocab), run on the real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no benchmark numbers (README.md:27-34 roadmap item
unchecked; see BASELINE.md), so vs_baseline compares the fused Pallas
kernels against this repo's own XLA lax.scan implementation on the same
chip — the honest stand-in for "the same math without the custom kernels".
A correctness gate (pallas vs scan allclose) runs first; a failed gate
reports value 0.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B, T, S, N = 64, 1000, 50, 30
WARMUP, ITERS = 3, 10


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
    return (time.perf_counter() - t0) / ITERS


def main():
    from torch_asg_tpu import asg_loss

    trans, inputs, targets, li, lo = make_case()

    def make_step(impl):
        def step(tr, inp):
            return jax.value_and_grad(
                lambda tr, inp: asg_loss(
                    tr, inp, targets, li, lo, reduction="mean", impl=impl
                ),
                argnums=(0, 1),
            )(tr, inp)

        return jax.jit(step)

    scan_step = make_step("scan")
    pallas_step = make_step("pallas")

    # correctness gate
    (l_s, (gt_s, gi_s)) = scan_step(trans, inputs)
    (l_p, (gt_p, gi_p)) = pallas_step(trans, inputs)
    ok = (
        np.allclose(float(l_s), float(l_p), rtol=2e-3, atol=2e-3)
        and np.allclose(np.asarray(gt_s), np.asarray(gt_p), rtol=2e-2, atol=2e-3)
        and np.allclose(np.asarray(gi_s), np.asarray(gi_p), rtol=2e-2, atol=2e-3)
    )
    if not ok:
        print(
            json.dumps(
                {
                    "metric": "ASG fwd+bwd frames/sec/chip (B=64,T=1000,N=30)",
                    "value": 0,
                    "unit": "frames/s",
                    "vs_baseline": 0.0,
                    "error": "pallas/scan mismatch",
                }
            )
        )
        return 1

    t_scan = timed(scan_step, trans, inputs)
    t_pallas = timed(pallas_step, trans, inputs)
    frames = B * T
    best = min(t_scan, t_pallas)

    print(
        json.dumps(
            {
                "metric": "ASG fwd+bwd frames/sec/chip (B=64,T=1000,N=30)",
                "value": round(frames / best, 1),
                "unit": "frames/s",
                "vs_baseline": round(t_scan / t_pallas, 3),
                "detail": {
                    "pallas_ms": round(t_pallas * 1e3, 3),
                    "xla_scan_ms": round(t_scan * 1e3, 3),
                    "backend": jax.default_backend(),
                    "note": "reference publishes no numbers; vs_baseline = xla_scan_time / pallas_time on the same chip",
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
