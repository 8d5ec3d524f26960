"""Round-5: dual-chain kernel for the big-vocab matmul tier — go/no-go.

The 10k-vocab fwd+bwd step re-reads the ~200 MB exp-transition matrix
2T times (alpha scan + beta scan); PERF_R2 §3.4 measured it at ~83% of
that 2-pass bandwidth floor.  ops/pallas/bigvocab_kernels.py pairs the
chains so each stripe of the matrix is read ONCE per step and feeds
both contractions — the floor itself halves.

This script measures, on one TPU chip at the bench 10k shape
(T=100, B=8, N=10000, impl='matmul', value_and_grad, in-graph chained):

  1. the XLA two-scan step (force_dual_streams(False) — round-4 default)
  2. the dual-kernel step   (force_dual_streams(True)  — candidate)

with parity gates first: loss at DEFAULT precision (rtol 1e-3, the
bf16-accumulation tolerance bench.py's strict gate uses) and loss+grads
at Precision.HIGHEST (both paths fp32 — tight).

Appends rows to benchmarks/SWEEP_r5.jsonl.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from torch_asg_tpu import asg_loss
from torch_asg_tpu.ops.fcc import force_dual_streams
from torch_asg_tpu.ops.semiring import strict_chain_precision
from torch_asg_tpu.utils.profiling import fetch_overhead_s, time_fn_chained

T, B, N, S = 100, 8, 10_000, 20
REPEATS = 5


def stats(obs):
    obs = sorted(obs)
    return {"best": round(obs[0], 3), "median": round(obs[len(obs) // 2], 3),
            "spread": round(obs[-1] - obs[0], 3)}


def main():
    assert jax.default_backend() == "tpu", "on-chip experiment"
    r = np.random.default_rng(1)
    inputs = jnp.asarray(r.normal(size=(T, B, N)), jnp.float32)
    trans = jnp.asarray(r.normal(size=(N, N)) * 0.1, jnp.float32)
    tgt = jnp.asarray(r.integers(0, N, size=(B, S)), jnp.int32)
    li = jnp.full((B,), T, jnp.int32)
    li = li.at[1].set(T - 37)  # one ragged element through the seeds
    lo = jnp.full((B,), S, jnp.int32)

    def chain(btr, inp):
        def body(inp_c, _):
            loss, (gt, gi) = jax.value_and_grad(
                lambda a, b: asg_loss(a, b, tgt, li, lo, reduction="mean",
                                      impl="matmul"),
                argnums=(0, 1),
            )(btr, inp_c)
            return inp_c + 0.0 * gi, (loss, gt)
        inp_o, (losses, gts) = jax.lax.scan(body, inp, None, length=2)
        return losses[-1], gts[-1], inp_o

    def grad_once(btr, inp):
        return jax.value_and_grad(
            lambda a, b: asg_loss(a, b, tgt, li, lo, reduction="mean",
                                  impl="matmul"),
            argnums=(0, 1),
        )(btr, inp)

    # trace-time election: the force context must wrap the first call.
    # NOTE: each variant needs its OWN function object — jax.jit keys its
    # shared trace cache on the wrapped callable, so jit-ing the same
    # `chain` twice would silently reuse the first executable (the round-5
    # first cut of this script did exactly that and measured 0.998x).
    with force_dual_streams(False):
        f_scan = jax.jit(lambda btr, inp: chain(btr, inp))
        l_scan, gt_scan, _ = f_scan(trans, inputs)
        l_scan = float(l_scan)
    with force_dual_streams(True):
        f_dual = jax.jit(lambda btr, inp: chain(btr, inp))
        l_dual, gt_dual, _ = f_dual(trans, inputs)
        l_dual = float(l_dual)
    print(f"[gate] DEFAULT loss scan={l_scan:.6f} dual={l_dual:.6f}",
          file=sys.stderr)
    assert np.isclose(l_scan, l_dual, rtol=1e-3), (l_scan, l_dual)
    # prove the two programs actually differ (cache-hit guard).  Each
    # make_jaxpr gets a FRESH lambda: the trace cache is keyed on
    # (callable identity, avals) across wrappers, so tracing grad_once
    # itself twice would return the first jaxpr both times.
    with force_dual_streams(True):
        assert "pallas_call" in str(
            jax.make_jaxpr(lambda a, b: grad_once(a, b))(trans, inputs))
    with force_dual_streams(False):
        assert "pallas_call" not in str(
            jax.make_jaxpr(lambda a, b: grad_once(a, b))(trans, inputs))

    # Cross-formulation fidelity gate: the kernel's DEFAULT-precision
    # loss+grads vs the scans at Precision.HIGHEST (fp32 streams).  The
    # kernel intentionally has no HIGHEST instantiation (fp32 stripes
    # exceed scoped VMEM at this N; ops/fcc.py::_mm_streams), so this is
    # the same cross-precision strictness bench.py's 10k gate applies,
    # extended to gradients.
    with strict_chain_precision():
        (lh_s, (gth_s, gih_s)) = jax.jit(
            lambda a, b: grad_once(a, b))(trans, inputs)
        lh_s = float(lh_s)
    with force_dual_streams(True):
        (ld_d, (gtd_d, gid_d)) = jax.jit(
            lambda a, b: grad_once(a, b))(trans, inputs)
        ld_d = float(ld_d)
    assert np.isclose(lh_s, ld_d, rtol=1e-3), (lh_s, ld_d)
    np.testing.assert_allclose(np.asarray(gtd_d), np.asarray(gth_s),
                               rtol=5e-2, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gid_d), np.asarray(gih_s),
                               rtol=5e-2, atol=1e-5)
    print("[gate] kernel-DEFAULT vs scan-HIGHEST loss+grads green",
          file=sys.stderr)

    fetch_s = fetch_overhead_s()
    feedback = lambda x0, out: out[2]
    rows = []
    for name, fn in (("scan2pass", f_scan), ("dualkernel", f_dual)):
        obs = [
            time_fn_chained(lambda i, f=fn: f(trans, i), feedback, inputs,
                            warmup=2, iters=4, fetch_s=fetch_s) / 2 * 1e3
            for _ in range(REPEATS)
        ]
        s = stats(obs)
        print(f"[time] {name}: {s}", file=sys.stderr)
        rows.append({"exp": "bigvocab_dual_r5", "variant": name,
                     "shape": f"T={T},B={B},N={N}", "step_ms": s})

    rows.append({
        "exp": "bigvocab_dual_r5", "variant": "verdict",
        "speedup": round(rows[0]["step_ms"]["median"] /
                         rows[1]["step_ms"]["median"], 3),
        "parity": "DEFAULT loss rtol1e-3 + HIGHEST loss/grads green",
    })
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "SWEEP_r5.jsonl")
    with open(out, "a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    print(json.dumps(rows[-1]))


if __name__ == "__main__":
    main()
