"""Round-4 experiment: executed scaling curve for the dp/vp/sp programs
on the virtual CPU mesh (VERDICT r3 next-round item 7).

The HLO collective inventory (PERF_R3.md section 1) states WHAT moves per
step; this executes the same programs at P = 2/4/8 devices and records
wall-time per step.  All P virtual devices timeshare ONE physical core,
so the honest signal is STRONG scaling on a fixed global problem: total
compute is P-independent, hence wall/step should stay ~flat and any
growth with P is partitioning + collective overhead — exactly the
quantity the "collectives are negligible" claim needs an executed number
for.  (Absolute CPU times are meaningless for TPU; only the trend is.)

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     JAX_PLATFORMS='' python scripts/exp_r4_scaling.py
(the script forces the cpu backend in-process; several minutes of CPU
XLA compiles.)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

STEPS = 30


def _mark(s):
    print(f"[scale] {s}", file=sys.stderr, flush=True)


def _time_steps(f, *args):
    out = f(*args)  # compile
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = f(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / STEPS)
    return best * 1e3  # ms/step


def run(p, devices):
    from torch_asg_tpu.parallel import (
        asg_loss_dp, asg_loss_seq, asg_loss_vp, make_mesh,
    )

    rows = {}
    r = np.random.default_rng(0)

    # Shapes are sized so a step is tens of ms: the CPU backend pays a
    # fixed ~1 ms per-device dispatch cost per step, which at dryrun-tiny
    # shapes grows linearly with P and would swamp the collective signal
    # the curve is after.
    # dp: fixed global batch B=16, loss+grads (the ∂T psum program)
    mesh = make_mesh((p,), ("data",), devices=devices[:p])
    n, b, t = 32, 16, 128
    inputs = jnp.asarray(r.normal(size=(t, b, n)), jnp.float32)
    targets = jnp.asarray(r.integers(0, n, size=(b, 3)), jnp.int32)
    li, lo = jnp.full((b,), t, jnp.int32), jnp.full((b,), 3, jnp.int32)
    trans = jnp.zeros((n, n), jnp.float32)
    f_dp = jax.jit(jax.value_and_grad(
        lambda tr: asg_loss_dp(mesh, tr, inputs, targets, li, lo,
                               impl="scan")))
    _mark(f"compile dp P={p}")
    rows["dp"] = _time_steps(f_dp, trans)

    # vp: fixed N=32 sharded over the model axis, loss+∂T (the α-stream
    # all_gather program)
    vmesh = make_mesh((p,), ("model",), devices=devices[:p])
    vn, vb, vt = 32, 4, 64
    v_inputs = jnp.asarray(r.normal(size=(vt, vb, vn)), jnp.float32)
    v_targets = jnp.asarray(r.integers(0, vn, size=(vb, 3)), jnp.int32)
    v_li = jnp.full((vb,), vt, jnp.int32).at[1].set(vt - 1)
    v_lo = jnp.asarray(r.integers(2, 4, size=(vb,)), jnp.int32)
    v_trans = jnp.zeros((vn, vn), jnp.float32)
    f_vp = jax.jit(jax.value_and_grad(
        lambda tr: asg_loss_vp(vmesh, tr, v_inputs, v_targets, v_li, v_lo)))
    _mark(f"compile vp P={p}")
    rows["vp"] = _time_steps(f_vp, v_trans)

    # sp: fixed T=128 sharded over the seq axis (the boundary transfer-
    # matrix all_gather program), forward loss
    smesh = make_mesh((p,), ("seq",), devices=devices[:p])
    st_t, sn = 128, 32
    s_inputs = jnp.asarray(r.normal(size=(st_t, 2, sn)), jnp.float32)
    s_targets = jnp.asarray(r.integers(0, sn, size=(2, 3)), jnp.int32)
    s_li = jnp.asarray([st_t, st_t - 1], jnp.int32)
    s_lo = jnp.asarray([3, 2], jnp.int32)
    s_trans = jnp.zeros((sn, sn), jnp.float32)
    f_sp = jax.jit(
        lambda tr, i: asg_loss_seq(smesh, tr, i, s_targets, s_li, s_lo))
    _mark(f"compile sp P={p}")
    rows["sp"] = _time_steps(f_sp, s_trans, s_inputs)
    return rows


def main():
    devices = jax.devices("cpu")
    assert len(devices) >= 8, "need XLA_FLAGS=--xla_force_host_platform_device_count=8"
    print(f"backend: {jax.default_backend()}, {len(devices)} virtual devices",
          flush=True)
    table = {}
    for p in (2, 4, 8):
        table[p] = run(p, devices)
        print(f"P={p}: " + "  ".join(
            f"{k} {v:7.2f} ms/step" for k, v in table[p].items()), flush=True)
    base = table[2]
    for prog in ("dp", "vp", "sp"):
        ratio8 = table[8][prog] / base[prog]
        print(f"{prog}: wall(P=8)/wall(P=2) = {ratio8:.2f} "
              f"(flat = zero collective/partition overhead on the "
              f"timeshared core)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
