"""Round-3 experiment: HLO collective inventory of the sharded steps
(VERDICT r2 next-round item 6).

Compiles the dp / vp / sp programs on an 8-virtual-device CPU mesh (the
same programs the driver dryrun executes) and inventories every
collective in the OPTIMIZED HLO — op kind, output shape, bytes, count —
so docs/PERF_R2.md §4b's multi-chip projection rests on compiler-reported
collectives instead of hand-estimated ones.  Shapes here are the small
dryrun shapes; the table also prints each collective's byte count scaled
to the production shape (collective payloads scale linearly in the
sharded operand dims, which the scaling column states explicitly).

Run:  python scripts/exp_r3_hlo.py   (sets up its own cpu+8 config; run
      from the repo root in a FRESH process)
"""

import os
import re
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COLLECTIVES = (
    "all-gather", "all-reduce", "reduce-scatter", "collective-permute",
    "all-to-all",
)
_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4,
                "u32": 4, "s8": 1, "u8": 1, "pred": 1}


def inventory(compiled_text, label):
    """Count collectives in optimized HLO: {(kind, dtype, shape): count}."""
    out = {}
    pat = re.compile(
        r"=\s+(?:\()?(\w+)\[([\d,]*)\][^=]*?\s("
        + "|".join(COLLECTIVES) + r")(?:-start)?\("
    )
    for m in pat.finditer(compiled_text):
        dtype, shape_s, kind = m.group(1), m.group(2), m.group(3)
        shape = tuple(int(x) for x in shape_s.split(",") if x)
        key = (kind, dtype, shape)
        out[key] = out.get(key, 0) + 1
    print(f"\n== {label} ==")
    if not out:
        print("  (no collectives)")
    total_bytes = 0
    for (kind, dtype, shape), cnt in sorted(out.items()):
        n = int(np.prod(shape)) if shape else 1
        b = n * _DTYPE_BYTES.get(dtype, 4)
        total_bytes += b * cnt
        print(f"  {cnt}x {kind:20s} {dtype}{list(shape)}  {b} B each")
    print(f"  total collective payload/step: {total_bytes} B")
    return out


def main():
    devices = jax.devices()[:8]
    n = len(devices)
    assert n == 8, f"need 8 virtual devices, got {n}"

    from torch_asg_tpu.parallel import (
        asg_loss_dp, asg_loss_seq, asg_loss_vp, make_mesh,
    )

    r = np.random.default_rng(0)
    num_labels = 16

    # ---- data parallel (loss + grads) -------------------------------
    dp_mesh = make_mesh((n,), ("data",), devices=devices)
    dp_b = 2 * n
    dp_inputs = jnp.asarray(r.normal(size=(8, dp_b, num_labels)), jnp.float32)
    dp_targets = jnp.asarray(
        r.integers(0, num_labels, size=(dp_b, 3)), jnp.int32
    )
    dp_li = jnp.full((dp_b,), 8, jnp.int32)
    dp_lo = jnp.full((dp_b,), 3, jnp.int32)
    dp_trans = jnp.zeros((num_labels, num_labels), jnp.float32)
    dp = jax.jit(
        jax.value_and_grad(
            lambda tr, i: asg_loss_dp(dp_mesh, tr, i, dp_targets,
                                      dp_li, dp_lo, impl="scan"),
            argnums=(0, 1),
        )
    )
    txt = dp.lower(dp_trans, dp_inputs).compile().as_text()
    inventory(txt, f"dp train step (mesh data={n}, B={dp_b}, impl=scan)")

    # ---- vocab parallel (loss + transition grad) --------------------
    vp_mesh = make_mesh((n,), ("model",), devices=devices)
    vp_n = 2 * n
    vp_inputs = jnp.asarray(r.normal(size=(6, 2, vp_n)), jnp.float32)
    vp_targets = jnp.asarray(r.integers(0, vp_n, size=(2, 3)), jnp.int32)
    vp_li = jnp.asarray([6, 5], jnp.int32)
    vp_lo = jnp.asarray([3, 2], jnp.int32)
    vp_trans = jnp.zeros((vp_n, vp_n), jnp.float32)
    vp = jax.jit(
        jax.value_and_grad(
            lambda tr: asg_loss_vp(vp_mesh, tr, vp_inputs, vp_targets,
                                   vp_li, vp_lo)
        )
    )
    txt = vp.lower(vp_trans).compile().as_text()
    inventory(txt, f"vp train step (mesh model={n}, N={vp_n}, T=6)")

    # ---- sequence parallel (loss) -----------------------------------
    seq_mesh = make_mesh((n,), ("seq",), devices=devices)
    t_seq = 4 * n
    sp_inputs = jnp.asarray(r.normal(size=(t_seq, 2, num_labels)), jnp.float32)
    sp_targets = jnp.asarray(r.integers(0, num_labels, size=(2, 3)), jnp.int32)
    sp_li = jnp.asarray([t_seq, t_seq - 1], jnp.int32)
    sp_lo = jnp.asarray([3, 2], jnp.int32)
    sp_trans = jnp.zeros((num_labels, num_labels), jnp.float32)
    sp = jax.jit(
        lambda tr, i: asg_loss_seq(seq_mesh, tr, i, sp_targets, sp_li, sp_lo)
    )
    txt = sp.lower(sp_trans, sp_inputs).compile().as_text()
    inventory(txt, f"sp loss (mesh seq={n}, T={t_seq}, N={num_labels})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
