"""Strip features from the REAL _score_kernel to find the 50x slowdown.

S0: verbatim copy of _score_kernel
S1: S0 minus seed selects (no li/lo wheres in the loop)
S2: S1 minus offset tracking (no per-step (B,1) log)
S3: S2 minus j==0 top-row carry branch (reads ib_ref[j_local] directly)
S4: S0 but with finite inputs (no -inf padding) — same code, different data
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.dont_write_bytecode = True

from torch_asg_tpu.ops.pallas.asg_kernels import (  # noqa: E402
    _col0, _exp_rows, _rescale, _rot_left, NEG_INF,
)

B, T, S, N = 64, 1000, 128, 128
KB = 8


def kern(
    li_ref, lo_ref, e_ref, self_ref, next_ref, ib_ref, aib_ref,
    sful_ref, sfac_ref,
    pb_c, qb_c, offb_c, eib_top, cib_top, aib_top,
    *, kb, num_labels, seeds, offsets, carry,
):
    k = pl.program_id(0)
    nb = pl.num_programs(0)
    li = li_ref[:]
    lo = lo_ref[:]
    e = e_ref[:]
    selft = self_ref[:]
    nextt = next_ref[:]
    dt = e.dtype

    @pl.when(k == 0)
    def _():
        pb_c[:] = jnp.zeros_like(pb_c)
        qb_c[:] = jnp.full_like(qb_c, NEG_INF)
        offb_c[:] = jnp.zeros_like(offb_c)
        eib_top[:] = jnp.zeros_like(eib_top)
        cib_top[:] = jnp.zeros_like(cib_top)
        aib_top[:] = jnp.full_like(aib_top, NEG_INF)

    lane_n = jax.lax.broadcasted_iota(jnp.int32, pb_c.shape, 1)
    seed_fcc = (lane_n < num_labels).astype(dt)
    lane_s = jax.lax.broadcasted_iota(jnp.int32, qb_c.shape, 1)
    seed_fac = jnp.where(lane_s == lo - 1, 0.0, NEG_INF).astype(dt)

    pb, qb = pb_c[:], qb_c[:]
    offb = offb_c[:]
    b_start = (nb - 1 - k) * kb

    for j in range(kb):
        j_local = kb - 1 - j
        t_b = b_start + j_local
        seed_b = li - 1 == t_b

        if carry:
            if j == 0:
                eib_n, cb_n = eib_top[:], cib_top[:]
                ai_n = aib_top[:]
            else:
                eib_n, cb_n = _exp_rows(ib_ref[j_local + 1])
                ai_n = aib_ref[j_local + 1]
        else:
            eib_n, cb_n = _exp_rows(ib_ref[j_local])
            ai_n = aib_ref[j_local]

        sb, logmb = _rescale(
            jnp.dot(pb * eib_n, e, preferred_element_type=dt)
        )
        if seeds:
            pb = jnp.where(seed_b, seed_fcc, sb)
        else:
            pb = sb
        if offsets:
            if seeds:
                offb = jnp.where(seed_b, 0.0, offb + cb_n + logmb)
            else:
                offb = offb + cb_n + logmb

        x = qb + ai_n
        rawb = jnp.logaddexp(selft + x, nextt + _rot_left(x, NEG_INF))
        qb = jnp.where(seed_b, seed_fac, rawb) if seeds else rawb

    pb_c[:], qb_c[:] = pb, qb
    offb_c[:] = offb
    eib0, cib0 = _exp_rows(ib_ref[0])
    eib_top[:], cib_top[:] = eib0, cib0
    aib_top[:] = aib_ref[0]

    @pl.when(k == nb - 1)
    def _():
        tot = jnp.sum(pb * eib0, axis=1, keepdims=True)
        sful_ref[:] = jnp.log(tot) + cib0 + offb
        sfac_ref[:] = _col0(qb, lane_s) + _col0(aib_ref[0], lane_s)


def build(seeds, offsets, carry):
    kb = KB
    nb = T // kb
    blk = (kb, B, N)
    desc = pl.BlockSpec(blk, lambda k: (nb - 1 - k, 0, 0), memory_space=pltpu.VMEM)
    cb1 = pl.BlockSpec((B, 1), lambda k: (0, 0), memory_space=pltpu.VMEM)
    cbn = pl.BlockSpec((B, N), lambda k: (0, 0), memory_space=pltpu.VMEM)
    cnn = pl.BlockSpec((N, N), lambda k: (0, 0), memory_space=pltpu.VMEM)

    def f(li, lo, e, selft, nextt, ib, aib):
        return pl.pallas_call(
            functools.partial(
                kern, kb=kb, num_labels=30, seeds=seeds, offsets=offsets,
                carry=carry,
            ),
            grid=(nb,),
            in_specs=[cb1, cb1, cnn, cbn, cbn, desc, desc],
            out_specs=[cb1, cb1],
            out_shape=[
                jax.ShapeDtypeStruct((B, 1), jnp.float32),
                jax.ShapeDtypeStruct((B, 1), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((B, N), jnp.float32),
                pltpu.VMEM((B, N), jnp.float32),
                pltpu.VMEM((B, 1), jnp.float32),
                pltpu.VMEM((B, N), jnp.float32),
                pltpu.VMEM((B, 1), jnp.float32),
                pltpu.VMEM((B, N), jnp.float32),
            ],
        )(li, lo, e, selft, nextt, ib, aib)

    return jax.jit(f)


def timed(fn, *args, iters=20):
    for _ in range(3):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    r = np.random.default_rng(0)
    li = jnp.asarray(r.integers(T // 2, T + 1, size=(B, 1)), jnp.int32)
    lo = jnp.asarray(r.integers(10, 40, size=(B, 1)), jnp.int32)
    e = jnp.asarray(np.exp(r.normal(size=(N, N)) * 0.1 - 1), jnp.float32)
    selft = jnp.asarray(r.normal(size=(B, N)), jnp.float32)
    nextt = jnp.asarray(r.normal(size=(B, N)), jnp.float32)
    raw = r.normal(size=(T, B, N)).astype(np.float32)
    # -inf masked version (like the real op)
    masked = raw.copy()
    tmask = np.arange(T)[:, None] < np.asarray(li)[None, :, 0]
    masked[~tmask] = -np.inf
    masked[:, :, 30:] = -np.inf
    inf_in = jnp.asarray(masked)
    fin_in = jnp.asarray(raw)

    cases = [
        ("S0 verbatim, -inf data", True, True, True, inf_in),
        ("S1 no seeds          ", False, True, True, inf_in),
        ("S2 no seeds/offsets  ", False, False, True, inf_in),
        ("S3 minimal           ", False, False, False, inf_in),
        ("S4 verbatim, finite  ", True, True, True, fin_in),
    ]
    for name, seeds, offsets, carry, data in cases:
        f = build(seeds, offsets, carry)
        print(f"{name}: {timed(f, li, lo, e, selft, nextt, data, data):7.3f} ms")


if __name__ == "__main__":
    main()
