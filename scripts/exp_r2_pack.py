"""Round-2: FAC lane-packing go/no-go.

The FAC chain state is (B, S) with S=50 real lanes out of 128.  Packing
TWO batch elements per 128-lane row ((B/2, 128), element b in lanes
[(b%2)*64, (b%2)*64+S)) halves the vector registers every FAC chain op
touches.  This script measures a score-only forward walk (both chains,
FCC unchanged at (B, N_pad)) with the packed FAC chain, parity-checked
against the production kernel's scores.

Seam safety: lanes S..63 / 64+S..127 hold -inf aligned emissions, and
next_trans at the seam lanes is -inf, so the lane-rolls cannot leak mass
across the two packed elements.
"""

import os
import sys
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import torch_asg_tpu.ops.pallas.asg_kernels as ak
from torch_asg_tpu.ops.pallas.common import LANE, NEG_INF, SUBLANE, pad_axis, round_up
from torch_asg_tpu.utils.profiling import fetch_overhead_s, time_fn_chained

B, T, S, N = 64, 1000, 50, 30
KB = 8
CHAIN_K = 8
HALF = 64  # lanes per packed element
BP = B // 2


def _kernel(
    li_ref, liq_ref, loq_ref, e_ref, self_ref, next_ref, ib_ref, aib_ref,
    sful_ref, sfac_ref,
    pb_c, qb_c, offb_c, eib_top, cib_top, aib_top,
    *, kb, num_labels,
):
    k = pl.program_id(0)
    nb = pl.num_programs(0)
    li = li_ref[:]        # (B, 1) int32 — FCC mask
    liq = liq_ref[:]      # (BP, 128) int32 — packed per-lane input lengths
    loq = loq_ref[:]      # (BP, 128) int32 — packed per-lane target lengths
    e = e_ref[:]
    selft = self_ref[:]   # (BP, 128) packed
    nextt = next_ref[:]   # (BP, 128) packed, -inf at seam lanes
    dt = e.dtype
    n_pad = pb_c.shape[1]

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
    lane_q = jax.lax.broadcasted_iota(jnp.int32, qb_c.shape, 1)
    s_local = lane_q % HALF
    # packed FAC beta seed: 0 at s_local == L_out-1 of the element's half
    seed_fac = jnp.where(s_local == loq - 1, 0.0, NEG_INF).astype(dt)

    b_start = (nb - 1 - k) * kb
    ib_m = ak._masked_block(ib_ref, li, b_start, n_pad, kb)
    eib_blk, cib_blk = ak._exp_rows(ib_m)
    aib_blk = aib_ref[:]  # (kb, BP, 128) pre-packed, pre-masked

    pb, qb = pb_c[:], qb_c[:]
    offb = offb_c[:]

    for j in range(kb):
        j_local = kb - 1 - j
        t_b = b_start + j_local
        seed_b = li - 1 == t_b
        seed_q = liq - 1 == t_b

        if j == 0:
            eib_n, cb_n = eib_top[:], cib_top[:]
            ai_n = aib_top[:]
        else:
            eib_n, cb_n = eib_blk[j_local + 1], cib_blk[j_local + 1]
            ai_n = aib_blk[j_local + 1]

        sb, logmb = ak._rescale(ak._dot(pb * eib_n, e, dt))
        pb = jnp.where(seed_b, seed_fcc, sb)
        offb = jnp.where(seed_b, 0.0, offb + cb_n + logmb)

        x = qb + ai_n
        rawb = jnp.logaddexp(selft + x, nextt + ak._rot_left(x, NEG_INF))
        qb = jnp.where(seed_q, seed_fac, rawb)

    pb_c[:], qb_c[:] = pb, qb
    offb_c[:] = offb
    eib_top[:], cib_top[:] = eib_blk[0], cib_blk[0]
    aib_top[:] = aib_blk[0]

    @pl.when(k == nb - 1)
    def _():
        tot = jnp.sum(pb * eib_blk[0], axis=1, keepdims=True)
        sful_ref[:] = jnp.log(tot) + cib_blk[0] + offb
        # packed readout: score lives at s_local == 0 of each half
        sfac_ref[:] = jnp.where(s_local == 0, qb + aib_blk[0], 0.0)


def pack_bs(x, fill):
    """(..., B, S) -> (..., B/2, 128): element b in lanes (b%2)*64 + s."""
    lead = x.shape[:-2]
    out = np.full(lead + (BP, 2, HALF), fill, np.float32)
    out[..., :, 0, :S] = np.asarray(x[..., 0::2, :], np.float32)
    out[..., :, 1, :S] = np.asarray(x[..., 1::2, :], np.float32)
    return jnp.asarray(out.reshape(lead + (BP, 2 * HALF)))


def main():
    print("backend:", jax.default_backend())
    r = np.random.default_rng(0)
    inputs = jnp.asarray(r.normal(size=(T, B, N)), jnp.float32)
    trans = jnp.asarray(r.normal(size=(N, N)) * 0.5, jnp.float32)
    targets = jnp.asarray(r.integers(0, N, size=(B, S)), jnp.int32)
    li = jnp.asarray(r.integers(T // 2, T + 1, size=(B,)), jnp.int32)
    lo = jnp.asarray(r.integers(S // 2, S + 1, size=(B,)), jnp.int32)
    fetch = fetch_overhead_s()

    # reference scores from the production primal
    ref_full, ref_fac = jax.jit(
        lambda tr, i: ak.asg_scores_fused(tr, i, targets, li, lo)
    )(trans, inputs)

    lat, ip, ap, e, e_t, self_p, next_p, li_col, lo_col, c, dims = jax.jit(
        lambda tr, i: ak._prepare(tr, i, targets, li, lo)
    )(trans, inputs)
    b_pad = round_up(B, SUBLANE)
    n_pad = round_up(max(N, LANE), LANE)

    # pack the FAC-side operands
    ap_packed = pack_bs(np.asarray(ap[:, :B, :S]), NEG_INF)  # (T, BP, 128)
    self_packed = pack_bs(np.asarray(self_p[:B, :S])[None], 0.0)[0]
    next_np = np.asarray(next_p[:B, :S])
    nextp = np.full((BP, 2, HALF), NEG_INF, np.float32)
    nextp[:, 0, :S] = next_np[0::2]
    nextp[:, 1, :S] = next_np[1::2]
    # seam + padding lanes of next_trans stay -inf so rolls cannot leak
    next_packed = jnp.asarray(nextp.reshape(BP, 2 * HALF))
    li_np, lo_np = np.asarray(li), np.asarray(lo)
    liq = np.zeros((BP, 2, HALF), np.int32)
    loq = np.zeros((BP, 2, HALF), np.int32)
    liq[:, 0, :] = li_np[0::2, None]
    liq[:, 1, :] = li_np[1::2, None]
    loq[:, 0, :] = lo_np[0::2, None]
    loq[:, 1, :] = lo_np[1::2, None]
    liq = jnp.asarray(liq.reshape(BP, 2 * HALF))
    loq = jnp.asarray(loq.reshape(BP, 2 * HALF))

    kb = KB
    nb = ip.shape[0] // kb
    kern = functools.partial(_kernel, kb=kb, num_labels=N)

    def call(e_, ip_, ap_):
        return pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=[
                ak._const((b_pad, 1)),
                ak._const((BP, 2 * HALF)),
                ak._const((BP, 2 * HALF)),
                ak._const((n_pad, n_pad)),
                ak._const((BP, 2 * HALF)),
                ak._const((BP, 2 * HALF)),
                ak._desc(kb, b_pad, ip_.shape[2], nb),
                ak._desc(kb, BP, 2 * HALF, nb),
            ],
            out_specs=[ak._const((b_pad, 1)), ak._const((BP, 2 * HALF))],
            out_shape=[
                jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
                jax.ShapeDtypeStruct((BP, 2 * HALF), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((b_pad, n_pad), jnp.float32),
                pltpu.VMEM((BP, 2 * HALF), jnp.float32),
                pltpu.VMEM((b_pad, 1), jnp.float32),
                pltpu.VMEM((b_pad, n_pad), jnp.float32),
                pltpu.VMEM((b_pad, 1), jnp.float32),
                pltpu.VMEM((BP, 2 * HALF), jnp.float32),
            ],
        )(li_col, liq, loq, e_, self_packed, next_packed, ip_, ap_)

    def chained(e_, ip_, ap_):
        def body(e_c, _):
            sful, sfac = call(e_c, ip_, ap_)
            return e_c + 0.0 * sful[0, 0], (sful, sfac)
        e_o, (sf, sa) = jax.lax.scan(body, e_, None, length=CHAIN_K)
        return sf[-1], sa[-1], e_o

    f = jax.jit(chained)
    sful, sfac, _ = f(e, ip, ap_packed)

    # parity: unpack and repay the exp(-c) scaling like _fix_scores
    steps = np.asarray(li, np.float32) - 1.0
    full = np.asarray(sful)[:B, 0] + steps * float(c)
    sfac_np = np.asarray(sfac)
    fac = np.empty(B, np.float32)
    fac[0::2] = sfac_np[:, 0]
    fac[1::2] = sfac_np[:, HALF]
    okf = np.allclose(full, np.asarray(ref_full), rtol=1e-4, atol=1e-4)
    oka = np.allclose(fac, np.asarray(ref_fac), rtol=1e-4, atol=1e-4)
    print(f"parity: full={okf} fac={oka} "
          f"dmax={np.max(np.abs(fac - np.asarray(ref_fac))):.2e}")

    t = min(
        time_fn_chained(lambda e_: f(e_, ip, ap_packed),
                        lambda x0, out: out[2], e,
                        warmup=2, iters=30, fetch_s=fetch)
        for _ in range(3)
    ) * 1e3 / CHAIN_K
    print(f"packed both-chain walk: {t:.3f} ms ({t*1e6/T:.1f} ns/step)")

    # unpacked baseline in the SAME process for a fair A/B
    def call_u(e_, ip_, ap_):
        kern_u = functools.partial(
            getattr(__import__('scripts.exp_r2_chain', fromlist=['_kernel']),
                    '_kernel'),
            kb=kb, num_labels=N, mode="both",
        )
        s_pad = round_up(max(S, LANE), LANE)
        score_shape = jax.ShapeDtypeStruct((b_pad, 1), jnp.float32)
        return pl.pallas_call(
            kern_u,
            grid=(nb,),
            in_specs=[
                ak._const((b_pad, 1)),
                ak._const((b_pad, 1)),
                ak._const((n_pad, n_pad)),
                ak._const((b_pad, s_pad)),
                ak._const((b_pad, s_pad)),
                ak._desc(kb, b_pad, ip_.shape[2], nb),
                ak._desc(kb, b_pad, ap_.shape[2], nb),
            ],
            out_specs=[ak._const((b_pad, 1)), ak._const((b_pad, 1))],
            out_shape=[score_shape, score_shape],
            scratch_shapes=[
                pltpu.VMEM((b_pad, n_pad), jnp.float32),
                pltpu.VMEM((b_pad, s_pad), jnp.float32),
                pltpu.VMEM((b_pad, 1), jnp.float32),
                pltpu.VMEM((b_pad, n_pad), jnp.float32),
                pltpu.VMEM((b_pad, 1), jnp.float32),
                pltpu.VMEM((b_pad, s_pad), jnp.float32),
                pltpu.VMEM((b_pad, 1), jnp.float32),
                pltpu.VMEM((b_pad, 1), jnp.float32),
            ],
        )(li_col, lo_col, e_, self_p, next_p, ip_, ap_)

    def chained_u(e_):
        def body(e_c, _):
            sful, sfac = call_u(e_c, ip, ap)
            return e_c + 0.0 * sful[0, 0], sful
        e_o, sf = jax.lax.scan(body, e_, None, length=CHAIN_K)
        return sf[-1], e_o

    fu = jax.jit(chained_u)
    fu(e)
    tu = min(
        time_fn_chained(fu, lambda x0, out: out[1], e,
                        warmup=2, iters=30, fetch_s=fetch)
        for _ in range(3)
    ) * 1e3 / CHAIN_K
    print(f"unpacked baseline:      {tu:.3f} ms ({tu*1e6/T:.1f} ns/step)")


if __name__ == "__main__":
    main()
