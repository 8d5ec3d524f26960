"""Round-2 chain-latency isolation: what binds the fused forward walk?

Score-only forward kernel variants at the benchmark shape, all chained
+ fetch-synced (see .claude/skills/verify/SKILL.md):

  v0_both      replica of the production fwd walk (FCC exp + FAC log)
  v1_fcc       FCC chain alone (dot + rescale per step)
  v2_fac       FAC chain alone (2-way logaddexp per step)
  v3_fcc_stale FCC with the rowmax rescale taken OFF the critical path
               (normalize with the max from two steps ago)
  v4_both_stale v0 with the stale-rescale FCC chain
  v5_dotchain  bare dependent-dot chain (the MXU latency floor)
  v6_raw       v0 but streaming raw-width (T,B,30)/(T,B,50) emissions
  v7_fac2      FAC chain at HALF serial depth: 2 frames per dependent
               step via a composed 3-band operator whose band weights
               (w0/w1/w2 from emissions+transitions) precompute OFF the
               chain.  TIMING-ONLY (per-element seeding inside a pair is
               not implemented); answers PERF_R2 §5 lead 2's open
               question — does halving the FAC dependency depth beat the
               2-logaddexp/step walk on-chip?
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

from torch_asg_tpu.ops.pallas import asg_kernels as ak
from torch_asg_tpu.ops.pallas.common import LANE, NEG_INF, SUBLANE, pad_axis, round_up
from torch_asg_tpu.utils.profiling import fetch_overhead_s, time_fn_chained

B, T, S, N = 64, 1000, 50, 30
KB = 8
CHAIN_K = 8  # kernel runs per dispatch (in-graph chaining)


def make_case():
    r = np.random.default_rng(0)
    inputs = jnp.asarray(r.normal(size=(T, B, N)), jnp.float32)
    trans = jnp.asarray(r.normal(size=(N, N)) * 0.5, jnp.float32)
    targets = jnp.asarray(r.integers(0, N, size=(B, S)), jnp.int32)
    li = jnp.asarray(r.integers(T // 2, T + 1, size=(B,)), jnp.int32)
    lo = jnp.asarray(r.integers(S // 2, S + 1, size=(B,)), jnp.int32)
    return trans, inputs, targets, li, lo


def _kernel(
    li_ref, lo_ref, e_ref, self_ref, next_ref, ib_ref, aib_ref,
    sful_ref, sfac_ref,
    pb_c, qb_c, offb_c, eib_top, cib_top, aib_top, m1_c, m2_c,
    *, kb, num_labels, mode,
):
    k = pl.program_id(0)
    nb = pl.num_programs(0)
    li = li_ref[:]
    lo = lo_ref[:]
    e = e_ref[:]
    selft = self_ref[:]
    nextt = next_ref[:]
    dt = e.dtype
    n_pad = pb_c.shape[1]
    s_pad = qb_c.shape[1]
    do_fcc = mode in ("both", "fcc", "fcc_stale", "both_stale", "raw")
    do_fac = mode in ("both", "fac", "both_stale", "raw")
    do_fac2 = mode == "fac2"
    stale = mode in ("fcc_stale", "both_stale")

    @pl.when(k == 0)
    def _():
        pb_c[:] = jnp.zeros_like(pb_c)
        qb_c[:] = jnp.full_like(qb_c, NEG_INF)
        offb_c[:] = jnp.zeros_like(offb_c)
        eib_top[:] = jnp.zeros_like(eib_top)
        cib_top[:] = jnp.zeros_like(cib_top)
        aib_top[:] = jnp.full_like(aib_top, NEG_INF)
        m1_c[:] = jnp.ones_like(m1_c)
        m2_c[:] = jnp.ones_like(m2_c)

    lane_n = jax.lax.broadcasted_iota(jnp.int32, pb_c.shape, 1)
    seed_fcc = (lane_n < num_labels).astype(dt)
    lane_s = jax.lax.broadcasted_iota(jnp.int32, qb_c.shape, 1)
    seed_fac = jnp.where(lane_s == lo - 1, 0.0, NEG_INF).astype(dt)

    b_start = (nb - 1 - k) * kb
    ib_m = ak._masked_block(ib_ref, li, b_start, n_pad, kb)
    eib_blk, cib_blk = ak._exp_rows(ib_m)
    aib_blk = ak._lane_pad(aib_ref[:], s_pad, NEG_INF)

    pb, qb = pb_c[:], qb_c[:]
    offb = offb_c[:]
    m1, m2 = m1_c[:], m2_c[:]  # stale rowmaxes (1 and 2 steps old)

    for j in range(kb):
        j_local = kb - 1 - j
        t_b = b_start + j_local
        seed_b = li - 1 == t_b

        if j == 0:
            eib_n, cb_n = eib_top[:], cib_top[:]
            ai_n = aib_top[:]
        else:
            eib_n, cb_n = eib_blk[j_local + 1], cib_blk[j_local + 1]
            ai_n = aib_blk[j_local + 1]

        if do_fcc and not stale:
            sb, logmb = ak._rescale(ak._dot(pb * eib_n, e, dt))
            pb = jnp.where(seed_b, seed_fcc, sb)
            offb = jnp.where(seed_b, 0.0, offb + cb_n + logmb)
        elif do_fcc:
            # stale rescale: normalize by the rowmax from two steps ago;
            # the rowmax reduce of THIS step runs off the critical path.
            inv = 1.0 / m2
            raw = ak._dot(pb * (eib_n * inv), e, dt)
            pb = jnp.where(seed_b, seed_fcc, raw)
            m_now = jnp.max(pb, axis=1, keepdims=True)
            m_now = jnp.where(m_now > 0, m_now, 1.0)
            offb = jnp.where(seed_b, 0.0, offb + cb_n + jnp.log(m2))
            m2 = jnp.where(seed_b, 1.0, m1)
            m1 = jnp.where(seed_b, 1.0, m_now)

        if do_fac:
            x = qb + ai_n
            rawb = jnp.logaddexp(selft + x, nextt + ak._rot_left(x, NEG_INF))
            qb = jnp.where(seed_b, seed_fac, rawb)

    if do_fac2:
        # Vectorized band-weight precompute (off the serial chain): the
        # 2-step composed operator q'' = lse3(w0+q, w1+rot(q), w2+rot2(q)).
        rl = lambda v: ak._rot_left(v, NEG_INF)
        for p in range(kb // 2):
            j_hi = kb - 1 - 2 * p
            ai1 = aib_blk[j_hi]
            ai2 = aib_blk[max(j_hi - 1, 0)]
            w0 = selft + ai2 + selft + ai1
            w1 = jnp.logaddexp(
                selft + ai2 + nextt + rl(ai1),
                nextt + rl(ai2) + rl(selft) + rl(ai1),
            )
            w2 = nextt + rl(ai2) + rl(nextt) + rl(rl(ai1))
            # dependent part: ONE lse3 per 2 frames
            a0 = w0 + qb
            a1 = w1 + rl(qb)
            a2 = w2 + rl(rl(qb))
            m = jnp.maximum(jnp.maximum(a0, a1), a2)
            m_safe = jnp.where(m > 0.5 * NEG_INF, m, 0.0)
            s = (
                jnp.exp(a0 - m_safe) + jnp.exp(a1 - m_safe)
                + jnp.exp(a2 - m_safe)
            )
            qb = jnp.where(
                m > 0.5 * NEG_INF, jnp.log(s) + m_safe, NEG_INF
            ).astype(dt)

    pb_c[:], qb_c[:] = pb, qb
    offb_c[:] = offb
    m1_c[:], m2_c[:] = m1, m2
    eib_top[:], cib_top[:] = eib_blk[0], cib_blk[0]
    aib_top[:] = aib_blk[0]

    @pl.when(k == nb - 1)
    def _():
        if stale:
            # repay the residual un-normalized magnitude at readout
            mfin = jnp.max(pb * eib_blk[0], axis=1, keepdims=True)
            mfin = jnp.where(mfin > 0, mfin, 1.0)
            tot = jnp.sum((pb * eib_blk[0]) * (1.0 / mfin), axis=1, keepdims=True)
            sful_ref[:] = jnp.log(tot) + jnp.log(mfin) + cib_blk[0] + offb
        else:
            tot = jnp.sum(pb * eib_blk[0], axis=1, keepdims=True)
            sful_ref[:] = jnp.log(tot) + cib_blk[0] + offb
        sfac_ref[:] = ak._col0(qb, lane_s) + ak._col0(aib_blk[0], lane_s)


def _dotchain_kernel(e_ref, x_ref, out_ref, acc_c, *, kb):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        acc_c[:] = x_ref[:]

    acc = acc_c[:]
    e = e_ref[:]
    for _ in range(kb):
        acc = ak._dot(acc, e, acc.dtype)
    acc_c[:] = acc

    @pl.when(k == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc


def run_variant(mode, trans, inputs, targets, li, lo):
    lat, ip, ap, e, e_t, self_p, next_p, li_col, lo_col, c, dims = jax.jit(
        lambda tr, i: ak._prepare(tr, i, targets, li, lo)
    )(trans, inputs)
    num_labels = N
    b_pad = round_up(B, SUBLANE)
    n_pad = round_up(max(N, LANE), LANE)
    s_pad = round_up(max(S, LANE), LANE)
    if mode == "raw":
        # strip the lane padding back off: stream raw-width emissions
        ip = ip[:, :, :N]
        ap = ap[:, :, :S]
    kb = KB
    nb = ip.shape[0] // kb
    dt = e.dtype

    kern = functools.partial(_kernel, kb=kb, num_labels=num_labels, mode=mode)
    score_shape = jax.ShapeDtypeStruct((b_pad, 1), dt)

    def call(e_, self_, next_, ip_, ap_):
        return pl.pallas_call(
            kern,
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
                pltpu.VMEM((b_pad, n_pad), dt),
                pltpu.VMEM((b_pad, s_pad), dt),
                pltpu.VMEM((b_pad, 1), dt),
                pltpu.VMEM((b_pad, n_pad), dt),
                pltpu.VMEM((b_pad, 1), dt),
                pltpu.VMEM((b_pad, s_pad), dt),
                pltpu.VMEM((b_pad, 1), dt),
                pltpu.VMEM((b_pad, 1), dt),
            ],
        )(li_col, lo_col, e_, self_, next_, ip_, ap_)

    # In-graph chain of CHAIN_K kernel runs per dispatch: host-side
    # feedback ops cost ~0.3-1 ms of dispatch floor EACH through this
    # tunnel, swamping sub-ms kernels.  One dispatch = CHAIN_K dependent
    # kernel executions; divide at the end.
    def chained(e_, self_, next_, ip_, ap_):
        def body(e_c, _):
            sful, sfac = call(e_c, self_, next_, ip_, ap_)
            e_n = e_c + jnp.nan_to_num(0.0 * (sful[0, 0] + sfac[0, 0]))
            return e_n, (sful, sfac)
        e_out, (sf, sa) = jax.lax.scan(body, e_, None, length=CHAIN_K)
        return sf[-1], sa[-1], e_out

    f_all = jax.jit(chained)
    sful, sfac, _ = f_all(e, self_p, next_p, ip, ap)
    f = lambda e_: f_all(e_, self_p, next_p, ip, ap)
    return f, e, ip, (np.asarray(sful), np.asarray(sfac))


def main():
    print("backend:", jax.default_backend())
    trans, inputs, targets, li, lo = make_case()
    fetch = fetch_overhead_s()
    print(f"fetch overhead: {fetch*1e3:.1f} ms")

    # production baseline in the same process: asg_scores_fused primal
    from torch_asg_tpu.ops.pallas import asg_scores_fused

    def prod_chain(tr, i):
        def body(tr_c, _):
            full, al = asg_scores_fused(tr_c, i, targets, li, lo)
            return tr_c + 0.0 * full[0], full
        tr_o, fulls = jax.lax.scan(body, tr, None, length=CHAIN_K)
        return fulls[-1], tr_o

    prod = jax.jit(prod_chain)
    prod(trans, inputs)
    t_prod = min(
        time_fn_chained(
            lambda tr: prod(tr, inputs),
            lambda x0, out: out[1],
            trans, warmup=2, iters=30, fetch_s=fetch,
        )
        for _ in range(3)
    ) * 1e3 / CHAIN_K
    print(f"{'PROD fwdonly':12s} {t_prod:7.3f} ms  ({t_prod*1e6/T:6.1f} ns/step)")

    results = {}
    ref_scores = None
    for mode in ["both", "fcc", "fac", "fac2", "fcc_stale", "both_stale", "raw"]:
        f, e, ip, scores = run_variant(mode, trans, inputs, targets, li, lo)

        t = min(
            time_fn_chained(f, lambda x0, out: out[2], e,
                            warmup=2, iters=30, fetch_s=fetch)
            for _ in range(3)
        ) * 1e3 / CHAIN_K
        results[mode] = t
        if mode == "both":
            ref_scores = scores
        tag = ""
        if mode in ("both_stale", "raw") and ref_scores is not None:
            ok_f = np.allclose(scores[0][:B], ref_scores[0][:B], rtol=1e-4, atol=1e-4)
            ok_a = np.allclose(scores[1][:B], ref_scores[1][:B], rtol=1e-4, atol=1e-4)
            dmax = np.max(np.abs(scores[0][:B] - ref_scores[0][:B]))
            tag = f"  parity full={ok_f} fac={ok_a} dmax={dmax:.2e}"
        print(f"{mode:12s} {t:7.3f} ms  ({t*1e6/T:6.1f} ns/step){tag}")

    # bare MXU dependent-dot chain floor
    b_pad = round_up(B, SUBLANE)
    n_pad = round_up(N, LANE)
    e = jnp.exp(jnp.asarray(np.random.default_rng(1).normal(size=(n_pad, n_pad)), jnp.float32) * 0.01 - 1.0)
    x0 = jnp.ones((b_pad, n_pad), jnp.float32) / n_pad
    nb = T // KB
    dc = pl.pallas_call(
        functools.partial(_dotchain_kernel, kb=KB),
        grid=(nb,),
        in_specs=[ak._const((n_pad, n_pad)), ak._const((b_pad, n_pad))],
        out_specs=ak._const((b_pad, n_pad)),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b_pad, n_pad), jnp.float32)],
    )
    def dc_chain(e_, x):
        def body(x_c, _):
            out = dc(e_, x_c)
            return out, None
        x_o, _ = jax.lax.scan(body, x, None, length=CHAIN_K)
        return x_o

    dcj = jax.jit(dc_chain)
    dcj(e, x0)
    t = min(
        time_fn_chained(lambda x: dcj(e, x), lambda x0_, out: out, x0,
                        warmup=2, iters=30, fetch_s=fetch)
        for _ in range(3)
    ) * 1e3 / CHAIN_K
    print(f"{'dotchain':12s} {t:7.3f} ms  ({t*1e6/T:6.1f} ns/step)")


if __name__ == "__main__":
    main()
