"""Round-5: (a) ASG_TIME_BLOCK sweep on the REAL fused train step and
(b) per-op decomposition of the implemented-walk overhead.

VERDICT r4 item 3: the fused step sits at ~54-64% of the "implemented
walk" floor, but that floor is the builder's own kernel skeleton —
302 ns/step vs the 89.5 ns bare dependent dot — and neither the
212 ns/step gap nor ASG_TIME_BLOCK (pinned at 8 since round 1) has a
measured attribution.  This script:

  1. sweeps ASG_TIME_BLOCK over {4, 8, 16, 32} on the production
     fwd+bwd step (in-graph chained, parity-gated against kb=8);
  2. builds a family of mini-kernels that run strict SUBSETS of the
     store-less forward walk's per-step ops on identical pre-prepared
     operands, so differences attribute the walk's ns/step to
     individual in-block operations:

       dot            pb = dot(pb, e)                      (bare MXU chain)
       dot+mul        pb = dot(pb * eib_t, e)              (+ emission mul)
       fcc            full FCC step (rescale + seed selects + offb)
       fac            full FAC step (logaddexp + rot_left + seed select)
       fac_roll       FAC step with the concat+iota+where lane shift
                      replaced by a plain unconditional concat roll
                      (boundary fixed once per block) — candidate attack
       both           the production walk (= bench.py measure_walk_ns)

All timings: one TPU chip, in-graph chained (CHAIN_K dependent walks per
dispatch), 5 repeats, median/best/spread reported.  Operands are
spectral-radius-stabilized so rescale-free variants neither overflow nor
denormalize over T steps.
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import torch_asg_tpu.ops.pallas.asg_kernels as ak
from torch_asg_tpu.ops.pallas.common import LANE, NEG_INF, SUBLANE, round_up
from torch_asg_tpu.utils.profiling import fetch_overhead_s, time_fn_chained

B, T, S, N = 64, 1000, 50, 30
CHAIN_K = 8
REPEATS = 5


def make_case():
    r = np.random.default_rng(0)
    inputs = jnp.asarray(r.normal(size=(T, B, N)), jnp.float32)
    trans = jnp.asarray(r.normal(size=(N, N)) * 0.5, jnp.float32)
    targets = jnp.asarray(r.integers(0, N, size=(B, S)), jnp.int32)
    li = jnp.asarray(r.integers(T // 2, T + 1, size=(B,)), jnp.int32)
    lo = jnp.asarray(r.integers(S // 2, S + 1, size=(B,)), jnp.int32)
    return trans, inputs, targets, li, lo


def stats(obs):
    obs = sorted(obs)
    return {"best": round(obs[0], 4), "median": round(obs[len(obs) // 2], 4),
            "spread": round(obs[-1] - obs[0], 4)}


def timed_chain(f, x0, fetch_s, per, feedback=None):
    """f: jitted chain fn taking x0; returns ms (or ns) per unit."""
    feedback = feedback or (lambda _, out: out)
    obs = [
        time_fn_chained(f, feedback, x0, warmup=2, iters=12,
                        fetch_s=fetch_s) / per
        for _ in range(REPEATS)
    ]
    return stats(obs)


# ---------------------------------------------------------------------------
# (a) ASG_TIME_BLOCK sweep on the production step
# ---------------------------------------------------------------------------


def sweep_kb(trans, inputs, targets, li, lo, fetch_s):
    rows = []
    ref = None
    # kb must be a multiple of the 8-sublane tile: the (B, kb, S) aligned
    # stream blocks require their middle dim divisible by 8
    for kb in (8, 16, 32):
        ak.ASG_TIME_BLOCK = kb

        def vg(tr, inp):
            def loss_fn(a, b):
                f, al = ak.asg_scores_fused(a, b, targets, li, lo)
                return jnp.mean(f - al)
            return jax.value_and_grad(loss_fn, (0, 1))(tr, inp)

        def chain(inp):
            def body(inp_c, _):
                loss, (gt, gi) = vg(trans, inp_c)
                return inp_c + 0.0 * gi, loss
            inp_o, _ = jax.lax.scan(body, inp, None, length=CHAIN_K - 1)
            loss, (gt, gi) = vg(trans, inp_o)
            return loss, inp_o + 0.0 * gi, gt

        f = jax.jit(chain)
        try:
            loss, _, gt = f(inputs)
        except Exception as e:  # kb=32 bwd kernel exceeds scoped VMEM
            rows.append({"kb": kb, "error": str(e).split("\n")[0][:160]})
            print(json.dumps(rows[-1]), flush=True)
            continue
        loss, gt = float(loss), np.asarray(gt)
        if ref is None:
            ref = (loss, gt)
        ok = bool(
            np.allclose(ref[0], loss, rtol=1e-4)
            and np.allclose(ref[1], gt, rtol=1e-3, atol=1e-5)
        )
        s = timed_chain(lambda x: f(x), inputs, fetch_s, per=CHAIN_K / 1e3,
                        feedback=lambda _, out: out[1])
        rows.append({"kb": kb, "step_ms": s, "parity_vs_kb8": ok})
        print(json.dumps(rows[-1]), flush=True)
    ak.ASG_TIME_BLOCK = 8
    return rows


# ---------------------------------------------------------------------------
# (b) walk decomposition mini-kernels
# ---------------------------------------------------------------------------


def walk_kernel(variant, kb, n_pad, s_pad, b_pad):
    """Mini-kernel running a subset of the production walk's per-step ops.

    Operand roles mirror ak._fwd_kernel; all variants stream the SAME
    blocks so the load/prep side is held constant and the deltas are the
    serial-chain ops themselves."""

    def kern(li_ref, lo_ref, e_ref, self_ref, next_ref, ib_ref, aib_ref,
             sful_ref, sfac_ref, pb_c, qb_c, offb_c):
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
            pb_c[:] = jnp.ones_like(pb_c) / n_pad
            qb_c[:] = jnp.zeros_like(qb_c) - 1.0
            offb_c[:] = jnp.zeros_like(offb_c)

        lane_n = jax.lax.broadcasted_iota(jnp.int32, pb_c.shape, 1)
        seed_fcc = (lane_n < N).astype(dt)
        lane_s = jax.lax.broadcasted_iota(jnp.int32, qb_c.shape, 1)
        seed_fac = jnp.where(lane_s == lo - 1, 0.0, -1.0).astype(dt)

        b_start = (nb - 1 - k) * kb
        # block prep identical to production (masked load + exp + swap)
        ib_m = ak._masked_block(ib_ref, li, b_start, n_pad, kb)
        eib_blk, cib_blk = ak._exp_rows(ib_m)
        aib_raw = jnp.swapaxes(aib_ref[:], 0, 1)
        aib_blk = ak._lane_pad(aib_raw, s_pad, -1.0)

        if variant in ("fcc_sumnorm", "both_sumroll"):
            # once per block (amortized over kb steps): column sums of e
            e1 = jnp.sum(e, axis=1, keepdims=True)  # (n_pad, 1)

        pb, qb, offb = pb_c[:], qb_c[:], offb_c[:]
        for j in range(kb):
            j_local = kb - 1 - j
            t_b = b_start + j_local
            seed_b = li - 1 == t_b
            eib_n = eib_blk[j_local]
            cb_n = cib_blk[j_local]
            ai_n = aib_blk[j_local]

            if variant == "dot":
                pb = ak._dot(pb, e, dt)
            elif variant == "dot_mul":
                pb = ak._dot(pb * eib_n, e, dt)
            elif variant == "fcc_nsel":
                # dot+mul+max-rescale, NO seed selects / offb: isolates
                # the rescale-reduce cost from the select cost
                sb, logmb = ak._rescale(ak._dot(pb * eib_n, e, dt))
                pb = sb
            elif variant in ("fcc_sumnorm", "both_sumroll"):
                # sum-normalization via a PARALLEL MXU matvec:
                # rowsum((pb*eib) @ e) == (pb*eib) @ (e @ 1), so the
                # normalizer is a second dot issued alongside the main
                # one — the serial lane-max reduce disappears
                v = pb * eib_n
                sb = ak._dot(v, e, dt)
                ssum = ak._dot(v, e1, dt)  # (B, 1)
                s_safe = jnp.where(ssum > 0, ssum, 1.0)
                pb = jnp.where(seed_b, seed_fcc, sb * (1.0 / s_safe))
                offb = jnp.where(seed_b, 0.0, offb + cb_n + jnp.log(s_safe))
            elif variant in ("fcc", "both"):
                sb, logmb = ak._rescale(ak._dot(pb * eib_n, e, dt))
                pb = jnp.where(seed_b, seed_fcc, sb)
                offb = jnp.where(seed_b, 0.0, offb + cb_n + logmb)
            if variant in ("fac", "both"):
                x = qb + ai_n
                rawb = jnp.logaddexp(selft + x, nextt + ak._rot_left(x, -1.0))
                qb = jnp.where(seed_b, seed_fac, rawb)
            elif variant in ("fac_roll", "both_sumroll"):
                x = qb + ai_n
                rolled = jnp.concatenate([x[:, 1:], x[:, :1]], axis=-1)
                rawb = jnp.logaddexp(selft + x, nextt + rolled)
                qb = jnp.where(seed_b, seed_fac, rawb)

        pb_c[:], qb_c[:], offb_c[:] = pb, qb, offb

        @pl.when(k == nb - 1)
        def _():
            sful_ref[:] = jnp.sum(pb, axis=1, keepdims=True) + offb
            sfac_ref[:] = jnp.sum(qb * 1e-30, axis=1, keepdims=True)[:, :1]

    return kern


def run_walk_variant(variant, ops, fetch_s):
    (li_col, lo_col, e_stab, self_p, next_p, ip, ap, geom) = ops
    num_labels, n_pad, s_pad = geom
    t_pad, b_pad, n_raw = ip.shape
    s_raw = ap.shape[2]
    kb = 8
    nb = t_pad // kb
    dt = e_stab.dtype
    kern = walk_kernel(variant, kb, n_pad, s_pad, b_pad)
    score_shape = jax.ShapeDtypeStruct((b_pad, 1), dt)
    call = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            ak._const((b_pad, 1)),
            ak._const((b_pad, 1)),
            ak._const((n_pad, n_pad)),
            ak._const((b_pad, s_pad)),
            ak._const((b_pad, s_pad)),
            ak._desc(kb, b_pad, n_raw, nb),
            ak._bts_desc(kb, b_pad, s_raw, nb),
        ],
        out_specs=[ak._const((b_pad, 1)), ak._const((b_pad, 1))],
        out_shape=[score_shape, score_shape],
        scratch_shapes=[
            pltpu.VMEM((b_pad, n_pad), dt),
            pltpu.VMEM((b_pad, s_pad), dt),
            pltpu.VMEM((b_pad, 1), dt),
        ],
    )

    def chain(e_, ip_, ap_):
        def body(e_c, _):
            sful, sfac = call(li_col, lo_col, e_c, self_p, next_p, ip_, ap_)
            e_n = e_c + jnp.nan_to_num(0.0 * (sful[0, 0] + sfac[0, 0]))
            return e_n, None
        e_o, _ = jax.lax.scan(body, e_, None, length=CHAIN_K)
        return e_o

    f = jax.jit(chain)
    f(e_stab, ip, ap)
    # ns per lattice step
    return timed_chain(lambda e_: f(e_, ip, ap), e_stab, fetch_s,
                       per=CHAIN_K * T / 1e9)


def decompose_walk(trans, inputs, targets, li, lo, fetch_s):
    lat, ip, ap, e, e_t, self_p, next_p, li_col, lo_col, c, dims = jax.jit(
        lambda tr, i: ak._prepare(tr, i, targets, li, lo)
    )(trans, inputs)
    geom = (N, round_up(max(N, LANE), LANE), round_up(max(S, LANE), LANE))
    # spectral-radius-stabilized transition exp so rescale-free chains
    # stay finite and normal over T steps (same trick as bench.py's
    # dot-chain floor)
    r = np.random.default_rng(1)
    n_pad = geom[1]
    e_stab = jnp.exp(
        jnp.asarray(r.normal(size=(n_pad, n_pad)), jnp.float32) * 0.01 - 1.0
    ) / 2.0
    # FAC-side operands scaled near zero so the -1.0-domain chain stays
    # finite under repeated logaddexp
    self_s = jnp.zeros_like(self_p) - 0.7
    next_s = jnp.zeros_like(next_p) - 0.7
    ap_s = jnp.zeros_like(ap) - 0.01
    ops = (li_col, lo_col, e_stab, self_s, next_s, ip, ap_s, geom)

    rows = {}
    for variant in ("dot", "dot_mul", "fcc_nsel", "fcc", "fcc_sumnorm",
                    "fac", "fac_roll", "both", "both_sumroll"):
        rows[variant] = run_walk_variant(variant, ops, fetch_s)
        print(json.dumps({"variant": variant, "ns_per_step": rows[variant]}),
              flush=True)
    return rows


def main():
    print("backend:", jax.default_backend(), file=sys.stderr)
    trans, inputs, targets, li, lo = make_case()
    fetch_s = fetch_overhead_s()
    kb_rows = []
    if "--walk-only" not in sys.argv:
        print("== ASG_TIME_BLOCK sweep (production fwd+bwd, ms/step) ==",
              flush=True)
        kb_rows = sweep_kb(trans, inputs, targets, li, lo, fetch_s)
    print("== walk decomposition (store-less fwd walk, ns/step) ==",
          flush=True)
    walk_rows = decompose_walk(trans, inputs, targets, li, lo, fetch_s)
    print(json.dumps({"kb_sweep": kb_rows, "walk": walk_rows}))


if __name__ == "__main__":
    main()
