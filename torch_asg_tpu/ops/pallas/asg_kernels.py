"""Fully-fused ASG Pallas kernel: all four lattice recursions in ONE kernel.

The reference needs four CUDA streams to overlap its four independent
recursions (zh217/torch-asg ``streamlined_fast_gpu.cpp:121-129``: FCC-alpha,
FCC-beta, FAC-alpha, FAC-beta).  A TPU core runs one kernel at a time, so
the TPU-native equivalent is stronger: interleave all four dependency
chains inside a single Pallas kernel so they hide each other's latency,
with the whole T-recursion fused into one launch.

Performance structure (beyond the per-lattice kernels in
``fcc_kernels.py`` / ``fac_kernels.py``):

1.  **Exp-domain FCC chains (scaled-probability forward algorithm).**
    The fully-connected step ``alpha_t = I_t + lse_j(T + alpha_{t-1})``
    is carried as a *normalized probability row* ``p_t ~ exp(alpha_t)``,
    renormalized by its max every step, so the serial chain collapses to
    ``matmul -> multiply -> max -> rescale`` with no exp/log on the chain
    (per-frame emission exponentials depend only on inputs and sit off
    the chain).  This is fp32-safe *for the FCC lattice specifically*:
    full connectivity bounds the within-row spread of alpha by one step's
    emission+transition spread, so normalized rows never underflow.
    Per-batch offsets are tracked only for the beta chain (the score
    needs them); the backward never needs offsets because per-(t,b)
    scales cancel in every softmax.

2.  **Log-domain FAC chains.**  The aligned lattice's within-row spread
    grows with |s - t*S/T| and routinely exceeds fp32's ~88-nat exp
    range, so the 2-edge chains stay in log space:
    ``logaddexp(stay, advance)`` per step — pure VPU, no matmul, cheap
    enough that the FCC matmul chain still gates the step.

3.  **Vectorized backward.**  Gradients need no serial recursion at all
    (the reference's headline claim, README.md:17-23): each time block is
    processed with fully vectorized posterior softmaxes, and the FCC dT
    accumulation is ONE (N, K*B) @ (K*B, N) MXU product per block, with
    the per-step transition softmax recomputed from the stored normalized
    alpha rows (``softmax_j = E^T[j,i] PA_prev[j] / (PA_prev @ E^T)[i]``).
    The reference's O(T*B*N^2) ``path_contrib`` tensor
    (``fully_connected_lattice.cpp:77``) never exists in any form.  FAC
    edge fractions use the direct form ``exp(alpha_prev + trans + I~ -
    alpha)`` whose exponent is <= 0 by construction — a single exp of a
    bounded value, never a tiny/tiny division.

The inner time loop is *statically unrolled* (``for j in range(kb)``):
profiling showed a dynamic ``fori_loop`` costs ~1.5 us/step in loop and
dynamic-indexing overhead, an order of magnitude above the real per-step
compute.  Unrolling gives Mosaic static addresses and lets it software-
pipeline across steps.

Ragged lengths are handled exactly like the rest of the framework:
emissions are pre-masked to -inf outside ``t < L_in[b]``, the beta chains
re-seed at ``t == L_in[b]-1``, and the FCC chain's per-step transition
scale ``exp(-c)`` is repaid as ``(L_in-1)*c`` outside the kernel.

Behavior parity: forward scores and gradients match
``fully_connected_lattice.cpp`` / ``force_aligned_lattice.cpp`` (see
ops/fcc.py and ops/fac.py for the per-formula citations); the fused
forward returns the same (full, aligned) pair as the reference's streamed
forward (``streamlined_fast_gpu.cpp:227-229``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import LANE, NEG_INF, SUBLANE, pad_axis, round_up, use_interpret
from ..fac import make_aligned, scatter_to_full
from ...utils.lengths import mask_emissions

# Lattice steps per sequential grid iteration (statically unrolled).
ASG_TIME_BLOCK = 8
# MXU precision for the serial chain matmuls.  HIGH (3 bf16 passes) keeps
# per-step rounding ~f32-grade at half the HIGHEST latency; the chain is
# latency-bound on this matmul.
CHAIN_PRECISION = jax.lax.Precision.HIGHEST


def _safe_max_rows(x):
    m = jnp.max(x, axis=-1, keepdims=True)
    return jnp.where(jnp.isfinite(m), m, 0.0)


def _exp_rows(x):
    """(exp(x - rowmax), rowmax) with all-(-inf) rows mapping to zeros."""
    c = _safe_max_rows(x)
    return jnp.exp(x - c), c


def _rot_right(x, fill=0.0):
    """Lane s takes lane s-1 along the last axis; lane 0 takes ``fill``."""
    y = jnp.concatenate([x[..., -1:], x[..., :-1]], axis=-1)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(col == 0, fill, y)


def _rot_left(x, fill=0.0):
    """Lane s takes lane s+1 along the last axis; last lane takes ``fill``."""
    y = jnp.concatenate([x[..., 1:], x[..., :1]], axis=-1)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(col == x.shape[-1] - 1, fill, y)


def _rescale(row):
    """Renormalize an exp-domain row to max 1; returns (row', log max)."""
    m = jnp.max(row, axis=1, keepdims=True)
    m_s = jnp.where(m > 0, m, 1.0)
    return row * (1.0 / m_s), jnp.log(m_s)


def _col0(x, lane):
    """Extract lane 0 of a (B, S) row as (B, 1)."""
    return jnp.sum(jnp.where(lane == 0, x, 0.0), axis=1, keepdims=True)


def _dot(a, b, dt):
    return jnp.dot(a, b, preferred_element_type=dt, precision=CHAIN_PRECISION)


# ---------------------------------------------------------------------------
# fused forward kernel (training): FCC-alpha/beta + FAC-alpha/beta
# ---------------------------------------------------------------------------


def _fwd_kernel(
    li_ref, lo_ref, e_ref, e_t_ref, self_ref, next_ref,
    ia_ref, ib_ref, aia_ref, aib_ref,
    pa_ref, pb_ref, qa_ref, qb_ref, sful_ref, sfac_ref,
    pa_c, pb_c, qa_c, qb_c, offb_c, eib_top, cib_top, aib_top,
    *, kb, num_labels,
):
    k = pl.program_id(0)
    nb = pl.num_programs(0)
    li = li_ref[:]  # (B, 1) int32
    lo = lo_ref[:]
    e = e_ref[:]
    e_t = e_t_ref[:]
    selft = self_ref[:]
    nextt = next_ref[:]
    dt = e.dtype

    @pl.when(k == 0)
    def _():
        # FCC chains live in the exp domain (semiring zero = 0); FAC
        # chains in the log domain (semiring zero = -inf).
        pa_c[:] = jnp.zeros_like(pa_c)
        pb_c[:] = jnp.zeros_like(pb_c)
        qa_c[:] = jnp.full_like(qa_c, NEG_INF)
        qb_c[:] = jnp.full_like(qb_c, NEG_INF)
        offb_c[:] = jnp.zeros_like(offb_c)
        eib_top[:] = jnp.zeros_like(eib_top)
        cib_top[:] = jnp.zeros_like(cib_top)
        aib_top[:] = jnp.full_like(aib_top, NEG_INF)

    lane_n = jax.lax.broadcasted_iota(jnp.int32, pa_c.shape, 1)
    seed_fcc = (lane_n < num_labels).astype(dt)  # beta seed row: 1 on real labels
    lane_s = jax.lax.broadcasted_iota(jnp.int32, qa_c.shape, 1)
    # FAC beta seed: 0 at s = L_out-1, -inf elsewhere (log domain).
    seed_fac = jnp.where(lane_s == lo - 1, 0.0, NEG_INF).astype(dt)

    pa, pb, qa, qb = pa_c[:], pb_c[:], qa_c[:], qb_c[:]
    offb = offb_c[:]
    b_start = (nb - 1 - k) * kb

    for j in range(kb):
        j_local = kb - 1 - j
        t_b = b_start + j_local
        seed_b = li - 1 == t_b  # (B, 1)

        # ---- FCC alpha at t_a = k*kb + j (ascending, exp domain)
        eia_j, _ = _exp_rows(ia_ref[j])
        s = _dot(pa, e_t, dt)
        if j == 0:
            # t == 0: alpha_0 = I_0, i.e. the transition sum is the
            # semiring one (exp-domain 1).
            s = jnp.where(k == 0, jnp.ones_like(s), s)
        pa, _ = _rescale(s * eia_j)
        pa_ref[j] = pa

        # ---- FCC beta at t_b (descending, exp domain); eats I[t_b + 1]
        if j == 0:
            eib_n, cb_n = eib_top[:], cib_top[:]
        else:
            eib_n, cb_n = _exp_rows(ib_ref[j_local + 1])
        sb, logmb = _rescale(_dot(pb * eib_n, e, dt))
        pb = jnp.where(seed_b, seed_fcc, sb)
        offb = jnp.where(seed_b, 0.0, offb + cb_n + logmb)
        pb_ref[j_local] = pb

        # ---- FAC alpha at t_a (log domain, 2-way logaddexp)
        ai_j = aia_ref[j]
        raw = ai_j + jnp.logaddexp(qa + selft, _rot_right(qa + nextt, NEG_INF))
        if j == 0:
            # t == 0: only state s = 0 is accessible
            # (force_aligned_lattice.cpp:294).
            raw = jnp.where(
                k == 0, jnp.where(lane_s == 0, ai_j, NEG_INF), raw
            )
        qa = raw
        qa_ref[j] = qa

        # ---- FAC beta at t_b (log domain); eats aligned I~[t_b + 1]
        ai_n = aib_top[:] if j == 0 else aib_ref[j_local + 1]
        x = qb + ai_n
        rawb = jnp.logaddexp(selft + x, nextt + _rot_left(x, NEG_INF))
        qb = jnp.where(seed_b, seed_fac, rawb)
        qb_ref[j_local] = qb

    pa_c[:], pb_c[:], qa_c[:], qb_c[:] = pa, pb, qa, qb
    offb_c[:] = offb
    eib0, cib0 = _exp_rows(ib_ref[0])
    eib_top[:], cib_top[:] = eib0, cib0
    aib_top[:] = aib_ref[0]

    @pl.when(k == nb - 1)
    def _():
        # Beta chains have reached t = 0 (descending block 0 holds t=0).
        # full score  = lse_i(beta_0 + I_0)          (fully_connected:89)
        # fac score   = beta_fac[0,:,0] + I~[0,:,0]  (force_aligned:316)
        # The FCC per-step exp(-c) scaling is repaid outside: +(L_in-1)*c.
        tot = jnp.sum(pb * eib0, axis=1, keepdims=True)
        sful_ref[:] = jnp.log(tot) + cib0 + offb
        sfac_ref[:] = _col0(qb, lane_s) + _col0(aib_ref[0], lane_s)


# ---------------------------------------------------------------------------
# fused score kernel (forward-only): the two beta chains + scores
# ---------------------------------------------------------------------------


def _score_kernel(
    li_ref, lo_ref, e_ref, self_ref, next_ref, ib_ref, aib_ref,
    sful_ref, sfac_ref,
    pb_c, qb_c, offb_c, eib_top, cib_top, aib_top,
    *, kb, num_labels,
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

        if j == 0:
            eib_n, cb_n = eib_top[:], cib_top[:]
            ai_n = aib_top[:]
        else:
            eib_n, cb_n = _exp_rows(ib_ref[j_local + 1])
            ai_n = aib_ref[j_local + 1]

        sb, logmb = _rescale(_dot(pb * eib_n, e, dt))
        pb = jnp.where(seed_b, seed_fcc, sb)
        offb = jnp.where(seed_b, 0.0, offb + cb_n + logmb)

        x = qb + ai_n
        rawb = jnp.logaddexp(selft + x, nextt + _rot_left(x, NEG_INF))
        qb = jnp.where(seed_b, seed_fac, rawb)

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


# ---------------------------------------------------------------------------
# fused backward kernel: vectorized per block (no serial recursion at all)
# ---------------------------------------------------------------------------


def _bwd_kernel(
    gful_ref, gfac_ref, e_ref, e_t_ref, self_ref, next_ref,
    pa_ref, pb_ref, qa_ref, qb_ref, aia_ref,
    gi_ref, gali_ref, gt_ref, gself_ref, gnext_ref,
    pa_prev_c, qa_prev_c, acc_t, acc_self, acc_diag,
    *, kb,
):
    k = pl.program_id(0)
    nb = pl.num_programs(0)
    dt = acc_t.dtype

    @pl.when(k == 0)
    def _():
        acc_t[:] = jnp.zeros_like(acc_t)
        acc_self[:] = jnp.zeros_like(acc_self)
        acc_diag[:] = jnp.zeros_like(acc_diag)
        # alpha_{-1} is the semiring zero: its dT contribution vanishes
        # through the matmul / the t > 0 mask, no branch needed.
        pa_prev_c[:] = jnp.zeros_like(pa_prev_c)
        qa_prev_c[:] = jnp.full_like(qa_prev_c, NEG_INF)

    gful = gful_ref[:][None]  # (1, B, 1)
    gfac = gfac_ref[:][None]

    # ---- FCC: posterior dI + one-matmul dT accumulation
    pa_blk = pa_ref[:]  # (K, B, N), normalized exp-domain alpha
    pb_blk = pb_ref[:]
    # Posterior softmax in log space for fp32 robustness (the PA*PB
    # product may underflow even where the softmax is well defined).
    gam = jnp.log(pa_blk) + jnp.log(pb_blk)
    m = _safe_max_rows(gam)
    eg = jnp.exp(gam - m)
    den = jnp.sum(eg, axis=2, keepdims=True)
    gi = eg * (1.0 / jnp.where(den > 0, den, 1.0)) * gful
    gi_ref[:] = gi

    kb_, b_pad, n_pad = pa_blk.shape
    pa_prev = jnp.concatenate([pa_prev_c[:][None], pa_blk[: kb - 1]], axis=0)
    pa_prev_f = pa_prev.reshape(kb_ * b_pad, n_pad)
    # softmax_j(T[i,j] + alpha_{t-1,j}) = E^T[j,i] pa_prev[j] / S[i]:
    # recompute S with one MXU matmul instead of storing path_contrib.
    # S >= exp(T[i,argmax] - c) keeps the division fp32-safe.
    s = jnp.dot(pa_prev_f, e_t_ref[:], preferred_element_type=dt)
    u = gi.reshape(kb_ * b_pad, n_pad) * (1.0 / jnp.where(s > 0, s, 1.0))
    acc_t[:] += jax.lax.dot_general(
        u, pa_prev_f, (((0,), (0,)), ((), ())), preferred_element_type=dt
    )
    pa_prev_c[:] = pa_blk[kb - 1]

    # ---- FAC: posterior + 2-edge split, log-domain inputs
    qa_blk = qa_ref[:]  # (K, B, S) log-domain alpha
    qb_blk = qb_ref[:]
    gamq = qa_blk + qb_blk
    mq = _safe_max_rows(gamq)
    eq = jnp.exp(gamq - mq)
    denq = jnp.sum(eq, axis=2, keepdims=True)
    gq = eq * (1.0 / jnp.where(denq > 0, denq, 1.0)) * gfac
    gali_ref[:] = gq

    qa_prev = jnp.concatenate([qa_prev_c[:][None], qa_blk[: kb - 1]], axis=0)
    selft = self_ref[:][None]
    nextt = next_ref[:][None]
    # Edge fractions as direct exps of <= 0 exponents
    # (force_aligned_lattice.cpp:165-180 recomputed instead of stored):
    #   hori = exp(alpha_prev[s]   + self[s]   + I~ - alpha)
    #   diag = exp(alpha_prev[s-1] + next[s-1] + I~ - alpha)
    sub = jnp.where(jnp.isfinite(qa_blk), aia_ref[:] - qa_blk, NEG_INF)
    hori = jnp.exp(qa_prev + selft + sub)
    diag = jnp.exp(_rot_right(qa_prev + nextt, NEG_INF) + sub)
    t_idx = k * kb + jax.lax.broadcasted_iota(jnp.int32, (kb_, 1, 1), 0)
    w = (t_idx > 0).astype(dt)  # t = 0 carries no edge mass
    lane_s3 = jax.lax.broadcasted_iota(jnp.int32, qa_blk.shape, 2)
    # s = 0 has only the self-loop in-edge, factor 1
    # (force_aligned_lattice.cpp:175).
    edge_self = jnp.where(lane_s3 == 0, 1.0, hori)
    acc_self[:] += jnp.sum(gq * edge_self * w, axis=0)
    acc_diag[:] += jnp.sum(gq * diag * w, axis=0)
    qa_prev_c[:] = qa_blk[kb - 1]

    @pl.when(k == nb - 1)
    def _():
        gt_ref[:] = acc_t[:] * e_ref[:]  # dT[i,j] = acc[i,j] exp(T[i,j]-c)
        gself_ref[:] = acc_self[:]
        # next_trans[b, s] feeds state s+1: shift the diagonal mass down.
        gnext_ref[:] = _rot_left(acc_diag[:], 0.0)


# ---------------------------------------------------------------------------
# pallas_call wiring
# ---------------------------------------------------------------------------


def _const(shape):
    return pl.BlockSpec(shape, lambda k: (0,) * len(shape), memory_space=pltpu.VMEM)


def _asc(kb, b, x):
    return pl.BlockSpec((kb, b, x), lambda k: (k, 0, 0), memory_space=pltpu.VMEM)


def _desc(kb, b, x, nb):
    return pl.BlockSpec(
        (kb, b, x), lambda k: (nb - 1 - k, 0, 0), memory_space=pltpu.VMEM
    )


def _run_fwd(li_col, lo_col, e, e_t, self_p, next_p, ip, ap, num_labels):
    t_pad, b_pad, n_pad = ip.shape
    s_pad = ap.shape[2]
    kb = ASG_TIME_BLOCK
    nb = t_pad // kb
    dt = ip.dtype
    kern = functools.partial(_fwd_kernel, kb=kb, num_labels=num_labels)
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            _const((b_pad, 1)),
            _const((b_pad, 1)),
            _const((n_pad, n_pad)),
            _const((n_pad, n_pad)),
            _const((b_pad, s_pad)),
            _const((b_pad, s_pad)),
            _asc(kb, b_pad, n_pad),
            _desc(kb, b_pad, n_pad, nb),
            _asc(kb, b_pad, s_pad),
            _desc(kb, b_pad, s_pad, nb),
        ],
        out_specs=[
            _asc(kb, b_pad, n_pad),
            _desc(kb, b_pad, n_pad, nb),
            _asc(kb, b_pad, s_pad),
            _desc(kb, b_pad, s_pad, nb),
            _const((b_pad, 1)),
            _const((b_pad, 1)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(ip.shape, dt),
            jax.ShapeDtypeStruct(ip.shape, dt),
            jax.ShapeDtypeStruct(ap.shape, dt),
            jax.ShapeDtypeStruct(ap.shape, dt),
            jax.ShapeDtypeStruct((b_pad, 1), dt),
            jax.ShapeDtypeStruct((b_pad, 1), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((b_pad, n_pad), dt),
            pltpu.VMEM((b_pad, n_pad), dt),
            pltpu.VMEM((b_pad, s_pad), dt),
            pltpu.VMEM((b_pad, s_pad), dt),
            pltpu.VMEM((b_pad, 1), dt),
            pltpu.VMEM((b_pad, n_pad), dt),
            pltpu.VMEM((b_pad, 1), dt),
            pltpu.VMEM((b_pad, s_pad), dt),
        ],
        interpret=use_interpret(),
    )(li_col, lo_col, e, e_t, self_p, next_p, ip, ip, ap, ap)


def _run_score(li_col, lo_col, e, self_p, next_p, ip, ap, num_labels):
    t_pad, b_pad, n_pad = ip.shape
    s_pad = ap.shape[2]
    kb = ASG_TIME_BLOCK
    nb = t_pad // kb
    dt = ip.dtype
    kern = functools.partial(_score_kernel, kb=kb, num_labels=num_labels)
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            _const((b_pad, 1)),
            _const((b_pad, 1)),
            _const((n_pad, n_pad)),
            _const((b_pad, s_pad)),
            _const((b_pad, s_pad)),
            _desc(kb, b_pad, n_pad, nb),
            _desc(kb, b_pad, s_pad, nb),
        ],
        out_specs=[_const((b_pad, 1)), _const((b_pad, 1))],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, 1), dt),
            jax.ShapeDtypeStruct((b_pad, 1), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((b_pad, n_pad), dt),
            pltpu.VMEM((b_pad, s_pad), dt),
            pltpu.VMEM((b_pad, 1), dt),
            pltpu.VMEM((b_pad, n_pad), dt),
            pltpu.VMEM((b_pad, 1), dt),
            pltpu.VMEM((b_pad, s_pad), dt),
        ],
        interpret=use_interpret(),
    )(li_col, lo_col, e, self_p, next_p, ip, ap)


def _run_bwd(gful_col, gfac_col, e, e_t, self_p, next_p, pa, pb, qa, qb, ap):
    t_pad, b_pad, n_pad = pa.shape
    s_pad = qa.shape[2]
    kb = ASG_TIME_BLOCK
    nb = t_pad // kb
    dt = pa.dtype
    kern = functools.partial(_bwd_kernel, kb=kb)
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            _const((b_pad, 1)),
            _const((b_pad, 1)),
            _const((n_pad, n_pad)),
            _const((n_pad, n_pad)),
            _const((b_pad, s_pad)),
            _const((b_pad, s_pad)),
            _asc(kb, b_pad, n_pad),
            _asc(kb, b_pad, n_pad),
            _asc(kb, b_pad, s_pad),
            _asc(kb, b_pad, s_pad),
            _asc(kb, b_pad, s_pad),
        ],
        out_specs=[
            _asc(kb, b_pad, n_pad),
            _asc(kb, b_pad, s_pad),
            _const((n_pad, n_pad)),
            _const((b_pad, s_pad)),
            _const((b_pad, s_pad)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(pa.shape, dt),
            jax.ShapeDtypeStruct(qa.shape, dt),
            jax.ShapeDtypeStruct((n_pad, n_pad), dt),
            jax.ShapeDtypeStruct((b_pad, s_pad), dt),
            jax.ShapeDtypeStruct((b_pad, s_pad), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((b_pad, n_pad), dt),
            pltpu.VMEM((b_pad, s_pad), dt),
            pltpu.VMEM((n_pad, n_pad), dt),
            pltpu.VMEM((b_pad, s_pad), dt),
            pltpu.VMEM((b_pad, s_pad), dt),
        ],
        interpret=use_interpret(),
    )(gful_col, gfac_col, e, e_t, self_p, next_p, pa, pb, qa, qb, ap)


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


def _prepare(transition, inputs, targets, input_lengths, target_lengths):
    lat = make_aligned(transition, inputs, targets, input_lengths, target_lengths)
    inputs_m = mask_emissions(inputs, input_lengths)
    t_total, num_batches, num_labels = inputs.shape
    s_total = targets.shape[1]
    kb = ASG_TIME_BLOCK
    n_pad = round_up(max(num_labels, LANE), LANE)
    s_pad = round_up(max(s_total, LANE), LANE)
    b_pad = round_up(max(num_batches, SUBLANE), SUBLANE)
    t_pad = round_up(t_total, kb)

    ip = pad_axis(
        pad_axis(pad_axis(inputs_m, n_pad, 2, NEG_INF), b_pad, 1, NEG_INF),
        t_pad, 0, NEG_INF,
    )
    ap = pad_axis(
        pad_axis(pad_axis(lat.inputs, s_pad, 2, NEG_INF), b_pad, 1, NEG_INF),
        t_pad, 0, NEG_INF,
    )
    # Any finite c works (it cancels against the (L_in-1)*c repayment);
    # the max keeps every exp argument <= 0.
    c = jnp.max(transition)
    c = jnp.where(jnp.isfinite(c), c, 0.0).astype(ip.dtype)
    trans_p = pad_axis(pad_axis(transition, n_pad, 0, NEG_INF), n_pad, 1, NEG_INF)
    e = jnp.exp(trans_p - c)  # e[j, i] = exp(T[j,i] - c); beta contracts j
    e_t = e.T  # alpha contracts source labels
    self_p = pad_axis(pad_axis(lat.self_trans, s_pad, 1, 0.0), b_pad, 0, 0.0)
    next_p = pad_axis(pad_axis(lat.next_trans, s_pad, 1, 0.0), b_pad, 0, 0.0)
    li_col = pad_axis(input_lengths.astype(jnp.int32), b_pad, 0, 1)[:, None]
    lo_col = pad_axis(target_lengths.astype(jnp.int32), b_pad, 0, 1)[:, None]
    dims = (t_total, num_batches, num_labels, s_total, b_pad, n_pad, s_pad)
    return lat, ip, ap, e, e_t, self_p, next_p, li_col, lo_col, c, dims


def _fix_scores(sful, sfac, input_lengths, c, num_batches):
    # Repay the FCC chain's per-step exp(-c) transition scaling: the beta
    # recursion runs L_in-1 steps from its seed, one transition each.
    steps = input_lengths.astype(sful.dtype) - 1.0
    full = sful[:num_batches, 0] + steps * c
    aligned = sfac[:num_batches, 0]
    return full, aligned


@jax.custom_vjp
def asg_scores_fused(
    transition: jnp.ndarray,
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    input_lengths: jnp.ndarray,
    target_lengths: jnp.ndarray,
):
    """(full_scores, aligned_scores), each (B,) — one fused TPU kernel.

    The primal runs the score-only kernel (beta chains only), reproducing
    the reference's forward-only fast path (streamlined_fast_gpu.cpp:24-94)
    with one launch instead of two streams.
    """
    lat, ip, ap, e, e_t, self_p, next_p, li_col, lo_col, c, dims = _prepare(
        transition, inputs, targets, input_lengths, target_lengths
    )
    num_batches, num_labels = dims[1], dims[2]
    sful, sfac = _run_score(li_col, lo_col, e, self_p, next_p, ip, ap, num_labels)
    return _fix_scores(sful, sfac, input_lengths, c, num_batches)


def _fused_fwd(transition, inputs, targets, input_lengths, target_lengths):
    lat, ip, ap, e, e_t, self_p, next_p, li_col, lo_col, c, dims = _prepare(
        transition, inputs, targets, input_lengths, target_lengths
    )
    num_batches, num_labels = dims[1], dims[2]
    pa, pb, qa, qb, sful, sfac = _run_fwd(
        li_col, lo_col, e, e_t, self_p, next_p, ip, ap, num_labels
    )
    scores = _fix_scores(sful, sfac, input_lengths, c, num_batches)
    res = (lat, e, e_t, self_p, next_p, pa, pb, qa, qb, ap, dims)
    return scores, res


def _fused_bwd(res, g):
    gful, gfac = g
    lat, e, e_t, self_p, next_p, pa, pb, qa, qb, ap, dims = res
    t_total, num_batches, num_labels, s_total, b_pad, n_pad, s_pad = dims
    gful_col = pad_axis(gful.astype(pa.dtype), b_pad, 0, 0.0)[:, None]
    gfac_col = pad_axis(gfac.astype(pa.dtype), b_pad, 0, 0.0)[:, None]
    gi, gali, gt, gself, gnext = _run_bwd(
        gful_col, gfac_col, e, e_t, self_p, next_p, pa, pb, qa, qb, ap
    )
    grad_inputs = gi[:t_total, :num_batches, :num_labels]
    grad_transition = gt[:num_labels, :num_labels]
    gt_fac, gi_fac = scatter_to_full(
        lat,
        gali[:t_total, :num_batches, :s_total],
        gself[:num_batches, :s_total],
        gnext[:num_batches, :s_total],
        num_labels,
    )
    return (
        grad_transition + gt_fac,
        grad_inputs + gi_fac,
        None,
        None,
        None,
    )


asg_scores_fused.defvjp(_fused_fwd, _fused_bwd)
