"""Fully-fused ASG Pallas kernels: both lattices, two passes over HBM.

The reference needs four CUDA streams to overlap its four independent
recursions (zh217/torch-asg ``streamlined_fast_gpu.cpp:121-129``: FCC-alpha,
FCC-beta, FAC-alpha, FAC-beta).  A TPU core runs one kernel at a time, so
the TPU-native equivalent is stronger: interleave the dependency chains
inside single Pallas kernels so they hide each other's latency, with whole
T-recursions fused into one launch each.

The op is HBM-bandwidth-bound (the per-step compute is tiny), so the
structure minimizes passes over (T, B, *)-sized data:

*   **Forward kernel = beta chains only + stores.**  Scores need only
    beta (``fully_connected_lattice.cpp:89``, ``force_aligned:316``), so
    the forward walks t downward once, streaming raw emissions and
    writing the beta residuals (PB exp-domain-normalized, QB log-domain).
    The score-only kernel is the same walk without the stores — the
    reference's forward-only fast path (``streamlined_fast_gpu.cpp:24-94``)
    with one launch instead of two streams.

*   **Backward kernel recomputes alpha instead of loading it.**  It walks
    t upward once, re-running both alpha chains in VMEM while consuming
    the stored betas, and emits all gradients in the same pass:
    posteriors dI, the FCC transition accumulation as ONE
    (N, K*B) @ (K*B, N) MXU product per time block, and the FAC 2-edge
    splits.  Alpha never touches HBM in either direction, and the
    reference's O(T*B*N^2) ``path_contrib`` tensor
    (``fully_connected_lattice.cpp:77``) never exists in any form.

*   **Raw, unpadded, unmasked emission streams.**  Kernels take (T, B, N)
    and (T, B, S) arrays as produced by the gather, lane-pad them to 128
    inside VMEM, and apply the ragged-length masking in-kernel from the
    lengths vector — the XLA-side mask/pad copies (4+ full-size HBM round
    trips) disappear.

Numeric domains: the FCC chains run in the exp domain (scaled-probability
recursion — the per-step logsumexp collapses to matmul+rescale with no
transcendentals on the serial chain; safe because full connectivity
bounds the within-row alpha spread by one step's emission+transition
spread).  The FAC chains stay in the log domain (2-way logaddexp) because
the aligned lattice's within-row spread grows with |s - t*S/T| and
routinely exceeds fp32's ~88-nat exp range.  Gradient formulas use only
multiplies, one exp of a provably <= 0 exponent (the FAC edge fraction,
``force_aligned_lattice.cpp:165-180`` recomputed), and log-space posterior
softmaxes — robust to fp32 underflow by construction.

Inner time loops are statically unrolled (``for j in range(kb)``): dynamic
``fori_loop`` indexing costs over a microsecond per step in loop overhead,
an order of magnitude above the per-step compute.

Behavior parity: forward scores and gradients match
``fully_connected_lattice.cpp`` / ``force_aligned_lattice.cpp`` (see
ops/fcc.py and ops/fac.py for per-formula citations); the fused forward
returns the same (full, aligned) pair as the reference's streamed forward
(``streamlined_fast_gpu.cpp:227-229``).
"""

from __future__ import annotations


import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import LANE, NEG_INF, SUBLANE, pad_axis, round_up, use_interpret
from ..fac import make_aligned, scatter_to_full

# Lattice steps per sequential grid iteration (statically unrolled).
ASG_TIME_BLOCK = 8


# The aligned emissions stream in their batched-dot-NATIVE (B, T, S)
# layout and the kernels consume (B, kb, S) blocks with one in-kernel
# swapaxes per block, instead of letting XLA insert the ~55 µs
# (B,S,T)->(T,B,S) minor-dim relayout copy PERF_R3 §3 named as the open
# lead.  Measured GO at the bench shape (round-4 adjudication of the
# ASG_BTS knob, docs/PERF_R4.md §2: ~30 µs off the fused step); the
# (kb, B, S)-block tbs arm was deleted with the knob.

# MXU precision for the chain matmuls, shared with the matmul
# formulation (knob + rationale live in ops/semiring.py: DEFAULT = one
# bf16 pass, ~20% faster, ~2e-5 relative score drift at T=1000).
# bench.py re-gates at HIGHEST each round via strict_chain_precision so
# rounding regressions cannot hide.  CPU interpret mode (the fp64 test
# suite) computes at full precision regardless.
from ..semiring import chain_precision as _chain_precision
from ..semiring import strict_chain_precision  # re-export for bench.py


def _safe_max_rows(x):
    m = jnp.max(x, axis=-1, keepdims=True)
    return jnp.where(jnp.isfinite(m), m, 0.0)


def _exp_rows(x):
    """(exp(x - rowmax), rowmax) with all-(-inf) rows mapping to zeros."""
    c = _safe_max_rows(x)
    return jnp.exp(x - c), c


# Wrap-rolls: plain lane rotations WITHOUT a boundary fix.  The guarded
# rotations below are these plus one iota+select on the boundary lane —
# which the round-5 walk decomposition measured at ~15-25 ns per serial
# step (scripts/exp_r5_walk.py, docs/PERF_R5.md §3).  The kernels use
# the bare wraps directly whenever the wrapped-in lane is already
# NEG_INF by construction (_prepare pins next_p's last pad lane to
# NEG_INF exactly so this holds; requires a pad lane, s_pad > s_total),
# which is bit-identical by the shared structure here.


def _wrap_left(x):
    return jnp.concatenate([x[..., 1:], x[..., :1]], axis=-1)


def _wrap_right(x):
    return jnp.concatenate([x[..., -1:], x[..., :-1]], axis=-1)


def _rot_right(x, fill=0.0):
    """Lane s takes lane s-1 along the last axis; lane 0 takes ``fill``."""
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(col == 0, fill, _wrap_right(x))


def _rot_left(x, fill=0.0):
    """Lane s takes lane s+1 along the last axis; last lane takes ``fill``."""
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(col == x.shape[-1] - 1, fill, _wrap_left(x))


def _rescale(row):
    """Renormalize an exp-domain row to max 1; returns (row', log max)."""
    m = jnp.max(row, axis=1, keepdims=True)
    m_s = jnp.where(m > 0, m, 1.0)
    return row * (1.0 / m_s), jnp.log(m_s)


def _col0(x, lane):
    """Extract lane 0 of a (B, S) row as (B, 1)."""
    return jnp.sum(jnp.where(lane == 0, x, 0.0), axis=1, keepdims=True)


def _dot(a, b, dt):
    return jnp.dot(a, b, preferred_element_type=dt, precision=_chain_precision())


def _lane_pad(blk, width, fill):
    """Pad the last axis of an in-VMEM block up to ``width`` with ``fill``."""
    cur = blk.shape[-1]
    if cur == width:
        return blk
    tail = jnp.full(blk.shape[:-1] + (width - cur,), fill, blk.dtype)
    return jnp.concatenate([blk, tail], axis=-1)


def _masked_block(ref, li, t0, width, kb):
    """Load a (kb, B, n_raw) block, lane-pad to ``width``, mask frames with
    t >= L_in[b] to -inf (replaces the XLA-side mask_emissions + pad)."""
    blk = _lane_pad(ref[:], width, NEG_INF)
    t_idx = t0 + jax.lax.broadcasted_iota(jnp.int32, (kb, 1, 1), 0)
    return jnp.where(li[None] > t_idx, blk, NEG_INF)


# ---------------------------------------------------------------------------
# forward kernel: the two beta chains, descending t; optional stores
# ---------------------------------------------------------------------------


def _fwd_kernel(
    li_ref, lo_ref, e_ref, self_ref, next_ref, ib_ref, aib_ref,
    # outputs (store variant): pb_ref, qb_ref, then sful/sfac
    *refs,
    kb, num_labels, store, wrap,
):
    if store:
        pb_ref, qb_ref, sful_ref, sfac_ref = refs[:4]
        scratch = refs[4:]
    else:
        sful_ref, sfac_ref = refs[:2]
        scratch = refs[2:]
    pb_c, qb_c, offb_c, eib_top, cib_top, aib_top = scratch

    k = pl.program_id(0)
    nb = pl.num_programs(0)
    li = li_ref[:]  # (B, 1) int32
    lo = lo_ref[:]
    e = e_ref[:]
    selft = self_ref[:]
    nextt = next_ref[:]
    dt = e.dtype
    n_pad = pb_c.shape[1]
    s_pad = qb_c.shape[1]

    @pl.when(k == 0)
    def _():
        # FCC beta is exp-domain (semiring zero = 0); FAC beta log-domain.
        pb_c[:] = jnp.zeros_like(pb_c)
        qb_c[:] = jnp.full_like(qb_c, NEG_INF)
        offb_c[:] = jnp.zeros_like(offb_c)
        eib_top[:] = jnp.zeros_like(eib_top)
        cib_top[:] = jnp.zeros_like(cib_top)
        aib_top[:] = jnp.full_like(aib_top, NEG_INF)

    lane_n = jax.lax.broadcasted_iota(jnp.int32, pb_c.shape, 1)
    seed_fcc = (lane_n < num_labels).astype(dt)  # beta seed: 1 on real labels
    lane_s = jax.lax.broadcasted_iota(jnp.int32, qb_c.shape, 1)
    # FAC beta seed: 0 at s = L_out-1, -inf elsewhere (log domain).
    seed_fac = jnp.where(lane_s == lo - 1, 0.0, NEG_INF).astype(dt)

    b_start = (nb - 1 - k) * kb
    # Block-wide prep (vectorized, off the serial chains): lane-pad, apply
    # the ragged time mask, and exponentiate the FCC emissions.
    ib_m = _masked_block(ib_ref, li, b_start, n_pad, kb)
    eib_blk, cib_blk = _exp_rows(ib_m)
    aib_raw = jnp.swapaxes(aib_ref[:], 0, 1)  # (B, kb, S) -> rows of (B, S)
    aib_blk = _lane_pad(aib_raw, s_pad, NEG_INF)  # pre-masked by gather

    pb, qb = pb_c[:], qb_c[:]
    offb = offb_c[:]

    for j in range(kb):
        j_local = kb - 1 - j
        t_b = b_start + j_local
        seed_b = li - 1 == t_b  # (B, 1)

        # ---- FCC beta at t_b (exp domain); consumes emission at t_b + 1
        if j == 0:
            eib_n, cb_n = eib_top[:], cib_top[:]
            ai_n = aib_top[:]
        else:
            eib_n, cb_n = eib_blk[j_local + 1], cib_blk[j_local + 1]
            ai_n = aib_blk[j_local + 1]
        sb, logmb = _rescale(_dot(pb * eib_n, e, dt))
        pb = jnp.where(seed_b, seed_fcc, sb)
        offb = jnp.where(seed_b, 0.0, offb + cb_n + logmb)

        # ---- FAC beta at t_b (log domain); consumes aligned I~[t_b + 1]
        x = qb + ai_n
        # wrap: nextt's last pad lane is NEG_INF (set in _prepare), so the
        # plain rotation is bit-identical and skips the boundary select
        rolled = _wrap_left(x) if wrap else _rot_left(x, NEG_INF)
        rawb = jnp.logaddexp(selft + x, nextt + rolled)
        qb = jnp.where(seed_b, seed_fac, rawb)

        if store:
            # residuals stream at RAW width (blocks are (kb, B, n_raw));
            # the dropped lanes are exact semiring zeros by construction
            pb_ref[j_local] = pb[:, : pb_ref.shape[2]]
            qb_ref[j_local] = qb[:, : qb_ref.shape[2]]

    pb_c[:], qb_c[:] = pb, qb
    offb_c[:] = offb
    eib_top[:], cib_top[:] = eib_blk[0], cib_blk[0]
    aib_top[:] = aib_blk[0]

    @pl.when(k == nb - 1)
    def _():
        # Beta chains have reached t = 0.
        # full score  = lse_i(beta_0 + I_0)          (fully_connected:89)
        # fac score   = beta_fac[0,:,0] + I~[0,:,0]  (force_aligned:316)
        # The FCC per-step exp(-c) scaling is repaid outside: +(L_in-1)*c.
        tot = jnp.sum(pb * eib_blk[0], axis=1, keepdims=True)
        sful_ref[:] = jnp.log(tot) + cib_blk[0] + offb
        sfac_ref[:] = _col0(qb, lane_s) + _col0(aib_blk[0], lane_s)


# ---------------------------------------------------------------------------
# backward kernel: recompute alphas ascending, emit all grads in one pass
# ---------------------------------------------------------------------------


def _bwd_kernel(
    li_ref, gful_ref, gfac_ref, e_ref, e_t_ref, self_ref, next_ref,
    ia_ref, aia_ref, pb_ref, qb_ref,
    gi_ref, gali_ref, gt_ref, gself_ref, gnext_ref,
    pa_c, qa_c, acc_t, acc_self, acc_diag,
    *, kb, num_labels, wrap,
):
    k = pl.program_id(0)
    nb = pl.num_programs(0)
    li = li_ref[:]
    e = e_ref[:]
    e_t = e_t_ref[:]
    selft = self_ref[:]
    nextt = next_ref[:]
    dt = e.dtype
    n_pad = pa_c.shape[1]
    s_pad = qa_c.shape[1]

    @pl.when(k == 0)
    def _():
        pa_c[:] = jnp.zeros_like(pa_c)  # alpha_{-1} = semiring zero
        qa_c[:] = jnp.full_like(qa_c, NEG_INF)
        acc_t[:] = jnp.zeros_like(acc_t)
        acc_self[:] = jnp.zeros_like(acc_self)
        acc_diag[:] = jnp.zeros_like(acc_diag)

    lane_s = jax.lax.broadcasted_iota(jnp.int32, qa_c.shape, 1)
    t0 = k * kb
    ia_m = _masked_block(ia_ref, li, t0, n_pad, kb)
    eia_blk, _ = _exp_rows(ia_m)
    aia_raw = jnp.swapaxes(aia_ref[:], 0, 1)  # (B, kb, S) -> rows of (B, S)
    aia_blk = _lane_pad(aia_raw, s_pad, NEG_INF)
    # residuals were stored at raw width; re-pad with exact semiring zeros
    pb_blk = _lane_pad(pb_ref[:], n_pad, 0.0)
    qb_blk = _lane_pad(qb_ref[:], s_pad, NEG_INF)

    # ---- serial part: recompute both alpha chains for this block.
    # Rows stay SSA values (no VMEM scratch round-trip): the vectorized
    # grad work below then has no false memory dependence on the chains,
    # so the VLIW scheduler can fill the chains' MXU/latency gaps with it.
    pa, qa = pa_c[:], qa_c[:]
    pa_prev_rows = []
    qa_prev_rows = []
    pa_rows = []
    qa_rows = []
    for j in range(kb):
        pa_prev_rows.append(pa)
        qa_prev_rows.append(qa)
        # FCC alpha (exp domain): alpha_t = I_t + lse_j(T + alpha_{t-1})
        s = _dot(pa, e_t, dt)
        if j == 0:
            s = jnp.where(k == 0, jnp.ones_like(s), s)  # alpha_0 = I_0
        pa, _ = _rescale(s * eia_blk[j])
        pa_rows.append(pa)
        # FAC alpha (log domain); t = 0 seeds at s = 0 only
        # (force_aligned_lattice.cpp:294).  wrap: lane 0 wraps in
        # qa[-1] + nextt[-1] = -inf (nextt's last pad lane is NEG_INF).
        y = qa + nextt
        sq = jnp.logaddexp(
            qa + selft, _wrap_right(y) if wrap else _rot_right(y, NEG_INF)
        )
        raw = aia_blk[j] + sq
        if j == 0:
            raw = jnp.where(
                k == 0, jnp.where(lane_s == 0, aia_blk[j], NEG_INF), raw
            )
        qa = raw
        qa_rows.append(qa)
    pa_c[:], qa_c[:] = pa, qa
    pa_prev = jnp.stack(pa_prev_rows)  # (K, B, N): alpha_{t-1} rows
    qa_prev = jnp.stack(qa_prev_rows)

    gful = gful_ref[:][None]  # (1, B, 1)
    gfac = gfac_ref[:][None]

    # ---- vectorized part: posteriors + transition grads for the block
    pa_blk = jnp.stack(pa_rows)  # (K, B, N) normalized exp-domain alpha
    # Posterior softmax in log space for fp32 robustness (the PA*PB
    # product may underflow even where the softmax is well defined).
    gam = jnp.log(pa_blk) + jnp.log(pb_blk)
    m = _safe_max_rows(gam)
    eg = jnp.exp(gam - m)
    den = jnp.sum(eg, axis=2, keepdims=True)
    gi = eg * (1.0 / jnp.where(den > 0, den, 1.0)) * gful
    gi_ref[:] = gi[:, :, : gi_ref.shape[2]]

    kb_, b_pad, _ = pa_blk.shape
    pa_prev_f = pa_prev.reshape(kb_ * b_pad, n_pad)
    # softmax_j(T[i,j] + alpha_{t-1,j}) = E^T[j,i] pa_prev[j] / S[i]:
    # recompute S with one MXU matmul instead of storing path_contrib.
    # S >= exp(T[i,argmax] - c) keeps the division fp32-safe.
    s_all = _dot(pa_prev_f, e_t, dt)
    u = gi.reshape(kb_ * b_pad, n_pad) * (
        1.0 / jnp.where(s_all > 0, s_all, 1.0)
    )
    acc_t[:] += jax.lax.dot_general(
        u, pa_prev_f, (((0,), (0,)), ((), ())), preferred_element_type=dt,
        precision=_chain_precision(),
    )

    qa_blk = jnp.stack(qa_rows)  # (K, B, S) log-domain alpha
    gamq = qa_blk + qb_blk
    mq = _safe_max_rows(gamq)
    eq = jnp.exp(gamq - mq)
    denq = jnp.sum(eq, axis=2, keepdims=True)
    gq = eq * (1.0 / jnp.where(denq > 0, denq, 1.0)) * gfac
    gali_ref[:] = gq[:, :, : gali_ref.shape[2]]

    # Edge fractions as direct exps of <= 0 exponents
    # (force_aligned_lattice.cpp:165-180 recomputed instead of stored):
    #   hori = exp(alpha_prev[s]   + self[s]   + I~ - alpha)
    #   diag = exp(alpha_prev[s-1] + next[s-1] + I~ - alpha)
    sub = jnp.where(jnp.isfinite(qa_blk), aia_blk - qa_blk, NEG_INF)
    hori = jnp.exp(qa_prev + selft[None] + sub)
    yp = qa_prev + nextt[None]
    diag = jnp.exp(
        (_wrap_right(yp) if wrap else _rot_right(yp, NEG_INF)) + sub
    )
    t_idx = t0 + jax.lax.broadcasted_iota(jnp.int32, (kb_, 1, 1), 0)
    w = (t_idx > 0).astype(dt)  # t = 0 carries no edge mass
    lane_s3 = jax.lax.broadcasted_iota(jnp.int32, qa_blk.shape, 2)
    # s = 0 has only the self-loop in-edge, factor 1
    # (force_aligned_lattice.cpp:175).
    edge_self = jnp.where(lane_s3 == 0, 1.0, hori)
    acc_self[:] += jnp.sum(gq * edge_self * w, axis=0)
    acc_diag[:] += jnp.sum(gq * diag * w, axis=0)

    @pl.when(k == nb - 1)
    def _():
        gt_ref[:] = acc_t[:] * e  # dT[i,j] = acc[i,j] exp(T[i,j] - c)
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


def _bts_asc(kb, b, x):
    return pl.BlockSpec((b, kb, x), lambda k: (0, k, 0), memory_space=pltpu.VMEM)


def _bts_desc(kb, b, x, nb):
    return pl.BlockSpec(
        (b, kb, x), lambda k: (0, nb - 1 - k, 0), memory_space=pltpu.VMEM
    )


def _run_fwd(li_col, lo_col, e, self_p, next_p, ip, ap, geom, store):
    num_labels, n_pad, s_pad = geom
    t_pad, b_pad, n_raw = ip.shape
    s_raw = ap.shape[2]
    kb = ASG_TIME_BLOCK
    nb = t_pad // kb
    dt = e.dtype
    kern = functools.partial(
        _fwd_kernel, kb=kb, num_labels=num_labels, store=store,
        wrap=s_pad > s_raw,
    )
    score_shape = jax.ShapeDtypeStruct((b_pad, 1), dt)
    out_specs = [_const((b_pad, 1)), _const((b_pad, 1))]
    out_shape = [score_shape, score_shape]
    if store:
        # residuals at raw width: 30/50-lane streams instead of 128
        out_specs = [
            _desc(kb, b_pad, n_raw, nb),
            _desc(kb, b_pad, s_raw, nb),
        ] + out_specs
        out_shape = [
            jax.ShapeDtypeStruct((t_pad, b_pad, n_raw), dt),
            jax.ShapeDtypeStruct((t_pad, b_pad, s_raw), dt),
        ] + out_shape
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            _const((b_pad, 1)),
            _const((b_pad, 1)),
            _const((n_pad, n_pad)),
            _const((b_pad, s_pad)),
            _const((b_pad, s_pad)),
            _desc(kb, b_pad, n_raw, nb),
            _bts_desc(kb, b_pad, s_raw, nb),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
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


def _run_bwd(
    li_col, gful_col, gfac_col, e, e_t, self_p, next_p, ip, ap, pb, qb,
    geom,
):
    # NOTE: target_lengths never enter the backward — everything the FAC
    # side needs is encoded in the stored qb residuals and the masked
    # aligned emissions.
    num_labels, n_pad, s_pad = geom
    t_pad, b_pad, n_raw = ip.shape
    s_raw = ap.shape[2]
    kb = ASG_TIME_BLOCK
    nb = t_pad // kb
    dt = e.dtype
    kern = functools.partial(
        _bwd_kernel, kb=kb, num_labels=num_labels, wrap=s_pad > s_raw
    )
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            _const((b_pad, 1)),
            _const((b_pad, 1)),
            _const((b_pad, 1)),
            _const((n_pad, n_pad)),
            _const((n_pad, n_pad)),
            _const((b_pad, s_pad)),
            _const((b_pad, s_pad)),
            _asc(kb, b_pad, n_raw),
            _bts_asc(kb, b_pad, s_raw),
            _asc(kb, b_pad, pb.shape[2]),
            _asc(kb, b_pad, qb.shape[2]),
        ],
        out_specs=[
            _asc(kb, b_pad, n_raw),
            _asc(kb, b_pad, s_raw),
            _const((n_pad, n_pad)),
            _const((b_pad, s_pad)),
            _const((b_pad, s_pad)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, b_pad, n_raw), dt),
            jax.ShapeDtypeStruct((t_pad, b_pad, s_raw), dt),
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
    )(li_col, gful_col, gfac_col, e, e_t, self_p, next_p, ip, ap, pb, qb)


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


def _prepare(transition, inputs, targets, input_lengths, target_lengths):
    """Gathers + geometry.  No emission-sized mask/pad copies happen here:
    the kernels lane-pad and length-mask in VMEM."""
    lat = make_aligned(transition, inputs, targets, input_lengths,
                       target_lengths, layout="bts")
    t_total, num_batches, num_labels = inputs.shape
    s_total = targets.shape[1]
    kb = ASG_TIME_BLOCK
    n_pad = round_up(max(num_labels, LANE), LANE)
    s_pad = round_up(max(s_total, LANE), LANE)
    b_pad = round_up(max(num_batches, SUBLANE), SUBLANE)
    t_pad = round_up(t_total, kb)

    # Emission streams stay at RAW lane width (the kernels lane-pad in
    # VMEM): the HBM streams carry N=num_labels / S=s_total lanes, not
    # 128 — measured cost of the in-VMEM pad is zero, traffic drops ~4x
    # at the benchmark shape.
    ip = pad_axis(pad_axis(inputs, b_pad, 1, NEG_INF), t_pad, 0, NEG_INF)
    # native (B, T, S) aligned stream, consumed as (B, kb, S) blocks
    ap = pad_axis(pad_axis(lat.inputs, b_pad, 0, NEG_INF), t_pad, 1, NEG_INF)
    # Any finite c works (it cancels against the (L_in-1)*c repayment);
    # the max keeps every exp argument <= 0.
    c = jnp.max(transition)
    c = jnp.where(jnp.isfinite(c), c, 0.0).astype(inputs.dtype)
    trans_p = pad_axis(pad_axis(transition, n_pad, 0, NEG_INF), n_pad, 1, NEG_INF)
    e = jnp.exp(trans_p - c)  # e[j, i] = exp(T[j,i] - c); beta contracts j
    e_t = e.T  # alpha contracts source labels
    self_p = pad_axis(pad_axis(lat.self_trans, s_pad, 1, 0.0), b_pad, 0, 0.0)
    next_p = pad_axis(pad_axis(lat.next_trans, s_pad, 1, 0.0), b_pad, 0, 0.0)
    if s_pad > s_total:
        # pin the LAST pad lane to the semiring zero so the kernels' FAC
        # rotations can use plain wrap-rolls (no boundary select): the
        # wrapped-in lane then lands as -inf exactly like the old fill.
        # Safe globally — every consumer adds next_p to an already--inf
        # pad lane or drops pad lanes before use.
        next_p = next_p.at[:, -1].set(NEG_INF)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_p(precision, transition, inputs, targets, input_lengths,
             target_lengths):
    with strict_chain_precision(precision):
        lat, ip, ap, e, e_t, self_p, next_p, li_col, lo_col, c, dims = (
            _prepare(transition, inputs, targets, input_lengths,
                     target_lengths)
        )
        num_batches, num_labels = dims[1], dims[2]
        geom = (num_labels, dims[5], dims[6])
        sful, sfac = _run_fwd(
            li_col, lo_col, e, self_p, next_p, ip, ap, geom, store=False
        )
        return _fix_scores(sful, sfac, input_lengths, c, num_batches)


def _fused_fwd(precision, transition, inputs, targets, input_lengths,
               target_lengths):
    with strict_chain_precision(precision):
        lat, ip, ap, e, e_t, self_p, next_p, li_col, lo_col, c, dims = (
            _prepare(transition, inputs, targets, input_lengths,
                     target_lengths)
        )
        num_batches, num_labels = dims[1], dims[2]
        geom = (num_labels, dims[5], dims[6])
        pb, qb, sful, sfac = _run_fwd(
            li_col, lo_col, e, self_p, next_p, ip, ap, geom, store=True
        )
        scores = _fix_scores(sful, sfac, input_lengths, c, num_batches)
    res = (lat, ip, ap, e, e_t, self_p, next_p, li_col, pb, qb, dims)
    return scores, res


def _fused_bwd(precision, res, g):
    # custom_vjp traces this rule during the backward pass, typically
    # after the caller's strict_chain_precision context has exited; the
    # captured static precision re-enters it so the bwd kernel's chain
    # matmuls run at the precision the loss was traced at.
    with strict_chain_precision(precision):
        return _fused_bwd_body(res, g)


def _fused_bwd_body(res, g):
    gful, gfac = g
    lat, ip, ap, e, e_t, self_p, next_p, li_col, pb, qb, dims = res
    t_total, num_batches, num_labels, s_total, b_pad, n_pad, s_pad = dims
    geom = (num_labels, n_pad, s_pad)
    gful_col = pad_axis(gful.astype(ip.dtype), b_pad, 0, 0.0)[:, None]
    gfac_col = pad_axis(gfac.astype(ip.dtype), b_pad, 0, 0.0)[:, None]
    gi, gali, gt, gself, gnext = _run_bwd(
        li_col, gful_col, gfac_col, e, e_t, self_p, next_p, ip, ap,
        pb, qb, geom,
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


_fused_p.defvjp(_fused_fwd, _fused_bwd)


def asg_scores_fused(
    transition: jnp.ndarray,
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    input_lengths: jnp.ndarray,
    target_lengths: jnp.ndarray,
):
    """(full_scores, aligned_scores), each (B,) — one fused TPU kernel.

    The primal runs the beta walk without stores (forward-only scoring,
    mirroring ``streamlined_fast_gpu.cpp:24-94``).  The ambient chain
    precision is captured here at forward-trace time and baked into the
    custom_vjp as a static argument, so ``asg_loss(precision=...)``
    reaches the backward kernel even though JAX traces it after the
    context has exited.
    """
    return _fused_p(_chain_precision(), transition, inputs, targets,
                    input_lengths, target_lengths)
