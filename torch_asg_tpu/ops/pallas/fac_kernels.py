"""Fused Pallas TPU kernels for the force-aligned (numerator) lattice.

The aligned lattice is only (B, S) wide with 2 in-edges per state
(self-loop / advance), so each step is pure VPU work: two shifted adds and
an elementwise logaddexp.  The win over the lax.scan reference path is
fusing all T steps into one kernel launch with the running row in VMEM —
the per-step dispatch overhead dominates at this size.

Behavior parity: zh217/torch-asg ``force_aligned_lattice.cpp`` (alpha
:84-111, beta :113-154, derivative :156-183).  The reference's cumsum
vectorizations of the s=0 row / last beta row are special cases of the
2-way step with one edge at -inf, which is what the fused kernel computes.
Gathers (C10a/b) happen outside in XLA (take_along_axis); scatters (C10c/d)
reuse ops.fac.scatter_to_full.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import LANE, NEG_INF, SUBLANE, pad_axis, round_up, use_interpret
from ..fac import make_aligned, scatter_to_full


def _shift_right(x, fill):
    """Lane s takes lane s-1; lane 0 takes ``fill``."""
    y = jnp.concatenate([x[:, -1:], x[:, :-1]], axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col == 0, fill, y)


def _shift_left(x, fill):
    """Lane s takes lane s+1; the last lane takes ``fill``."""
    y = jnp.concatenate([x[:, 1:], x[:, :1]], axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col == x.shape[1] - 1, fill, y)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _fac_alpha_kernel(self_ref, next_ref, ali_ref, alpha_ref, carry_ref):
    t = pl.program_id(0)
    i_t = ali_ref[0]  # (B, Sp), pre-masked to -inf outside the valid region

    @pl.when(t == 0)
    def _():
        col = jax.lax.broadcasted_iota(jnp.int32, i_t.shape, 1)
        a0 = jnp.where(col == 0, i_t, NEG_INF)
        alpha_ref[0] = a0
        carry_ref[:] = a0

    @pl.when(t > 0)
    def _():
        a_prev = carry_ref[:]
        hori = a_prev + self_ref[:]
        diag = _shift_right(a_prev + next_ref[:], NEG_INF)
        a = i_t + jnp.logaddexp(hori, diag)
        alpha_ref[0] = a
        carry_ref[:] = a


def _fac_beta_kernel(li_ref, lo_ref, self_ref, next_ref, ali_ref, beta_ref, carry_ref):
    k = pl.program_id(0)
    t_total = pl.num_programs(0)
    t = t_total - 1 - k
    col = jax.lax.broadcasted_iota(jnp.int32, carry_ref.shape, 1)
    seed_row = jnp.where(col == lo_ref[:] - 1, 0.0, NEG_INF).astype(carry_ref.dtype)
    at_end = li_ref[:] - 1 == t  # (B, 1)

    @pl.when(k == 0)
    def _():
        b = jnp.where(at_end, seed_row, NEG_INF)
        beta_ref[0] = b
        carry_ref[:] = b

    @pl.when(k > 0)
    def _():
        x = ali_ref[0] + carry_ref[:]  # aligned I[t+1] + beta[t+1]
        hori = self_ref[:] + x
        diag = next_ref[:] + _shift_left(x, NEG_INF)
        raw = jnp.logaddexp(hori, diag)
        b = jnp.where(at_end, seed_row, raw)
        beta_ref[0] = b
        carry_ref[:] = b


def _fac_bwd_kernel(
    g_ref, self_ref, next_ref, ali_ref, alpha_ref, alpha_prev_ref, beta_ref,
    gi_ref, gself_ref, gnext_ref, acc_self, acc_diag,
):
    """Posterior grads + accumulated aligned-transition grads in one pass."""
    t = pl.program_id(0)
    t_total = pl.num_programs(0)
    a_cur = alpha_ref[0]
    gamma = a_cur + beta_ref[0]
    m = jnp.max(gamma, axis=1, keepdims=True)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.exp(gamma - m_safe)
    denom = jnp.sum(e, axis=1, keepdims=True)
    gi = e / jnp.where(denom == 0.0, 1.0, denom) * g_ref[:]
    gi_ref[0] = gi

    @pl.when(t == 0)
    def _():
        acc_self[:] = jnp.zeros_like(acc_self)
        acc_diag[:] = jnp.zeros_like(acc_diag)

    @pl.when(t > 0)
    def _():
        a_prev = alpha_prev_ref[0]
        sub = jnp.where(jnp.isfinite(a_cur), ali_ref[0] - a_cur, NEG_INF)
        hori = jnp.exp(a_prev + self_ref[:] + sub)
        diag = jnp.exp(_shift_right(a_prev + next_ref[:], NEG_INF) + sub)
        col = jax.lax.broadcasted_iota(jnp.int32, gi.shape, 1)
        edge_self = jnp.where(col == 0, 1.0, hori)
        acc_self[:] += gi * edge_self
        acc_diag[:] += gi * diag

    @pl.when(t == t_total - 1)
    def _():
        gself_ref[:] = acc_self[:]
        gnext_ref[:] = _shift_left(acc_diag[:], 0.0)


# ---------------------------------------------------------------------------
# pallas_call wiring
# ---------------------------------------------------------------------------


def _const2(shape):
    return pl.BlockSpec(shape, lambda k: (0, 0), memory_space=pltpu.VMEM)


def _stream3(b_pad, s_pad, index):
    return pl.BlockSpec((1, b_pad, s_pad), index, memory_space=pltpu.VMEM)


def _fac_alpha_pass(self_t, next_t, ali_p):
    t_total, b_pad, s_pad = ali_p.shape
    return pl.pallas_call(
        _fac_alpha_kernel,
        grid=(t_total,),
        in_specs=[
            _const2((b_pad, s_pad)),
            _const2((b_pad, s_pad)),
            _stream3(b_pad, s_pad, lambda k: (k, 0, 0)),
        ],
        out_specs=_stream3(b_pad, s_pad, lambda k: (k, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(ali_p.shape, ali_p.dtype),
        scratch_shapes=[pltpu.VMEM((b_pad, s_pad), ali_p.dtype)],
        interpret=use_interpret(),
    )(self_t, next_t, ali_p)


def _fac_beta_pass(li_col, lo_col, self_t, next_t, ali_p):
    t_total, b_pad, s_pad = ali_p.shape
    return pl.pallas_call(
        _fac_beta_kernel,
        grid=(t_total,),
        in_specs=[
            pl.BlockSpec((b_pad, 1), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, 1), lambda k: (0, 0), memory_space=pltpu.VMEM),
            _const2((b_pad, s_pad)),
            _const2((b_pad, s_pad)),
            # step k (t = T-1-k) consumes aligned I[t+1]; k=0 unused.
            _stream3(
                b_pad, s_pad, lambda k: (jnp.minimum(t_total - k, t_total - 1), 0, 0)
            ),
        ],
        out_specs=_stream3(b_pad, s_pad, lambda k: (t_total - 1 - k, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(ali_p.shape, ali_p.dtype),
        scratch_shapes=[pltpu.VMEM((b_pad, s_pad), ali_p.dtype)],
        interpret=use_interpret(),
    )(li_col, lo_col, self_t, next_t, ali_p)


def _fac_bwd_pass(g_col, self_t, next_t, ali_p, alpha, beta):
    t_total, b_pad, s_pad = ali_p.shape
    return pl.pallas_call(
        _fac_bwd_kernel,
        grid=(t_total,),
        in_specs=[
            pl.BlockSpec((b_pad, 1), lambda k: (0, 0), memory_space=pltpu.VMEM),
            _const2((b_pad, s_pad)),
            _const2((b_pad, s_pad)),
            _stream3(b_pad, s_pad, lambda k: (k, 0, 0)),
            _stream3(b_pad, s_pad, lambda k: (k, 0, 0)),
            _stream3(b_pad, s_pad, lambda k: (jnp.maximum(k - 1, 0), 0, 0)),
            _stream3(b_pad, s_pad, lambda k: (k, 0, 0)),
        ],
        out_specs=[
            _stream3(b_pad, s_pad, lambda k: (k, 0, 0)),
            _const2((b_pad, s_pad)),
            _const2((b_pad, s_pad)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(ali_p.shape, ali_p.dtype),
            jax.ShapeDtypeStruct((b_pad, s_pad), ali_p.dtype),
            jax.ShapeDtypeStruct((b_pad, s_pad), ali_p.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((b_pad, s_pad), ali_p.dtype),
            pltpu.VMEM((b_pad, s_pad), ali_p.dtype),
        ],
        interpret=use_interpret(),
    )(g_col, self_t, next_t, ali_p, alpha, alpha, beta)


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


def _prepare(transition, inputs, targets, input_lengths, target_lengths):
    lat = make_aligned(transition, inputs, targets, input_lengths, target_lengths)
    t_total, num_batches, s_total = lat.inputs.shape
    s_pad = round_up(max(s_total, LANE), LANE)
    b_pad = round_up(max(num_batches, SUBLANE), SUBLANE)
    ali_p = pad_axis(pad_axis(lat.inputs, s_pad, 2, NEG_INF), b_pad, 1, NEG_INF)
    self_t = pad_axis(pad_axis(lat.self_trans, s_pad, 1, 0.0), b_pad, 0, 0.0)
    next_t = pad_axis(pad_axis(lat.next_trans, s_pad, 1, 0.0), b_pad, 0, 0.0)
    li_col = pad_axis(input_lengths.astype(jnp.int32), b_pad, 0, 1)[:, None]
    lo_col = pad_axis(target_lengths.astype(jnp.int32), b_pad, 0, 1)[:, None]
    dims = (t_total, num_batches, s_total, b_pad, s_pad)
    return lat, ali_p, self_t, next_t, li_col, lo_col, dims


@jax.custom_vjp
def fac_score_pallas(
    transition: jnp.ndarray,
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    input_lengths: jnp.ndarray,
    target_lengths: jnp.ndarray,
) -> jnp.ndarray:
    """Pallas-fused numerator scores; same contract as ops.fac.fac_score."""
    lat, ali_p, self_t, next_t, li_col, lo_col, dims = _prepare(
        transition, inputs, targets, input_lengths, target_lengths
    )
    num_batches = dims[1]
    beta = _fac_beta_pass(li_col, lo_col, self_t, next_t, ali_p)
    return (beta[0, :, 0] + ali_p[0, :, 0])[:num_batches]


def _fac_pallas_fwd(transition, inputs, targets, input_lengths, target_lengths):
    lat, ali_p, self_t, next_t, li_col, lo_col, dims = _prepare(
        transition, inputs, targets, input_lengths, target_lengths
    )
    num_batches = dims[1]
    alpha = _fac_alpha_pass(self_t, next_t, ali_p)
    beta = _fac_beta_pass(li_col, lo_col, self_t, next_t, ali_p)
    score = (beta[0, :, 0] + ali_p[0, :, 0])[:num_batches]
    num_labels = inputs.shape[2]
    res = (lat, ali_p, self_t, next_t, alpha, beta, dims, num_labels)
    return score, res


def _fac_pallas_bwd(res, g):
    lat, ali_p, self_t, next_t, alpha, beta, dims, num_labels = res
    t_total, num_batches, s_total, b_pad, s_pad = dims
    g_col = pad_axis(g.astype(ali_p.dtype), b_pad, 0, 0.0)[:, None]
    gi, g_self, g_next = _fac_bwd_pass(g_col, self_t, next_t, ali_p, alpha, beta)
    grad_transition, grad_inputs = scatter_to_full(
        lat,
        gi[:, :num_batches, :s_total],
        g_self[:num_batches, :s_total],
        g_next[:num_batches, :s_total],
        num_labels,
    )
    return grad_transition, grad_inputs, None, None, None


fac_score_pallas.defvjp(_fac_pallas_fwd, _fac_pallas_bwd)
