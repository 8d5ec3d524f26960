"""Fused Pallas TPU kernels for the fully-connected (denominator) lattice.

Replaces the reference's per-step ATen dispatch loop
(zh217/torch-asg ``fully_connected_lattice.cpp:22-28,44-46``) and its
4-CUDA-stream orchestration (``streamlined_fast_gpu.cpp``) with single
pallas_call invocations that run the entire T-recursion on-chip.

Performance structure (see docs/DESIGN.md):
  * The logsumexp-over-transitions step is an MXU matmul: with
    E = exp(T - c), c = max(T), and running max m_b,
      alpha[t,b,i] = I[t,b,i] + c + m_b
                     + log(sum_j exp(alpha[t-1,b,j] - m_b) * E[i,j]).
  * K time steps are processed per sequential grid iteration with an
    inner fori_loop — one grid step per lattice step is latency-bound on
    grid overhead (~10 us/step), K-blocking amortizes it.
  * The forward kernel computes alpha (walking t upward) AND beta
    (walking t downward, with its per-batch length re-seeding) in the
    same inner loop: two independent dependency chains interleaved for
    ILP — the reference needs two CUDA streams for the same effect.
  * The backward accumulates
      dT[i,j] = exp(T[i,j]-c) * sum_{t,b} U[t,b,i] V[t,b,j],
      U = gI * exp(I - alpha + m_tb + c),  V = exp(alpha[t-1] - m_tb)
    as a per-step (N,B)x(B,N) MXU matmul into a VMEM accumulator, so the
    reference's O(T*B*N^2) path_contrib (``fully_connected_lattice.cpp:77``)
    never exists.  U's exponent is bounded by max(T)-min(T); fp32 is safe
    for any sane transition matrix.

Numerical conventions: -inf is the semiring zero; exp(-inf)=0 and
log(0)=-inf keep padded lanes inert; running maxes are clamped finite
before subtraction; carries are initialized so that no branch ever
computes on uninitialized memory (no NaN can form).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import LANE, NEG_INF, SUBLANE, pad_axis, round_up, use_interpret
from ..semiring import logsumexp as lse_ref

TIME_BLOCK = 16  # lattice steps per grid iteration


def _lse_step(x, e_mat, c):
    """m-normalized exp-matmul logsumexp: lse_j(row_j + log E[j, i]) + c."""
    m = jnp.max(x, axis=1, keepdims=True)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(x - m_safe)
    s = jnp.dot(
        p, e_mat, preferred_element_type=x.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    return m_safe + jnp.log(s) + c


# ---------------------------------------------------------------------------
# fused forward kernel: alpha (ascending t) + beta (descending t) per block
# ---------------------------------------------------------------------------


def _fwd_kernel(
    c_ref, len_ref, e_t_ref, e_ref, ia_ref, ib_ref,
    alpha_ref, beta_ref,
    a_carry, b_carry, ib_top,
):
    k = pl.program_id(0)
    nb = pl.num_programs(0)
    kb = TIME_BLOCK
    t_total = nb * kb
    lens = len_ref[:]  # (B, 1)
    c = c_ref[0, 0]

    @pl.when(k == 0)
    def _():
        # alpha carry: overwritten at t=0 by the jnp.where select below —
        # zeros keep the not-taken recursion branch finite (no NaN).
        a_carry[:] = jnp.zeros_like(a_carry)
        b_carry[:] = jnp.zeros_like(b_carry)
        # "I[t+1]" feeding the t = T-1 beta step: the semiring zero, so
        # the recursion branch yields -inf and the seed select wins.
        ib_top[:] = jnp.full_like(ib_top, NEG_INF)

    i_top = ib_top[:]
    b_start = (nb - 1 - k) * kb  # time offset of this beta output block

    def body(j, carries):
        a_prev, b_next = carries

        # ---- alpha step at t_a = k*kb + j (ascending)
        t_a = k * kb + j
        i_ta = jnp.where(lens > t_a, ia_ref[j], NEG_INF)
        a_rec = i_ta + _lse_step(a_prev, e_t_ref[:], c)
        a = jnp.where(t_a == 0, i_ta, a_rec)
        alpha_ref[j] = a

        # ---- beta step at t_b = b_start + (kb-1-j) (descending)
        j_local = kb - 1 - j
        t_b = b_start + j_local
        i_next = jnp.where(
            j_local == kb - 1, i_top, ib_ref[jnp.minimum(j_local + 1, kb - 1)]
        )
        i_next = jnp.where(lens > t_b + 1, i_next, NEG_INF)
        raw = _lse_step(i_next + b_next, e_ref[:], c)
        b = jnp.where(lens - 1 == t_b, jnp.zeros_like(raw), raw)
        beta_ref[j_local] = b

        return (a, b)

    a_fin, b_fin = lax.fori_loop(
        0, kb, body, (a_carry[:], b_carry[:])
    )
    a_carry[:] = a_fin
    b_carry[:] = b_fin
    ib_top[:] = ib_ref[0]


def _run_fwd(c_scalar, lengths_col, e, e_t, inputs_p):
    t_total, b_pad, n_pad = inputs_p.shape
    kb = TIME_BLOCK
    nb = t_total // kb
    blk = (kb, b_pad, n_pad)
    alpha, beta = pl.pallas_call(
        _fwd_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda k: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((b_pad, 1), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, n_pad), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, n_pad), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda k: (k, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                blk, lambda k: (nb - 1 - k, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(blk, lambda k: (k, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                blk, lambda k: (nb - 1 - k, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(inputs_p.shape, inputs_p.dtype),
            jax.ShapeDtypeStruct(inputs_p.shape, inputs_p.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((b_pad, n_pad), inputs_p.dtype),
            pltpu.VMEM((b_pad, n_pad), inputs_p.dtype),
            pltpu.VMEM((b_pad, n_pad), inputs_p.dtype),
        ],
        interpret=use_interpret(),
    )(c_scalar, lengths_col, e_t, e, inputs_p, inputs_p)
    return alpha, beta


# ---------------------------------------------------------------------------
# beta-only kernel (forward-only scoring path)
# ---------------------------------------------------------------------------


def _beta_kernel(c_ref, len_ref, e_ref, ib_ref, beta_ref, b_carry, ib_top):
    k = pl.program_id(0)
    nb = pl.num_programs(0)
    kb = TIME_BLOCK
    lens = len_ref[:]
    c = c_ref[0, 0]

    @pl.when(k == 0)
    def _():
        b_carry[:] = jnp.zeros_like(b_carry)
        ib_top[:] = jnp.full_like(ib_top, NEG_INF)

    i_top = ib_top[:]
    b_start = (nb - 1 - k) * kb

    def body(j, b_next):
        j_local = kb - 1 - j
        t_b = b_start + j_local
        i_next = jnp.where(
            j_local == kb - 1, i_top, ib_ref[jnp.minimum(j_local + 1, kb - 1)]
        )
        i_next = jnp.where(lens > t_b + 1, i_next, NEG_INF)
        raw = _lse_step(i_next + b_next, e_ref[:], c)
        b = jnp.where(lens - 1 == t_b, jnp.zeros_like(raw), raw)
        beta_ref[j_local] = b
        return b

    b_fin = lax.fori_loop(0, kb, body, b_carry[:])
    b_carry[:] = b_fin
    ib_top[:] = ib_ref[0]


def _run_beta(c_scalar, lengths_col, e, inputs_p):
    t_total, b_pad, n_pad = inputs_p.shape
    kb = TIME_BLOCK
    nb = t_total // kb
    blk = (kb, b_pad, n_pad)
    rev = lambda k: (nb - 1 - k, 0, 0)  # noqa: E731
    return pl.pallas_call(
        _beta_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda k: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((b_pad, 1), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, n_pad), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, rev, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(blk, rev, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(inputs_p.shape, inputs_p.dtype),
        scratch_shapes=[
            pltpu.VMEM((b_pad, n_pad), inputs_p.dtype),
            pltpu.VMEM((b_pad, n_pad), inputs_p.dtype),
        ],
        interpret=use_interpret(),
    )(c_scalar, lengths_col, e, inputs_p)


# ---------------------------------------------------------------------------
# backward kernel: fused dI (posterior) + dT (per-step MXU accumulation)
# ---------------------------------------------------------------------------


def _bwd_kernel(
    c_ref, len_ref, g_ref, e_t_ref, i_ref, alpha_ref, beta_ref,
    gi_ref, gt_ref,
    acc_ref, a_save,
):
    k = pl.program_id(0)
    nb = pl.num_programs(0)
    kb = TIME_BLOCK
    lens = len_ref[:]
    g = g_ref[:]
    c = c_ref[0, 0]

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        # alpha[-1] := semiring zero: V = exp(-inf) = 0 kills the t = 0
        # accumulation term with no branch.
        a_save[:] = jnp.full_like(a_save, NEG_INF)

    def body(j, a_prev):
        a_cur = alpha_ref[j]
        gamma = a_cur + beta_ref[j]
        m = jnp.max(gamma, axis=1, keepdims=True)
        m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
        e = jnp.exp(gamma - m_safe)
        denom = jnp.sum(e, axis=1, keepdims=True)
        gi = e / jnp.where(denom == 0.0, 1.0, denom) * g
        gi_ref[j] = gi

        t = k * kb + j
        i_t = jnp.where(lens > t, i_ref[j], NEG_INF)
        mp = jnp.max(a_prev, axis=1, keepdims=True)
        mp_safe = jnp.where(jnp.isfinite(mp), mp, 0.0)
        v = jnp.exp(a_prev - mp_safe)  # zeros when a_prev is all -inf
        u_expo = jnp.where(jnp.isfinite(a_cur), i_t - a_cur, NEG_INF)
        u = gi * jnp.exp(u_expo + mp_safe + c)
        acc_ref[:] += jnp.dot(
            u.T, v, preferred_element_type=u.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        return a_cur

    # a_prev for j=0 is the previous block's last alpha row (a_save).
    a_fin = lax.fori_loop(0, kb, body, a_save[:])
    a_save[:] = a_fin

    @pl.when(k == nb - 1)
    def _():
        # dT[i,j] = acc[i,j] * exp(T[i,j]-c); e_t holds exp(T-c) transposed.
        gt_ref[:] = acc_ref[:] * e_t_ref[:].T


def _run_bwd(c_scalar, lengths_col, g_col, e_t, inputs_p, alpha, beta):
    t_total, b_pad, n_pad = inputs_p.shape
    kb = TIME_BLOCK
    nb = t_total // kb
    blk = (kb, b_pad, n_pad)
    fwd_idx = lambda k: (k, 0, 0)  # noqa: E731
    gi, gt = pl.pallas_call(
        _bwd_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda k: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((b_pad, 1), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, 1), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, n_pad), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, fwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, fwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, fwd_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(blk, fwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, n_pad), lambda k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(inputs_p.shape, inputs_p.dtype),
            jax.ShapeDtypeStruct((n_pad, n_pad), inputs_p.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_pad, n_pad), inputs_p.dtype),
            pltpu.VMEM((b_pad, n_pad), inputs_p.dtype),
        ],
        interpret=use_interpret(),
    )(c_scalar, lengths_col, g_col, e_t, inputs_p, alpha, beta)
    return gi, gt


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


def _prepare(transition, inputs, input_lengths):
    t_total, num_batches, num_labels = inputs.shape
    n_pad = round_up(max(num_labels, LANE), LANE)
    b_pad = round_up(max(num_batches, SUBLANE), SUBLANE)
    t_pad = round_up(t_total, TIME_BLOCK)
    inputs_p = pad_axis(
        pad_axis(pad_axis(inputs, n_pad, 2, NEG_INF), b_pad, 1, NEG_INF),
        t_pad, 0, NEG_INF,
    )
    trans_p = pad_axis(pad_axis(transition, n_pad, 0, NEG_INF), n_pad, 1, NEG_INF)
    # padded batches get length 1 so their lattice stays trivially -inf
    lengths = pad_axis(input_lengths.astype(jnp.int32), b_pad, 0, 1)
    lengths_col = lengths[:, None]
    c = jnp.max(transition).astype(inputs_p.dtype)
    c_scalar = c[None, None]
    e = jnp.exp(trans_p - c)  # E[j, i] = exp(T[j,i] - c); beta contracts j
    e_t = e.T  # alpha: p @ E^T sums over source labels j
    dims = (t_total, num_batches, num_labels, b_pad, n_pad)
    return inputs_p, lengths_col, c_scalar, e, e_t, dims


@jax.custom_vjp
def fcc_score_pallas(
    transition: jnp.ndarray, inputs: jnp.ndarray, input_lengths: jnp.ndarray
) -> jnp.ndarray:
    """Pallas-fused denominator scores; same contract as ops.fcc.fcc_score.

    Primal = beta recursion only (forward-only scoring, mirroring
    ``streamlined_fast_gpu.cpp:24-94``); grads come from the fused
    backward kernel under custom_vjp.
    """
    inputs_p, lengths_col, c_scalar, e, e_t, dims = _prepare(
        transition, inputs, input_lengths
    )
    num_batches = dims[1]
    beta = _run_beta(c_scalar, lengths_col, e, inputs_p)
    score = lse_ref(beta[0] + inputs_p[0], axis=1)
    return score[:num_batches]


def _fcc_pallas_fwd(transition, inputs, input_lengths):
    inputs_p, lengths_col, c_scalar, e, e_t, dims = _prepare(
        transition, inputs, input_lengths
    )
    num_batches = dims[1]
    alpha, beta = _run_fwd(c_scalar, lengths_col, e, e_t, inputs_p)
    score = lse_ref(beta[0] + inputs_p[0], axis=1)
    res = (inputs_p, lengths_col, c_scalar, e_t, alpha, beta, dims)
    return score[:num_batches], res


def _fcc_pallas_bwd(res, g):
    inputs_p, lengths_col, c_scalar, e_t, alpha, beta, dims = res
    t_total, num_batches, num_labels, b_pad, n_pad = dims
    g_col = pad_axis(g.astype(inputs_p.dtype), b_pad, 0, 0.0)[:, None]
    gi, gt = _run_bwd(c_scalar, lengths_col, g_col, e_t, inputs_p, alpha, beta)
    grad_inputs = gi[:t_total, :num_batches, :num_labels]
    grad_transition = gt[:num_labels, :num_labels]
    return grad_transition, grad_inputs, None


fcc_score_pallas.defvjp(_fcc_pallas_fwd, _fcc_pallas_bwd)
