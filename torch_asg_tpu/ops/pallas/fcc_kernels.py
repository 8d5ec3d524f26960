"""Fused Pallas TPU kernels for the fully-connected (denominator) lattice.

Replaces the reference's per-step ATen dispatch loop
(zh217/torch-asg ``fully_connected_lattice.cpp:22-28,44-46``) and its
4-CUDA-stream orchestration (``streamlined_fast_gpu.cpp``) with single
pallas_call invocations that run the entire T-recursion on-chip, the
running lattice row living in VMEM scratch across sequential grid steps.

The hot step is reformulated for the MXU.  With E = exp(T - c), c = max(T),
and a per-batch running max m_b = max_j alpha[t-1, b, j]:

    alpha[t, b, i] = I[t, b, i] + c + m_b
                     + log( sum_j exp(alpha[t-1, b, j] - m_b) * E[i, j] )

i.e. one (B, N) x (N, N) matmul on the MXU plus O(B*N) exp/log on the VPU
per step — instead of the O(B*N^2) exp+reduce a direct logsumexp needs.
The beta recursion is identical with E^T.  The backward accumulates

    dT[i, j] = exp(T[i,j] - c) * sum_{t,b} U[t,b,i] * V[t,b,j]
    U[t,b,i] = gI[t,b,i] * exp(I[t,b,i] - alpha[t,b,i] + m_tb + c)
    V[t,b,j] = exp(alpha[t-1,b,j] - m_tb)

— a (N, B) x (B, N) MXU matmul per step into an (N, N) VMEM accumulator,
so the reference's O(T*B*N^2) path_contrib tensor
(``fully_connected_lattice.cpp:77``) never exists.  U's exponent is
bounded by the transition spread max(T)-min(T) (see docs/DESIGN.md), so
fp32 is safe for any sane transition matrix.

Numerical conventions: -inf is the semiring zero; exp(-inf)=0 and
log(0)=-inf keep padded lanes inert; running maxes are clamped finite
before subtraction so no NaNs form.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import LANE, NEG_INF, SUBLANE, pad_axis, round_up, use_interpret
from ..semiring import logsumexp as lse_ref

# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------


def _alpha_kernel(c_ref, len_ref, e_t_ref, i_ref, alpha_ref, carry_ref):
    """Grid step t: alpha[t] = masked I[t] + lse_j(T + alpha[t-1])."""
    t = pl.program_id(0)
    i_t = jnp.where(len_ref[:] > t, i_ref[0], NEG_INF)  # (B, Np) masked

    @pl.when(t == 0)
    def _():
        alpha_ref[0] = i_t
        carry_ref[:] = i_t

    @pl.when(t > 0)
    def _():
        a_prev = carry_ref[:]
        m = jnp.max(a_prev, axis=1, keepdims=True)
        m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
        p = jnp.exp(a_prev - m_safe)
        s = jnp.dot(p, e_t_ref[:], preferred_element_type=p.dtype)
        a = i_t + m_safe + jnp.log(s) + c_ref[0, 0]
        alpha_ref[0] = a
        carry_ref[:] = a


def _beta_kernel(c_ref, len_ref, e_ref, i_ref, beta_ref, carry_ref):
    """Grid step k walks t = T-1-k downwards; per-batch seed at t = L-1.

    beta[t] = lse_j(T^T + I[t+1] + beta[t+1]), re-seeded to 0 where
    t == L_b - 1 (masking replaces the reference's roll_to_end).
    """
    k = pl.program_id(0)
    t_total = pl.num_programs(0)
    t = t_total - 1 - k
    lens = len_ref[:]  # (B, 1)

    def seeded(raw):
        return jnp.where(lens - 1 == t, jnp.zeros_like(raw), raw)

    @pl.when(k == 0)
    def _():
        b = seeded(jnp.full_like(carry_ref[:], NEG_INF))
        beta_ref[0] = b
        carry_ref[:] = b

    @pl.when(k > 0)
    def _():
        i_next = jnp.where(lens > t + 1, i_ref[0], NEG_INF)
        x = i_next + carry_ref[:]
        m = jnp.max(x, axis=1, keepdims=True)
        m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
        p = jnp.exp(x - m_safe)
        s = jnp.dot(p, e_ref[:], preferred_element_type=p.dtype)
        raw = m_safe + jnp.log(s) + c_ref[0, 0]
        b = seeded(raw)
        beta_ref[0] = b
        carry_ref[:] = b


def _run_time_scan(kernel, c_scalar, lengths_col, e_mat, inputs_p, reverse: bool):
    """Common pallas_call wiring for the alpha/beta forward kernels."""
    t_total, b_pad, n_pad = inputs_p.shape
    if reverse:
        # step k (t = T-1-k) consumes I[t+1] = I[T-k]; k=0 loads I[T-1]
        # (masked out / unused by the seed branch).
        def i_index(k):
            return (jnp.minimum(t_total - k, t_total - 1), 0, 0)

        def o_index(k):
            return (t_total - 1 - k, 0, 0)

    else:
        def i_index(k):
            return (k, 0, 0)

        def o_index(k):
            return (k, 0, 0)

    return pl.pallas_call(
        kernel,
        grid=(t_total,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda k: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((b_pad, 1), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, n_pad), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_pad, n_pad), i_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b_pad, n_pad), o_index, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_total, b_pad, n_pad), inputs_p.dtype),
        scratch_shapes=[pltpu.VMEM((b_pad, n_pad), inputs_p.dtype)],
        interpret=use_interpret(),
    )(c_scalar, lengths_col, e_mat, inputs_p)


# ---------------------------------------------------------------------------
# backward kernel: fused dI (posterior) + dT (per-step MXU accumulation)
# ---------------------------------------------------------------------------


def _bwd_kernel(
    c_ref, len_ref, g_ref, e_t_ref, i_ref, alpha_ref, alpha_prev_ref, beta_ref,
    gi_ref, gt_ref, acc_ref,
):
    """Grid step t: emit gI[t]; accumulate the dT matmul for t >= 1;
    scale and store dT at the final step."""
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
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(t > 0)
    def _():
        a_prev = alpha_prev_ref[0]
        i_t = jnp.where(len_ref[:] > t, i_ref[0], NEG_INF)
        mp = jnp.max(a_prev, axis=1, keepdims=True)
        mp_safe = jnp.where(jnp.isfinite(mp), mp, 0.0)
        v = jnp.exp(a_prev - mp_safe)  # (B, N) in [0, 1]
        u_expo = jnp.where(jnp.isfinite(a_cur), i_t - a_cur, NEG_INF)
        u = gi * jnp.exp(u_expo + mp_safe + c_ref[0, 0])
        acc_ref[:] += jnp.dot(u.T, v, preferred_element_type=u.dtype)

    @pl.when(t == t_total - 1)
    def _():
        # dT[i,j] = acc[i,j] * exp(T[i,j] - c); e_t holds exp(T-c) transposed.
        gt_ref[:] = acc_ref[:] * e_t_ref[:].T


def _run_bwd(c_scalar, lengths_col, g_col, e_t, inputs_p, alpha, beta):
    t_total, b_pad, n_pad = inputs_p.shape
    gi, gt = pl.pallas_call(
        _bwd_kernel,
        grid=(t_total,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda k: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((b_pad, 1), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, 1), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, n_pad), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_pad, n_pad), lambda k: (k, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_pad, n_pad), lambda k: (k, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, b_pad, n_pad),
                lambda k: (jnp.maximum(k - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, b_pad, n_pad), lambda k: (k, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, b_pad, n_pad), lambda k: (k, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, n_pad), lambda k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_total, b_pad, n_pad), inputs_p.dtype),
            jax.ShapeDtypeStruct((n_pad, n_pad), inputs_p.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((n_pad, n_pad), inputs_p.dtype)],
        interpret=use_interpret(),
    )(c_scalar, lengths_col, g_col, e_t, inputs_p, alpha, alpha, beta)
    return gi, gt


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


def _prepare(transition, inputs, input_lengths):
    t_total, num_batches, num_labels = inputs.shape
    n_pad = round_up(max(num_labels, LANE), LANE)
    b_pad = round_up(max(num_batches, SUBLANE), SUBLANE)
    inputs_p = pad_axis(pad_axis(inputs, n_pad, 2, NEG_INF), b_pad, 1, NEG_INF)
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
    beta = _run_time_scan(_beta_kernel, c_scalar, lengths_col, e, inputs_p, reverse=True)
    score = lse_ref(beta[0] + inputs_p[0], axis=1)
    return score[:num_batches]


def _fcc_pallas_fwd(transition, inputs, input_lengths):
    inputs_p, lengths_col, c_scalar, e, e_t, dims = _prepare(
        transition, inputs, input_lengths
    )
    num_batches = dims[1]
    alpha = _run_time_scan(
        _alpha_kernel, c_scalar, lengths_col, e_t, inputs_p, reverse=False
    )
    beta = _run_time_scan(
        _beta_kernel, c_scalar, lengths_col, e, inputs_p, reverse=True
    )
    score = lse_ref(beta[0] + inputs_p[0], axis=1)
    res = (inputs_p, lengths_col, c_scalar, e_t, alpha, beta, dims)
    return score[:num_batches], res


def _fcc_pallas_bwd(res, g):
    inputs_p, lengths_col, c_scalar, e_t, alpha, beta, dims = res
    t_total, num_batches, num_labels, b_pad, n_pad = dims
    g_col = pad_axis(g.astype(inputs_p.dtype), b_pad, 0, 0.0)[:, None]
    gi, gt = _run_bwd(c_scalar, lengths_col, g_col, e_t, inputs_p, alpha, beta)
    grad_inputs = gi[:, :num_batches, :num_labels]
    grad_transition = gt[:num_labels, :num_labels]
    return grad_transition, grad_inputs, None


fcc_score_pallas.defvjp(_fcc_pallas_fwd, _fcc_pallas_bwd)
