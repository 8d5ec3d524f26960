"""Fully-connected (denominator) lattice: log-partition score and gradients.

Computes, per batch element, the log semiring sum over ALL label paths of
length ``input_lengths[b]`` through the (T, N) emission lattice with an
(N, N) transition matrix, where ``transition[i, j]`` is the score of moving
from label j to label i.

Parity target (behavior, not code): zh217/torch-asg
``native/fully_connected_lattice.cpp`` (alpha :9-29, beta :32-47,
derivative :49-63, forward :65-91, backward :93-105).

TPU-first design decisions
  * Ragged lengths are handled by masking + per-batch beta re-seeding at
    ``t == L_in[b]-1`` (jnp.where on an iota/length comparison) instead of
    the reference's roll_to_end + host-side length sync.
  * The primal function computes ONLY the beta recursion (scores need just
    beta); under differentiation, custom_vjp's fwd additionally computes
    alpha.  This reproduces the reference's forward_only fast path
    (``streamlined_fast_gpu.cpp:24-94``) automatically: score-only calls
    never pay for alpha.
  * The O(T*B*N^2) ``path_contrib`` tensor of the reference
    (``fully_connected_lattice.cpp:77``) is never materialized.  The
    backward recomputes the per-step transition softmax from alpha using
      softmax_j(T[i,j] + I[t,b,i] + alpha[t-1,b,j])
        = exp(T[i,j] + alpha[t-1,b,j] + I[t,b,i] - alpha[t,b,i])
    whose exponent is mathematically <= 0, so a bare exp is numerically
    safe.  Residuals are O(T*B*N) (alpha + beta) only.
  * Gradients come purely from posterior marginals gamma = alpha + beta
    (no backward-pass recursion), matching the reference's headline design
    claim (README.md:17-23).
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax import lax

from .semiring import (
    NEG_INF,
    chain_precision,
    logsumexp,
    masked_softmax,
    strict_chain_precision,
)
from ..utils.lengths import mask_emissions


def _alpha_scan(transition: jnp.ndarray, inputs_m: jnp.ndarray) -> jnp.ndarray:
    """Forward scores alpha: (T, B, N).

    alpha[0] = I[0];  alpha[t, b, i] = I[t, b, i] + lse_j(T[i, j] + alpha[t-1, b, j]).
    Invalid frames (I = -inf) make alpha -inf from there on, which the
    backward's masked softmax turns into exact zeros.
    """
    a0 = inputs_m[0]

    def step(a_prev, i_t):
        pc = transition[None, :, :] + a_prev[:, None, :]  # (B, N_to, N_from)
        a = i_t + logsumexp(pc, axis=2)
        return a, a

    _, rest = lax.scan(step, a0, inputs_m[1:])
    return jnp.concatenate([a0[None], rest], axis=0)


def _beta_scan(
    transition: jnp.ndarray, inputs_m: jnp.ndarray, input_lengths: jnp.ndarray
) -> jnp.ndarray:
    """Backward scores beta: (T, B, N), seeded per batch at t == L_in[b]-1.

    beta[L_in-1, b, :] = 0 (every label may end a path); for t < L_in-1:
    beta[t, b, i] = lse_j(T[j, i] + I[t+1, b, j] + beta[t+1, b, j]).
    Frames with t >= L_in[b] stay -inf, replacing the reference's
    roll-to-end (``fully_connected_lattice.cpp:86-88``).
    """
    t_total = inputs_m.shape[0]
    trans_t = transition.T

    num_labels = inputs_m.shape[2]
    b_last = jnp.where(
        (input_lengths == t_total)[:, None],
        jnp.zeros((input_lengths.shape[0], num_labels), inputs_m.dtype),
        NEG_INF,
    )

    def step(b_next, xs):
        t, i_next = xs
        contrib = (i_next + b_next)[:, None, :]  # (B, 1, N_from)
        raw = logsumexp(trans_t[None, :, :] + contrib, axis=2)
        is_seed = (input_lengths - 1 == t)[:, None]
        b_t = jnp.where(is_seed, jnp.zeros_like(raw), raw)
        return b_t, b_t

    ts = jnp.arange(t_total - 2, -1, -1)
    _, rest = lax.scan(step, b_last, (ts, inputs_m[1:][::-1]))
    return jnp.concatenate([rest[::-1], b_last[None]], axis=0)


def _score_from_beta(beta0: jnp.ndarray, inputs0: jnp.ndarray) -> jnp.ndarray:
    # score_b = lse_i(beta[0, b, i] + I[0, b, i]); t = 0 is always valid.
    return logsumexp(beta0 + inputs0, axis=1)


@jax.custom_vjp
def fcc_score(
    transition: jnp.ndarray, inputs: jnp.ndarray, input_lengths: jnp.ndarray
) -> jnp.ndarray:
    """Log-partition (denominator) scores, shape (B,).

    transition: (N, N) with [i, j] = score of j -> i.
    inputs: (T, B, N) emission scores.  input_lengths: (B,) int.
    """
    inputs_m = mask_emissions(inputs, input_lengths)
    beta = _beta_scan(transition, inputs_m, input_lengths)
    return _score_from_beta(beta[0], inputs_m[0])


def _fcc_fwd(transition, inputs, input_lengths):
    inputs_m = mask_emissions(inputs, input_lengths)
    alpha = _alpha_scan(transition, inputs_m)
    beta = _beta_scan(transition, inputs_m, input_lengths)
    score = _score_from_beta(beta[0], inputs_m[0])
    return score, (transition, inputs_m, alpha, beta)


def _fcc_bwd(res, g):
    transition, inputs_m, alpha, beta = res
    gamma = alpha + beta
    # d score_b / d I[t, b, i] = posterior marginal of being at (t, i).
    grad_inputs = masked_softmax(gamma, axis=2) * g[None, :, None]

    # d score_b / d T[i, j] = sum_{t>=1} gI[t,b,i] * softmax_j(pc[t,b,i,:]),
    # with the path softmax recomputed from alpha instead of a stored
    # path_contrib (see module docstring).  exponent <= 0 by construction.
    def step(acc, xs):
        a_prev, a_cur, i_cur, gi = xs
        sub = jnp.where(jnp.isfinite(a_cur), i_cur - a_cur, NEG_INF)  # (B, N)
        expo = transition[None, :, :] + a_prev[:, None, :] + sub[:, :, None]
        acc = acc + jnp.einsum("bi,bij->ij", gi, jnp.exp(expo))
        return acc, None

    acc0 = jnp.zeros_like(transition)
    grad_transition, _ = lax.scan(
        step, acc0, (alpha[:-1], alpha[1:], inputs_m[1:], grad_inputs[1:])
    )
    return grad_transition, grad_inputs, None


fcc_score.defvjp(_fcc_fwd, _fcc_bwd)


# ---------------------------------------------------------------------------
# matmul formulation for large vocabularies (single chip, HBM-resident T)
# ---------------------------------------------------------------------------
#
# The scan above materializes a (B, N, N) tensor per step, which is exact
# but O(B N^2) *memory* per step — infeasible beyond a few thousand labels.
# The matmul formulation rewrites each logsumexp-over-transitions as a
# max-normalized exp matmul (the same identity the fused Pallas kernel
# uses, see ops/pallas/asg_kernels.py):
#
#   lse_j(T[i,j] + a[j]) = c + m + log( exp(a - m) @ exp(T - c)^T )[i]
#
# so a step is one (B, N) x (N, N) MXU matmul and O(B N) elementwise work.
# Per-step memory is O(B N + N^2); the N^2 transition streams from HBM.
# This is what makes wordpiece-scale vocabularies (N ~ 10k) feasible on a
# single chip; sharding them across chips (parallel.asg_loss_vp) is still
# the scalable answer.


def _exp_mats(transition, dtype):
    c = jnp.max(transition)
    c = jnp.where(jnp.isfinite(c), c, 0.0).astype(dtype)
    e = jnp.exp(transition.astype(dtype) - c)  # e[i, j] = exp(T[i,j] - c)
    return e, c


def _lse_mm(x, mat, c):
    """lse_j(x[b, j] + log mat[j, i]) + c, -inf-safe in primal AND grad.

    Dead rows (s == 0) stay -inf; the double-where keeps their VJP
    finite (a bare ``jnp.log(s)`` backpropagates 0 * (1/0) = NaN).  The
    custom_vjp loss paths never differentiate through here, but streaming
    prefix losses and autodiff-through users do.
    """
    m = jnp.max(x, axis=1, keepdims=True)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    s = jnp.dot(
        jnp.exp(x - m_safe), mat,
        preferred_element_type=x.dtype, precision=chain_precision(),
    )
    alive = s > 0
    out = jnp.where(alive, jnp.log(jnp.where(alive, s, 1.0)), NEG_INF)
    return out + m_safe + c


def _alpha_scan_mm(transition, inputs_m):
    e, c = _exp_mats(transition, inputs_m.dtype)
    e_t = e.T

    def step(a_prev, i_t):
        a = i_t + _lse_mm(a_prev, e_t, c)
        return a, a

    a0 = inputs_m[0]
    _, rest = lax.scan(step, a0, inputs_m[1:])
    return jnp.concatenate([a0[None], rest], axis=0)


def _beta_scan_mm(transition, inputs_m, input_lengths):
    e, c = _exp_mats(transition, inputs_m.dtype)
    t_total = inputs_m.shape[0]

    b_last = jnp.where(
        (input_lengths == t_total)[:, None],
        jnp.zeros(inputs_m.shape[1:], inputs_m.dtype),
        NEG_INF,
    )

    def step(b_next, xs):
        t, i_next = xs
        raw = _lse_mm(i_next + b_next, e, c)
        b_t = jnp.where((input_lengths - 1 == t)[:, None], jnp.zeros_like(raw), raw)
        return b_t, b_t

    ts = jnp.arange(t_total - 2, -1, -1)
    _, rest = lax.scan(step, b_last, (ts, inputs_m[1:][::-1]))
    return jnp.concatenate([rest[::-1], b_last[None]], axis=0)


# --- dual-chain kernel dispatch -------------------------------------------
# Under differentiation the matmul tier needs BOTH streams; running the
# two scans separately re-reads the N^2 exp-transition matrix 2T times
# (the measured 83%-of-bandwidth floor, docs/PERF_R2.md §3.4).  The
# paired-step Pallas kernel (ops/pallas/bigvocab_kernels.py) streams it
# T times, feeding each resident stripe to both contractions.  Compiled
# TPU only: interpret mode would turn the production path into a Python
# grid loop, and the XLA scans are the right CPU program; tests opt in
# with force_dual_streams to pin kernel-vs-scan parity.
_DUAL_OVERRIDE = None


@contextlib.contextmanager
def force_dual_streams(value: bool = True):
    global _DUAL_OVERRIDE
    prev = _DUAL_OVERRIDE
    _DUAL_OVERRIDE = value
    try:
        yield
    finally:
        _DUAL_OVERRIDE = prev


def _resolve_dual(t_total: int) -> bool:
    """Elect the dual kernel for the matmul tier, OUTSIDE the custom_vjp.

    The kernel carries the production DEFAULT-precision path only; under
    Precision.HIGHEST (the strict fidelity gate) the fp32 stripes double
    the working set past the scoped-VMEM budget at wordpiece scale, and
    the scans ARE the reference formulation — so HIGHEST keeps them,
    which also makes bench.py's strict 10k gate an independent-
    formulation check of the kernel's output.

    Resolved at fcc_score_matmul level and passed into _fcc_mm_p as a
    static nondiff argument: JAX caches traced custom_vjp rules by
    (function, avals, static args), so an election read INSIDE the fwd
    rule can be silently reused across a force_dual_streams flip — the
    round-5 experiment script caught exactly that.
    """
    use_dual = _DUAL_OVERRIDE
    if use_dual is None:
        from .pallas.common import use_interpret
        from .semiring import chain_precision as _cp

        use_dual = (
            not use_interpret() and _cp() == jax.lax.Precision.DEFAULT
        )
    return bool(use_dual and t_total > 1)


def _mm_streams(dual, transition, inputs_m, input_lengths):
    """(alpha, beta) for the matmul tier: dual kernel on TPU, scans off."""
    if dual:
        from .pallas.bigvocab_kernels import fcc_dual_streams

        return fcc_dual_streams(transition, inputs_m, input_lengths)
    alpha = _alpha_scan_mm(transition, inputs_m)
    beta = _beta_scan_mm(transition, inputs_m, input_lengths)
    return alpha, beta


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fcc_mm_p(precision, dual, transition, inputs, input_lengths):
    with strict_chain_precision(precision):
        inputs_m = mask_emissions(inputs, input_lengths)
        beta = _beta_scan_mm(transition, inputs_m, input_lengths)
        return _score_from_beta(beta[0], inputs_m[0])


def _fcc_mm_fwd(precision, dual, transition, inputs, input_lengths):
    with strict_chain_precision(precision):
        inputs_m = mask_emissions(inputs, input_lengths)
        alpha, beta = _mm_streams(dual, transition, inputs_m, input_lengths)
        score = _score_from_beta(beta[0], inputs_m[0])
    return score, (transition, inputs_m, alpha, beta)


def _fcc_mm_bwd(precision, dual, res, g):
    # The context must wrap the bwd trace too: custom_vjp traces this
    # rule during the backward pass, typically after the caller's
    # strict_chain_precision context has already exited.
    with strict_chain_precision(precision):
        return _fcc_mm_bwd_body(res, g)


def _fcc_mm_bwd_body(res, g):
    transition, inputs_m, alpha, beta = res
    gamma = alpha + beta
    grad_inputs = masked_softmax(gamma, axis=2) * g[None, :, None]

    e, c = _exp_mats(transition, inputs_m.dtype)

    # dT[i,j] = e[i,j] * sum_{t,b} U[t,b,i] V[t,b,j] with
    #   V = exp(a_prev - m), U = gI * exp(I - a_cur + m + c).
    # FACTOR FORM: U and V are built vectorized over (T-1, B, N) and
    # contracted in ONE (N, TB) x (TB, N) matmul.  A per-step scan
    # accumulating an (N, N) carry would stream the N^2 accumulator
    # through HBM T times (80 GB at N=10k, T=100) versus one write here.
    m = jnp.max(alpha[:-1], axis=2, keepdims=True)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    v = jnp.exp(alpha[:-1] - m_safe)
    sub = jnp.where(jnp.isfinite(alpha[1:]), inputs_m[1:] - alpha[1:], NEG_INF)
    # The exponent is bounded by the transition-matrix row spread
    # (c is the global max, not the row's own argmax path), so it is
    # NOT provably <= 0: clamp it below the fp32 overflow point so a
    # pathological >60-nat transition spread degrades gracefully
    # (clamped magnitude, correct sign) instead of inf * 0 = NaN.
    u = grad_inputs[1:] * jnp.exp(jnp.minimum(sub + m_safe + c, 60.0))
    tb = u.shape[0] * u.shape[1]
    n = u.shape[2]
    acc = jax.lax.dot_general(
        u.reshape(tb, n), v.reshape(tb, n), (((0,), (0,)), ((), ())),
        preferred_element_type=u.dtype,
        precision=chain_precision(),
    )
    return (acc * e).astype(transition.dtype), grad_inputs, None


_fcc_mm_p.defvjp(_fcc_mm_fwd, _fcc_mm_bwd)


def fcc_score_matmul(
    transition: jnp.ndarray, inputs: jnp.ndarray, input_lengths: jnp.ndarray
) -> jnp.ndarray:
    """fcc_score via the matmul formulation; same contract, large-N safe.

    The ambient chain precision (``semiring.chain_precision()``) is
    captured HERE, at forward-trace time, and baked into the custom_vjp
    as a static argument — so the backward rule, which JAX traces after
    any ``strict_chain_precision`` context has exited, still runs its
    chain matmul at the precision that was in force when the loss was
    traced (``asg_loss(precision=...)`` relies on this).
    """
    return _fcc_mm_p(chain_precision(), _resolve_dual(inputs.shape[0]),
                     transition, inputs, input_lengths)
