"""Log-semiring primitives for ASG lattice computations.

The ASG criterion is computed in the log semiring (oplus = logsumexp,
otimes = +, zero = -inf, one = 0).  The Viterbi decoder uses the tropical
semiring (oplus = max).  Both are exposed here as small, -inf-safe
primitives shared by the reference (pure-jnp ``lax.scan``) implementations
and by the Pallas kernels.

Reference behavior being matched (not ported):
  * masked softmax with the 0/0 guard for all-(-inf) rows mirrors
    ``torch_asg/native/utils.cpp:11-20`` in zh217/torch-asg.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")

# MXU precision for the exp-domain chain matmuls (fused Pallas kernels
# AND the large-vocabulary matmul formulation).  DEFAULT = one bf16 pass:
# per-step rounding ~2^-9 relative, cumulative score drift ~2e-5 relative
# at T=1000, measured ~20% faster end-to-end in the kernels and ~2x less
# HBM traffic in the transition-streaming matmul path (XLA hoists the
# bf16 conversion of exp(T - c) out of the scan).  bench.py re-gates at
# HIGHEST every round via strict_chain_precision.
CHAIN_PRECISION = jax.lax.Precision.DEFAULT
_PRECISION_OVERRIDE = None


def chain_precision():
    return CHAIN_PRECISION if _PRECISION_OVERRIDE is None else _PRECISION_OVERRIDE


@contextlib.contextmanager
def strict_chain_precision(precision=jax.lax.Precision.HIGHEST):
    """Trace chain matmuls at ``precision`` (Mosaic supports DEFAULT and
    HIGHEST only).  Affects traces made inside the context: build and
    call the jitted function within it — and the callable must be a
    FRESH object (a new lambda/closure).  The trace cache is keyed on
    (callable identity, avals) ACROSS jit wrappers, so re-jitting a
    function that was already traced outside the context silently
    reuses the old executable and the override never applies (bench.py's
    10k strict gate was vacuous for this reason until round 5)."""
    global _PRECISION_OVERRIDE
    prev = _PRECISION_OVERRIDE
    _PRECISION_OVERRIDE = precision
    try:
        yield
    finally:
        _PRECISION_OVERRIDE = prev


def logsumexp(x: jnp.ndarray, axis: int, keepdims: bool = False) -> jnp.ndarray:
    """-inf-safe logsumexp along ``axis``, in primal AND gradient.

    Rows that are entirely -inf reduce to -inf (not NaN).  The inner
    ``log`` argument is guarded with the standard double-where so
    autodiff through this function is NaN-free too (the cotangent of the
    unselected ``log(0)`` branch would otherwise be 0 * inf = NaN): the
    custom_vjp loss paths never differentiate through here, but the
    posteriors API and autodiff-through users (wfsa, seq-parallel) do.
    """
    m = jnp.max(x, axis=axis, keepdims=True)
    finite = jnp.isfinite(m)
    m_safe = jnp.where(finite, m, 0.0)
    s = jnp.sum(jnp.exp(x - m_safe), axis=axis, keepdims=True)
    out = jnp.where(
        finite, jnp.log(jnp.where(s > 0, s, 1.0)) + m_safe, m
    )
    if not keepdims:
        out = jnp.squeeze(out, axis=axis)
    return out


def logaddexp(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise 2-way log-semiring sum, -inf-safe in primal AND grad.

    ``jnp.logaddexp``'s primal is -inf safe, but its VJP computes
    ``exp(a - out)`` = exp(nan) when both args are -inf — poisoning
    autodiff through the FAC scans on dead lattice rows.  The max-shift
    form below has an exactly-zero cotangent through the shift (the m
    terms cancel analytically), so tie-breaking in ``maximum`` is
    irrelevant and every branch stays finite.
    """
    m = jnp.maximum(a, b)
    finite = jnp.isfinite(m)
    m_safe = jnp.where(finite, m, 0.0)
    s = jnp.exp(a - m_safe) + jnp.exp(b - m_safe)
    return jnp.where(finite, jnp.log(jnp.where(s > 0, s, 1.0)) + m_safe, m)


def masked_softmax(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """softmax along ``axis`` where all-(-inf) rows produce zeros, not NaN.

    Matches the semantics of the reference's masked_softmax
    (``utils.cpp:11-20``): exp(-inf)/sum == 0/0 is defined as 0.
    """
    m = jnp.max(x, axis=axis, keepdims=True)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.exp(x - m_safe)
    s = jnp.sum(e, axis=axis, keepdims=True)
    return e / jnp.where(s == 0.0, 1.0, s)
