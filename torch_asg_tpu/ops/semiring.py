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
    call the jitted function within it."""
    global _PRECISION_OVERRIDE
    prev = _PRECISION_OVERRIDE
    _PRECISION_OVERRIDE = precision
    try:
        yield
    finally:
        _PRECISION_OVERRIDE = prev


def logsumexp(x: jnp.ndarray, axis: int, keepdims: bool = False) -> jnp.ndarray:
    """-inf-safe logsumexp along ``axis``.

    Rows that are entirely -inf reduce to -inf (not NaN).  This is the log
    semiring's generalized sum; we never differentiate through it directly
    (gradients come from posterior marginals via custom_vjp), so only the
    primal needs to be NaN-free.
    """
    m = jnp.max(x, axis=axis, keepdims=True)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    s = jnp.sum(jnp.exp(x - m_safe), axis=axis, keepdims=True)
    out = jnp.where(jnp.isfinite(m), jnp.log(s) + m_safe, m)
    if not keepdims:
        out = jnp.squeeze(out, axis=axis)
    return out


def logaddexp(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise 2-way log-semiring sum; jnp.logaddexp is already -inf safe."""
    return jnp.logaddexp(a, b)


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
