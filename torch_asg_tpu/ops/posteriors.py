"""Posterior (occupation) marginals of the ASG lattices.

gamma = alpha + beta normalized per frame — the quantity the reference's
streamed forward computes internally and feeds straight to its backward
(zh217/torch-asg ``streamlined_fast_gpu.cpp:159,215,227-229``) but never
exposes.  Useful on its own: soft alignments for distillation, confidence
estimation, and lattice visualization.

Identities (and the tests that pin them): the full-lattice posterior IS
``d fcc_score / d inputs`` and the aligned posterior is the aligned-domain
gradient of ``fac_score`` — both follow from ``tech_report.tex:174``.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .fac import _alpha_scan as _fac_alpha, _beta_scan as _fac_beta, make_aligned
from .fcc import (_alpha_scan as _fcc_alpha, _alpha_scan_mm,
                  _beta_scan as _fcc_beta, _beta_scan_mm)
from .semiring import masked_softmax
from ..utils.lengths import mask_emissions

# Above this label count the (B, N, N) per-step tensor of the plain scan
# forms is the memory problem (25 GB/step at N=10k, B=64); the matmul
# forms (same math, O(B N) per step) take over — mirroring asg.py's
# 'auto' -> 'matmul' degradation.
_MM_MIN_LABELS = 512


def _check_temperature(temperature: float):
    if temperature <= 0.0:
        raise ValueError(f"temperature must be > 0, got {temperature}")


def fcc_posteriors(
    transition: jnp.ndarray,
    inputs: jnp.ndarray,
    input_lengths: Optional[jnp.ndarray] = None,
    *,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """(T, B, N) per-frame label posteriors under the full lattice.

    Rows sum to 1 on valid frames and are exactly 0 past each utterance's
    length.  Equals ``jax.grad(fcc_score.sum(), inputs)``.

    ``temperature`` softens (tau > 1) or sharpens (tau < 1) the marginals
    by scoring the lattice at (T/tau, I/tau) — the generalized-semiring
    temperature of the reference's tech report (tech_report.tex:78-88).
    The primary distillation knob: tau -> 0 approaches the Viterbi
    one-hot occupancy of the best path.
    """
    _check_temperature(temperature)
    t_total, num_batches, _ = inputs.shape
    if input_lengths is None:
        input_lengths = jnp.full((num_batches,), t_total, dtype=jnp.int32)
    if inputs.dtype in (jnp.bfloat16, jnp.float16):
        inputs = inputs.astype(jnp.float32)
    transition = transition.astype(inputs.dtype)
    if temperature != 1.0:
        inv = 1.0 / temperature
        transition = transition * inv
        inputs = inputs * inv
    inputs_m = mask_emissions(inputs, input_lengths)
    if inputs.shape[2] > _MM_MIN_LABELS:
        alpha = _alpha_scan_mm(transition, inputs_m)
        beta = _beta_scan_mm(transition, inputs_m, input_lengths)
    else:
        alpha = _fcc_alpha(transition, inputs_m)
        beta = _fcc_beta(transition, inputs_m, input_lengths)
    return masked_softmax(alpha + beta, axis=2)


def fac_posteriors(
    transition: jnp.ndarray,
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    input_lengths: Optional[jnp.ndarray] = None,
    target_lengths: Optional[jnp.ndarray] = None,
    *,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """(T, B, S) soft alignment: P(frame t emits target slot s | targets).

    The expected segmentation under the force-aligned lattice — rows sum
    to 1 on valid frames; 0 past the lengths.  Equals the aligned-domain
    gradient of ``fac_score``.

    ``temperature`` softens/sharpens the alignment like
    ``fcc_posteriors``; tau -> 0 approaches the one-hot occupancy of the
    single best monotone alignment.
    """
    _check_temperature(temperature)
    t_total, num_batches, _ = inputs.shape
    s_total = targets.shape[1]
    if input_lengths is None:
        input_lengths = jnp.full((num_batches,), t_total, dtype=jnp.int32)
    if target_lengths is None:
        target_lengths = jnp.full((num_batches,), s_total, dtype=jnp.int32)
    if inputs.dtype in (jnp.bfloat16, jnp.float16):
        inputs = inputs.astype(jnp.float32)
    transition = transition.astype(inputs.dtype)
    if temperature != 1.0:
        inv = 1.0 / temperature
        transition = transition * inv
        inputs = inputs * inv
    lat = make_aligned(transition, inputs, targets, input_lengths, target_lengths)
    alpha = _fac_alpha(lat)
    beta = _fac_beta(lat, input_lengths, target_lengths)
    return masked_softmax(alpha + beta, axis=2)


def posterior_decode(
    transition: jnp.ndarray,
    inputs: jnp.ndarray,
    input_lengths: Optional[jnp.ndarray] = None,
    *,
    temperature: float = 1.0,
    impl: str = "auto",
    validate: bool = True,
):
    """Minimum-frame-risk (MAP-frame) decode at temperature tau.

    Per-frame argmax of the full-lattice posteriors — the decode that
    minimizes EXPECTED FRAME error under the model, versus
    ``viterbi_decode``'s sequence-error (tropical) decode.  The
    ``temperature`` knob interpolates the whole semiring family of the
    reference's tech report (``doc/tech_report.tex:78-88``): tau = 1 is
    the classic posterior decode, tau -> 0 concentrates the marginals on
    the 1-best path and recovers ``viterbi_decode``'s labels exactly
    (pinned by test), tau > 1 anneals toward the uniform.

    Returns a ``ViterbiResult``: ``paths`` (T, B) int32 with -1 past each
    utterance's length, ``scores`` (B,) = the decoded labels' summed
    posterior mass over valid frames — the expected number of correct
    frames, i.e. the MBR objective value at tau (NOT a log path score;
    rescore paths with ``asg_scores`` if a path score is needed).

    impl='pallas' computes the posteriors as the GRADIENT of the
    Pallas-kernel denominator score (the identity posteriors == d
    fcc_score / d inputs, tech_report.tex:174) — the same fused backward
    kernel the training step runs, so the decode rides the production
    kernels instead of the XLA scan.  'scan' uses the lax.scan
    alpha/beta oracle ('matmul' form past 512 labels); 'auto' = 'pallas'
    up to the kernel width budget, 'scan' beyond.

    ``validate`` guards the pallas tier's exp-domain transition-spread
    precondition exactly as ``asg_loss`` does (the log-domain 'scan'
    tier needs no guard): eager 'auto' routes to 'scan' past the bound,
    explicit 'pallas' raises; under a trace, ``validate=True`` makes
    ``scores`` come back NaN (``paths`` are ints and cannot carry the
    poison — check ``scores``), while ``validate='reroute'`` dispatches
    in-graph to the scan tier and returns the correct decode.
    """
    _check_temperature(temperature)
    if impl not in ("auto", "scan", "pallas"):
        raise ValueError(
            f"unknown impl {impl!r}; expected 'auto', 'scan' or 'pallas'")
    t_total, num_batches, num_labels = inputs.shape
    if input_lengths is None:
        input_lengths = jnp.full((num_batches,), t_total, dtype=jnp.int32)
    requested = impl
    if impl == "auto":
        impl = "pallas" if num_labels <= _MM_MIN_LABELS else "scan"
    guard = None
    if impl == "pallas":
        # Same exp-domain precondition as asg_loss's fused/pallas tiers
        # (the guard helpers live there): 'auto' reroutes, explicit
        # 'pallas' raises, traced transitions get the in-graph poison
        # (validate=True) or the in-graph scan fallback ('reroute').
        from ..asg import _spread_guard

        guard_impl = "auto" if requested == "auto" else "pallas"
        routed, guard = _spread_guard(
            transition, guard_impl, temperature, validate)
        if routed == "scan":
            impl = "scan"
    if impl == "pallas":
        if num_labels > _MM_MIN_LABELS:
            raise ValueError(
                f"impl='pallas' supports num_labels <= {_MM_MIN_LABELS}; "
                f"got {num_labels}.  Use impl='scan' (matmul form).")
        if inputs.dtype in (jnp.bfloat16, jnp.float16):
            inputs = inputs.astype(jnp.float32)
        transition = transition.astype(inputs.dtype)
        if temperature != 1.0:
            inv = 1.0 / temperature
            transition = transition * inv
            inputs = inputs * inv
        from .pallas import fcc_score_pallas
        import jax

        def _pallas_post(tr, inp):
            return jax.grad(
                lambda i: fcc_score_pallas(tr, i, input_lengths).sum()
            )(inp)

        if guard == "reroute":
            from ..asg import _spread_bad

            # operands are already tau-scaled, so the scan branch runs
            # at temperature 1 on them — same lattice both ways
            def _scan_post(tr, inp):
                return fcc_posteriors(tr, inp, input_lengths)

            post = jax.lax.cond(
                _spread_bad(transition), _scan_post, _pallas_post,
                transition, inputs,
            )
        else:
            post = _pallas_post(transition, inputs)
    else:
        post = fcc_posteriors(
            transition, inputs, input_lengths, temperature=temperature
        )
    from .viterbi import ViterbiResult

    labels = jnp.argmax(post, axis=2).astype(jnp.int32)
    best = jnp.max(post, axis=2)
    t_idx = jnp.arange(t_total, dtype=jnp.int32)[:, None]
    valid = t_idx < input_lengths.astype(jnp.int32)[None, :]
    paths = jnp.where(valid, labels, -1)
    scores = jnp.sum(jnp.where(valid, best, 0.0), axis=0)
    if guard == "poison":
        from ..asg import _ingraph_spread_poison

        # transition is already tau-scaled here, matching the guard's
        # unscaled bound (see asg._spread_guard).
        scores = _ingraph_spread_poison(scores, transition)
    return ViterbiResult(scores=scores, paths=paths)
