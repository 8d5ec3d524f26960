"""ASG criterion: user-facing functional and module APIs.

Loss per batch element:  L_b = S_full(b) - S_aligned(b)   (>= 0)
where S_full is the fully-connected (denominator) log-partition score and
S_aligned the force-aligned (numerator) score — see
zh217/torch-asg ``torch_asg/asg.py:100-142`` and ``doc/tech_report.tex:282-292``
for the behavior being matched.

Differences from the reference, by design:
  * There is no device/mode dispatch (``asg.py:124-136``): one jitted
    function computes both lattices and XLA schedules the four independent
    recursions; the ``forward_only`` fast path falls out of custom_vjp
    (score-only calls never build alpha).  ``impl='scan' | 'pallas'``
    selects the pure-jnp reference path (the parity oracle, analogous to
    the reference's gpu_no_stream_impl debug switch) or the fused Pallas
    kernels.
  * The transition matrix is an explicit argument / pytree leaf rather
    than module state, so the criterion composes with jit/grad/vmap/pjit.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp

from .ops.fac import fac_score
from .ops.fcc import fcc_score

REDUCTIONS = ("mean", "sum", "none")
IMPLS = ("scan", "pallas", "fused", "matmul", "auto")


def _prep(inputs, targets, input_lengths, target_lengths):
    t_total, num_batches, _ = inputs.shape
    s_total = targets.shape[1]
    # bf16/f16 emissions are the TPU norm for encoder outputs, but the
    # lattice recursions accumulate over T steps: upcast at the criterion
    # boundary (losses are f32+ territory; the reference is f32/f64-only,
    # utils.h:33-39).
    if inputs.dtype in (jnp.bfloat16, jnp.float16):
        inputs = inputs.astype(jnp.float32)
    if target_lengths is None:
        target_lengths = jnp.full((num_batches,), s_total, dtype=jnp.int32)
    if input_lengths is None:
        input_lengths = jnp.full((num_batches,), t_total, dtype=jnp.int32)
    # Targets longer than the input can never be aligned; clamp like the
    # reference front-end (``asg.py:119-122``).  Static-shape version: only
    # applies when the padded S exceeds the padded T.
    if s_total > t_total:
        targets = targets[:, :t_total]
        target_lengths = jnp.minimum(target_lengths, t_total)
    return inputs, targets, input_lengths, target_lengths


def _reduce(result: jnp.ndarray, reduction: str) -> jnp.ndarray:
    if reduction == "sum":
        return result.sum()
    if reduction == "mean":
        return result.mean()
    if reduction == "none":
        return result
    raise ValueError(f"unknown reduction {reduction!r}; expected one of {REDUCTIONS}")


# Exp-domain safety bound (nats) on the finite transition spread
# max(finite T) - min(finite T), checked by default (``validate=True``).
# The fused/pallas/matmul tiers scale chains by exp(T - max T): beyond
# the fp32 exp range scores silently go -inf with zeroed gradients, and
# the matmul backward clamps exponents at 60 nats (ops/fcc.py) producing
# finite-but-wrong gradients.  60 is the tightest tier precondition; the
# reference's log-domain C++ recursions have no such bound
# (fully_connected_lattice.cpp:24-27), so hand-crafted large finite
# penalties ported from it must route to impl='scan' (log-domain here
# too).  -inf entries are exempt: they are the semiring zero and fully
# supported on every tier.
_EXP_SPREAD_LIMIT = 60.0
_EXP_DOMAIN_IMPLS = ("fused", "pallas", "matmul")


def _spread_guard(transition, impl: str, temperature: float, validate):
    """Host-side exp-domain precondition check (VERDICT r3 item 3, r4 5).

    Returns ``(impl, guard)`` with ``guard in (None, 'poison',
    'reroute')``.  With a CONCRETE transition (eager call) the finite
    spread is checked on the host: 'auto' with an oversized spread routes
    to the log-domain 'scan' tier (always correct, like the reference's
    C++ recursions); an EXPLICIT exp-domain tier raises under
    ``validate=True`` and silently reroutes under ``validate='reroute'``.
    Under a trace (jit/grad/vmap) the value is unknowable host-side:

    * ``validate=True`` → 'poison': an in-graph check NaN-poisons the
      output when the spread exceeds the bound, converting the silent
      -inf/zeroed-grad (fused) or clamped-grad (matmul) failure modes
      into a loud signal at zero extra compile cost.
    * ``validate='reroute'`` → 'reroute': an in-graph ``lax.cond``
      dispatches between the exp-domain tier and the log-domain scan
      tier, so a jitted >60-nat finite transition returns the CORRECT
      loss and gradients (what the reference's log-domain recursions
      would compute) instead of NaN.  Costs compiling both branches.

    ``validate=False`` is the explicit override that restores the
    unguarded fast path.
    """
    if not validate:
        # any falsy value disables the guard (backward compatible with
        # validate=0 / numpy False from config systems)
        return impl, None
    if validate not in (True, "reroute"):
        raise ValueError(
            f"validate must be True, False, or 'reroute'; got {validate!r}"
        )
    if impl == "scan":
        return impl, None
    # Temperature divides the transition before the chains run, so the
    # effective bound on the RAW spread scales with tau.
    limit = _EXP_SPREAD_LIMIT * temperature
    if isinstance(transition, jax.core.Tracer):
        return impl, ("reroute" if validate == "reroute" else "poison")
    import numpy as np

    t = np.asarray(transition)
    finite = np.isfinite(t)
    spread = float(t[finite].max() - t[finite].min()) if finite.any() else 0.0
    if spread > limit:
        if impl == "auto" or validate == "reroute":
            return "scan", None
        raise ValueError(
            f"impl={impl!r} runs exp-domain chains whose finite "
            f"transition spread must stay within {limit:.0f} nats "
            f"(fp32 exp range); got spread={spread:.1f}.  Use -inf for "
            f"forbidden transitions (fully supported), impl='scan' "
            f"(log-domain, any finite magnitude), validate='reroute' "
            f"(silent fallback to the log-domain tier), or "
            f"validate=False to override."
        )
    return impl, None


def _spread_bad(transition):
    """In-graph predicate: finite transition spread exceeds the exp-domain
    bound.  Two (N, N) reductions — noise next to the lattice chains.
    The transition is the (already temperature-scaled) one the chains
    consume, so the bound is the raw ``_EXP_SPREAD_LIMIT``."""
    finite = jnp.isfinite(transition)
    hi = jnp.max(jnp.where(finite, transition, -jnp.inf))
    lo = jnp.min(jnp.where(finite, transition, jnp.inf))
    return (hi - lo) > _EXP_SPREAD_LIMIT  # all--inf: -inf > limit is False


def _ingraph_spread_poison(out, transition):
    """NaN-poison ``out`` when the finite transition spread exceeds the
    exp-domain bound (traced-transition arm of ``_spread_guard``).

    Multiplicative on purpose: ``out * where(bad, nan, 1)`` propagates
    the NaN through the VJP as well, so GRADIENTS of a guarded loss are
    NaN, not silently zero (``where(bad, nan, out)`` would select the
    cotangent away and leave zero grads — the quiet failure mode the
    guard exists to prevent)."""
    bad = _spread_bad(transition)
    one = jnp.asarray(1.0, out.dtype)
    return out * jnp.where(bad, jnp.asarray(jnp.nan, out.dtype), one)


def _with_reroute(fast_fn, safe_fn):
    """Wrap a scores_fn so a traced transition past the exp-domain bound
    dispatches in-graph to the log-domain scan tier (``lax.cond``): the
    jitted loss then matches the reference's log-domain recursions for
    ANY finite magnitudes (VERDICT r4 item 5) instead of NaN-poisoning.
    Both branches are compiled; at runtime only the taken one executes.
    Measured cost at the bench shape: +1.8 s compile and +45% per step
    on the HEALTHY path (grad-through-cond carries branch residual
    machinery and blocks fusion — docs/PERF_R5.md §8), which is why the
    free NaN-poison guard stays the default.  Differentiates cleanly —
    ``lax.cond`` VJPs branch-wise, and both branches are custom_vjp
    score functions with identical signatures."""

    def call(transition, inputs, targets, input_lengths, target_lengths):
        return jax.lax.cond(
            _spread_bad(transition),
            safe_fn,
            fast_fn,
            transition,
            inputs,
            targets,
            input_lengths,
            target_lengths,
        )

    return call


def _guarded_scores_fn(impl: str, guard, num_labels: int, s_total: int):
    """Resolve the scores_fn for ``impl``, wrapping it with the in-graph
    scan fallback when the guard asks for 'reroute' (shared by asg_loss
    and asg_scores)."""
    scores_fn = _resolve_impl(impl, num_labels, s_total)
    if guard != "reroute":
        return scores_fn
    if max(num_labels, s_total) > _FUSED_MAX_WIDTH:
        # The only any-spread-correct fallback is the log-domain scan
        # tier, which materializes a (B, N, N) tensor per step — the
        # exact cost the 'matmul' tier exists to avoid (e.g. ~26 GB per
        # step at B=64, N=10k).  Refuse loudly instead of compiling a
        # branch that OOMs HBM.
        raise ValueError(
            f"validate='reroute' needs the log-domain scan fallback, "
            f"which materializes (B, N, N) per step and is capped at "
            f"max(num_labels, s_total) <= {_FUSED_MAX_WIDTH}; got "
            f"num_labels={num_labels}, s_total={s_total}.  Use "
            f"validate=True (NaN-poison guard), impl='scan' outright, "
            f"or keep the transition spread inside the exp-domain bound "
            f"(parallel.asg_loss_vp for sharded large vocabularies)."
        )
    return _with_reroute(
        scores_fn, _resolve_impl("scan", num_labels, s_total)
    )


# Largest padded label/target widths the fused kernel keeps VMEM-resident
# (the (N_pad, N_pad) transition exponentials plus double-buffered block
# streams must fit in the ~16 MB scoped-VMEM budget; N=1024 was measured
# to overflow it).  Beyond this, 'auto' falls back to the HBM-streaming
# scan path; vocabularies in the many-thousands belong on
# parallel.asg_loss_vp (sharded transitions).
_FUSED_MAX_WIDTH = 512


def _resolve_impl(impl: str, num_labels: int = 0, s_total: int = 0):
    """Returns scores_fn(transition, inputs, targets, li, lo) -> (full, aligned).

    'fused'/'auto': the single fused Pallas kernel computing both lattices
    (the TPU answer to the reference's 4-stream orchestration, C11);
    'pallas': the per-lattice Pallas kernels; 'scan': the pure-jnp
    lax.scan oracle (parity/debug path, analogous to the reference's
    gpu_no_stream_impl switch); 'matmul': the exp-matmul formulation that
    never materializes (B, N, N), for wordpiece-scale vocabularies on one
    chip.  'auto' degrades to 'matmul' past the fused kernel's VMEM
    budget.
    """
    if max(num_labels, s_total) > _FUSED_MAX_WIDTH:
        if impl == "auto":
            # big vocabularies: the matmul formulation streams the N^2
            # transition from HBM instead of materializing (B, N, N) per step
            impl = "matmul"
        elif impl in ("fused", "pallas"):
            # Explicit requests past the VMEM width budget would otherwise
            # die inside Mosaic with a raw VMEM-overflow error.
            raise ValueError(
                f"impl={impl!r} keeps the (padded) label/target widths "
                f"VMEM-resident and supports max(num_labels, s_total) <= "
                f"{_FUSED_MAX_WIDTH}; got num_labels={num_labels}, "
                f"s_total={s_total}.  Use impl='matmul' (single-chip, "
                f"HBM-streaming) or parallel.asg_loss_vp (transition rows "
                f"sharded across chips) for large vocabularies."
            )
    if impl == "matmul":
        from .ops.fcc import fcc_score_matmul

        def scores_matmul(transition, inputs, targets, li, lo):
            return (
                fcc_score_matmul(transition, inputs, li),
                fac_score(transition, inputs, targets, li, lo),
            )

        return scores_matmul
    if impl == "scan":

        def scores_scan(transition, inputs, targets, li, lo):
            return (
                fcc_score(transition, inputs, li),
                fac_score(transition, inputs, targets, li, lo),
            )

        return scores_scan
    if impl == "pallas":
        from .ops.pallas import fac_score_pallas, fcc_score_pallas

        def scores_pallas(transition, inputs, targets, li, lo):
            return (
                fcc_score_pallas(transition, inputs, li),
                fac_score_pallas(transition, inputs, targets, li, lo),
            )

        return scores_pallas
    if impl in ("fused", "auto"):
        from .ops.pallas import asg_scores_fused

        return asg_scores_fused
    raise ValueError(f"unknown impl {impl!r}; expected one of {IMPLS}")


def asg_loss(
    transition: jnp.ndarray,
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    input_lengths: Optional[jnp.ndarray] = None,
    target_lengths: Optional[jnp.ndarray] = None,
    *,
    reduction: str = "mean",
    impl: str = "auto",
    temperature: float = 1.0,
    precision=None,
    validate: bool = True,
) -> jnp.ndarray:
    """ASG loss.

    Args:
      transition: (N, N); ``transition[i, j]`` is the score from label j to
        label i (learned; initialize to zeros).
      inputs: (T, B, N) emission scores (unnormalized network outputs).
      targets: (B, S) int labels.
      input_lengths / target_lengths: (B,) ints; default = full length.
      reduction: 'mean' | 'sum' | 'none'.
      impl: 'fused' (production path: ONE Pallas kernel computing both
        lattices) | 'pallas' (per-lattice Pallas kernels, mid-tier /
        cross-check) | 'scan' (pure-jnp lax.scan oracle, the parity and
        debug path) | 'matmul' (exp-matmul formulation for wordpiece-
        scale vocabularies) | 'auto' (= 'fused', falling back to
        'matmul' past the fused kernel's VMEM width budget).
      temperature: generalized-semiring temperature tau (the base-B
        sum with log B = 1/tau from the reference's tech report
        ``doc/tech_report.tex:78-88``): loss_tau = tau * loss(T/tau, I/tau).
        tau = 1 is the standard log semiring; tau -> 0 approaches the
        tropical (Viterbi) semiring.
      precision: MXU precision for the exp-domain chain matmuls of the
        'fused' and 'matmul' paths; None = the library default (one
        bf16 pass — ~2e-5 relative score drift at T=1000, re-gated against
        HIGHEST every bench round).  Pass ``jax.lax.Precision.HIGHEST``
        for bit-conservative fp32 chains without reaching for the
        ``semiring.strict_chain_precision`` context manager.  The value
        is captured at forward-trace time and baked into the custom_vjp
        as a static argument, so it governs the backward kernels too
        (which JAX traces later, outside any context).  The 'pallas'
        mid-tier and the aligned-lattice gathers are pinned HIGHEST
        regardless.  On-TPU Mosaic supports DEFAULT and HIGHEST only.

    Numeric precondition (fp32 exp-domain paths: 'fused', 'pallas',
    'matmul'): the transition-matrix SPREAD max(T) - min(finite T) must
    stay well inside the fp32 exp range (~80 nats) — the chains scale by
    exp(T - max(T)), which underflows to exact zero beyond it and turns
    scores to -inf with zeroed gradients.  Learned transitions live in
    single digits; hand-crafted penalties beyond ~±40 should either use
    -inf (fully supported as the semiring zero) or ``impl='scan'``
    (log-domain throughout, like the reference's C++ recursions).

    ``validate=True`` (the default) GUARDS this precondition: with a
    concrete transition the spread is checked host-side before dispatch
    ('auto' routes to 'scan' past 60 nats; an explicit exp-domain tier
    raises ValueError); under jit/grad the check runs in-graph and
    NaN-poisons the loss instead of returning silently wrong numbers.
    ``validate='reroute'`` goes one step further: under jit/grad an
    in-graph ``lax.cond`` dispatches to the log-domain scan tier when
    the spread exceeds the bound, so the jitted loss AND gradients are
    CORRECT for any finite magnitudes (exactly what the reference's
    log-domain C++ recursions return) at the cost of compiling both
    branches; eagerly it reroutes silently instead of raising.
    ``validate=False`` restores the unguarded path (the in-graph check
    costs two (N, N) reductions per step — negligible below N~10k).
    """
    inputs, targets, input_lengths, target_lengths = _prep(
        inputs, targets, input_lengths, target_lengths
    )
    dt = jnp.promote_types(inputs.dtype, transition.dtype)
    inputs, transition = inputs.astype(dt), transition.astype(dt)
    if temperature <= 0.0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    impl, guard = _spread_guard(transition, impl, temperature, validate)
    scores_fn = _guarded_scores_fn(
        impl, guard, inputs.shape[2], targets.shape[1]
    )
    if temperature != 1.0:
        # Note: the aligned-lattice gather treats finite emissions below
        # -5e29 as -inf (ops/fac.py sentinel); after the 1/tau scaling the
        # effective bound on raw emissions is -5e29 * tau.  No sane
        # log-score approaches it, but very small tau shrinks the margin.
        inv = 1.0 / temperature
        transition = transition * inv
        inputs = inputs * inv
    if precision is not None:
        from .ops.semiring import strict_chain_precision

        with strict_chain_precision(precision):
            full, aligned = scores_fn(
                transition, inputs, targets, input_lengths, target_lengths
            )
    else:
        full, aligned = scores_fn(
            transition, inputs, targets, input_lengths, target_lengths
        )
    out = full - aligned
    if temperature != 1.0:
        out = out * temperature
    if guard == "poison":
        out = _ingraph_spread_poison(out, transition)
    return _reduce(out, reduction)


def asg_scores(
    transition: jnp.ndarray,
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    input_lengths: Optional[jnp.ndarray] = None,
    target_lengths: Optional[jnp.ndarray] = None,
    *,
    impl: str = "auto",
    temperature: float = 1.0,
    validate: bool = True,
):
    """(full_scores, aligned_scores) per batch element, shape (B,) each.

    Mirrors the tuple the reference's streamed forward returns
    (``streamlined_fast_gpu.cpp:227-229``); useful for lattice rescoring.

    ``temperature`` applies the same generalized-semiring scaling as
    ``asg_loss`` (tech_report.tex:78-88): score_tau = tau * score(T/tau,
    I/tau), so ``asg_loss(..., temperature=tau)`` == full - aligned here.
    ``validate`` guards the exp-domain spread precondition exactly as in
    ``asg_loss``.
    """
    inputs, targets, input_lengths, target_lengths = _prep(
        inputs, targets, input_lengths, target_lengths
    )
    dt = jnp.promote_types(inputs.dtype, transition.dtype)
    inputs, transition = inputs.astype(dt), transition.astype(dt)
    if temperature <= 0.0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    impl, guard = _spread_guard(transition, impl, temperature, validate)
    scores_fn = _guarded_scores_fn(
        impl, guard, inputs.shape[2], targets.shape[1]
    )
    if temperature != 1.0:
        inv = 1.0 / temperature
        transition = transition * inv
        inputs = inputs * inv
    full, aligned = scores_fn(
        transition, inputs, targets, input_lengths, target_lengths
    )
    if temperature != 1.0:
        full = full * temperature
        aligned = aligned * temperature
    if guard == "poison":
        full = _ingraph_spread_poison(full, transition)
        aligned = _ingraph_spread_poison(aligned, transition)
    return full, aligned


@jax.tree_util.register_dataclass
@dataclass
class ASGLoss:
    """Module-style front-end holding the learned transition matrix.

    A registered-dataclass pytree: ``loss = ASGLoss.create(num_labels)``;
    ``loss(inputs, targets, ...)`` computes the loss; ``loss.transition``
    is the trainable leaf (optimize it with optax alongside your model).
    API shape matches the reference module (``asg.py:100-142``) minus the
    GPU-dispatch knobs, which have no TPU analogue.
    """

    transition: jnp.ndarray
    num_labels: int = field(metadata=dict(static=True), default=0)
    reduction: str = field(metadata=dict(static=True), default="mean")
    forward_only: bool = field(metadata=dict(static=True), default=False)
    impl: str = field(metadata=dict(static=True), default="auto")
    temperature: float = field(metadata=dict(static=True), default=1.0)
    # True | False | 'reroute' — see asg_loss's validate docs
    validate: object = field(metadata=dict(static=True), default=True)

    @classmethod
    def create(
        cls,
        num_labels: int,
        reduction: str = "mean",
        forward_only: bool = False,
        impl: str = "auto",
        temperature: float = 1.0,
        dtype=jnp.float32,
        validate=True,
    ) -> "ASGLoss":
        if reduction not in REDUCTIONS:
            raise ValueError(f"unknown reduction {reduction!r}")
        return cls(
            transition=jnp.zeros((num_labels, num_labels), dtype),
            num_labels=num_labels,
            reduction=reduction,
            forward_only=forward_only,
            impl=impl,
            temperature=temperature,
            validate=validate,
        )

    def __call__(self, inputs, targets, input_lengths=None, target_lengths=None):
        transition = self.transition
        if self.forward_only:
            # stop gradients on the INPUTS so the custom_vjp primal (the
            # store-less kernel) is selected even under an enclosing
            # jax.grad; an output-side stop would still trace the
            # residual-storing fwd rule (see compat.ASGLoss.forward).
            transition = jax.lax.stop_gradient(transition)
            inputs = jax.lax.stop_gradient(inputs)
        return asg_loss(
            transition,
            inputs,
            targets,
            input_lengths,
            target_lengths,
            reduction=self.reduction,
            impl=self.impl,
            temperature=self.temperature,
            validate=self.validate,
        )
