"""API-surface tests: ASGLoss module semantics, default lengths, target
clamping, reductions, forward_only, pytree behavior — the L4 front-end
contract of the reference (zh217/torch-asg ``asg.py:100-142``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_asg_tpu import ASGLoss, asg_loss, asg_scores


def _smoke_inputs(rng, T=6, B=2, S=5, N=7):
    inputs = jnp.asarray(rng.normal(size=(T, B, N)))
    targets = jnp.asarray(rng.integers(0, N, size=(B, S)))
    input_lengths = jnp.asarray(rng.integers(S, T + 1, size=(B,)))
    target_lengths = jnp.asarray(rng.integers(1, S + 1, size=(B,)))
    return inputs, targets, input_lengths, target_lengths


def test_readme_shape_smoke(rng):
    # The reference README example (README.md:55-81): T=6, B=2, N=7, S=5,
    # random lengths, forward + backward completes.
    inputs, targets, li, lo = _smoke_inputs(rng)
    crit = ASGLoss.create(7, reduction="mean", dtype=jnp.float64)
    loss, (g_trans, g_inputs) = jax.value_and_grad(
        lambda t, i: asg_loss(t, i, targets, li, lo, reduction="mean"), argnums=(0, 1)
    )(crit.transition, inputs)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(g_trans)).all()
    assert np.isfinite(np.asarray(g_inputs)).all()


@pytest.mark.parametrize("impl", ["scan", "pallas", "fused", "matmul"])
def test_oob_targets_clip_not_crash(rng, impl):
    """Negative / >= N target labels clip into [0, N) like the reference's
    gather kernels (``force_aligned_lattice.cpp`` indexes T[y, y] after
    host-side validation; here the clip IS the contract) — same loss as
    pre-clipped targets, no crash, finite grads."""
    T, B, N, S = 7, 2, 5, 3
    inputs = jnp.asarray(rng.normal(size=(T, B, N)))
    trans = jnp.asarray(rng.normal(size=(N, N)))
    bad = jnp.asarray([[-3, 2, 99], [0, -1, 4]], jnp.int32)
    good = jnp.clip(bad, 0, N - 1)
    li = jnp.asarray([7, 5], jnp.int32)
    lo = jnp.asarray([3, 2], jnp.int32)
    out_bad = asg_loss(trans, inputs, bad, li, lo, reduction="none", impl=impl)
    out_good = asg_loss(trans, inputs, good, li, lo, reduction="none", impl=impl)
    np.testing.assert_allclose(np.asarray(out_bad), np.asarray(out_good),
                               rtol=1e-12)
    g = jax.grad(lambda tr: asg_loss(tr, inputs, bad, li, lo,
                                     reduction="sum", impl=impl))(trans)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize("impl", ["scan", "pallas", "fused", "matmul"])
def test_unalignable_element_gives_inf_not_nan(rng, impl):
    """Per-element L_out > L_in (more target slots than frames, with the
    padded S <= T so the front-end clamp does NOT fire): that element's
    loss is +inf — no monotone alignment exists — and the rest of the
    batch stays clean."""
    T, B, N, S = 6, 3, 5, 5
    inputs = jnp.asarray(rng.normal(size=(T, B, N)))
    trans = jnp.asarray(rng.normal(size=(N, N)))
    targets = jnp.asarray(rng.integers(0, N, size=(B, S)), jnp.int32)
    li = jnp.asarray([6, 3, 6], jnp.int32)
    lo = jnp.asarray([4, 5, 2], jnp.int32)  # element 1: 5 slots, 3 frames
    out = np.asarray(
        asg_loss(trans, inputs, targets, li, lo, reduction="none", impl=impl)
    )
    assert np.isposinf(out[1])
    assert np.isfinite(out[[0, 2]]).all()


@pytest.mark.parametrize("impl", ["scan", "pallas", "fused", "matmul"])
def test_empty_target_gives_inf_not_nan(rng, impl):
    """L_out = 0 means no alignable path: the element's loss is +inf and
    no NaN leaks into the batch (same contract as the unalignable
    L_out > L_in case; the reference never probes this edge)."""
    T, B, N, S = 6, 3, 5, 4
    inputs = jnp.asarray(rng.normal(size=(T, B, N)))
    trans = jnp.asarray(rng.normal(size=(N, N)))
    targets = jnp.asarray(rng.integers(0, N, size=(B, S)), jnp.int32)
    li = jnp.asarray([6, 5, 4], jnp.int32)
    lo = jnp.asarray([4, 0, 2], jnp.int32)
    out = np.asarray(
        asg_loss(trans, inputs, targets, li, lo, reduction="none", impl=impl)
    )
    assert np.isposinf(out[1])
    assert np.isfinite(out[[0, 2]]).all()
    ref = np.asarray(
        asg_loss(trans, inputs, targets, li, lo, reduction="none", impl="scan")
    )
    np.testing.assert_allclose(out[[0, 2]], ref[[0, 2]], rtol=1e-6)


def test_default_lengths(rng):
    inputs, targets, _, _ = _smoke_inputs(rng)
    a = asg_loss(jnp.zeros((7, 7)), inputs, targets, reduction="none")
    b = asg_loss(
        jnp.zeros((7, 7)),
        inputs,
        targets,
        jnp.array([6, 6]),
        jnp.array([5, 5]),
        reduction="none",
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_target_clamp_when_longer_than_input(rng):
    # S > T: the front-end clamps targets to length T (asg.py:119-122).
    T, B, N = 3, 2, 5
    inputs = jnp.asarray(rng.normal(size=(T, B, N)))
    targets = jnp.asarray(rng.integers(0, N, size=(B, 6)))
    loss = asg_loss(jnp.zeros((N, N)), inputs, targets, reduction="none")
    ref = asg_loss(jnp.zeros((N, N)), inputs, targets[:, :T], reduction="none")
    np.testing.assert_allclose(np.asarray(loss), np.asarray(ref), rtol=1e-12)


def test_unknown_reduction_raises(rng):
    inputs, targets, li, lo = _smoke_inputs(rng)
    with pytest.raises(ValueError):
        asg_loss(jnp.zeros((7, 7)), inputs, targets, li, lo, reduction="median")


def test_unknown_impl_raises(rng):
    inputs, targets, li, lo = _smoke_inputs(rng)
    with pytest.raises(ValueError):
        asg_loss(jnp.zeros((7, 7)), inputs, targets, li, lo, impl="cuda")


def test_module_is_pytree(rng):
    crit = ASGLoss.create(4, dtype=jnp.float64)
    leaves = jax.tree_util.tree_leaves(crit)
    assert len(leaves) == 1 and leaves[0].shape == (4, 4)
    # trainable through jax.grad over the module itself
    inputs = jnp.asarray(rng.normal(size=(5, 2, 4)))
    targets = jnp.asarray(rng.integers(0, 4, size=(2, 3)))

    def loss_fn(crit):
        return crit(inputs, targets)

    g = jax.grad(loss_fn)(crit)
    assert np.isfinite(np.asarray(g.transition)).all()


def test_forward_only_blocks_grad(rng):
    inputs = jnp.asarray(rng.normal(size=(5, 2, 4)))
    targets = jnp.asarray(rng.integers(0, 4, size=(2, 3)))
    crit = ASGLoss.create(4, forward_only=True, dtype=jnp.float64)
    g = jax.grad(lambda c: c(inputs, targets))(crit)
    assert np.all(np.asarray(g.transition) == 0.0)


def test_asg_scores_pair(rng):
    inputs, targets, li, lo = _smoke_inputs(rng)
    trans = jnp.asarray(rng.uniform(size=(7, 7)))
    full, aligned = asg_scores(trans, inputs, targets, li, lo)
    loss = asg_loss(trans, inputs, targets, li, lo, reduction="none")
    np.testing.assert_allclose(np.asarray(full - aligned), np.asarray(loss), rtol=1e-12)
    # denominator dominates numerator: loss >= 0
    assert np.all(np.asarray(loss) >= 0.0)


def test_batch_independence(rng):
    # Each batch element's loss must not depend on the others' padding —
    # masking correctness (the reference got this via roll_to_end).
    inputs, targets, li, lo = _smoke_inputs(rng)
    trans = jnp.asarray(rng.uniform(size=(7, 7)))
    loss = asg_loss(trans, inputs, targets, li, lo, reduction="none")
    for b in range(inputs.shape[1]):
        lb = asg_loss(
            trans,
            inputs[:, b : b + 1],
            targets[b : b + 1],
            li[b : b + 1],
            lo[b : b + 1],
            reduction="none",
        )
        np.testing.assert_allclose(float(lb[0]), float(loss[b]), rtol=1e-10)


def test_padding_invariance(rng):
    # Garbage in padded frames/targets must not change the loss.
    inputs, targets, li, lo = _smoke_inputs(rng)
    trans = jnp.asarray(rng.uniform(size=(7, 7)))
    base = asg_loss(trans, inputs, targets, li, lo, reduction="none")
    T, B, N = inputs.shape
    tmask = jnp.arange(T)[:, None] < li[None, :]
    smash = jnp.where(tmask[:, :, None], inputs, 1234.5)
    smask = jnp.arange(targets.shape[1])[None, :] < lo[:, None]
    targets2 = jnp.where(smask, targets, 3)
    out = asg_loss(trans, smash, targets2, li, lo, reduction="none")
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), rtol=1e-10)


def test_bf16_inputs_upcast(rng):
    """bf16/f16 emissions (the TPU encoder norm) compute the loss in f32."""
    inputs = jnp.asarray(rng.normal(size=(9, 2, 5)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, 5, size=(2, 3)), jnp.int32)
    trans = jnp.asarray(rng.normal(size=(5, 5)) * 0.3, jnp.float32)
    ref = asg_loss(trans, inputs, targets, impl="scan")
    got = asg_loss(
        trans.astype(jnp.bfloat16), inputs.astype(jnp.bfloat16), targets,
        impl="scan",
    )
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=1e-2)
    g = jax.grad(
        lambda tr, i: asg_loss(tr, i, targets, impl="scan"), (0, 1)
    )(trans.astype(jnp.bfloat16), inputs.astype(jnp.bfloat16))
    assert g[0].dtype == jnp.bfloat16 and g[1].dtype == jnp.bfloat16


@pytest.mark.parametrize("reduction", ["mean", "sum", "none"])
def test_forward_only_reductions(rng, reduction):
    """BASELINE config 2: forward-only scoring with every reduction."""
    inputs = jnp.asarray(rng.normal(size=(9, 3, 5)))
    targets = jnp.asarray(rng.integers(0, 5, size=(3, 4)), jnp.int32)
    m = ASGLoss.create(5, reduction=reduction, forward_only=True, impl="scan")
    out = m(inputs, targets)
    ref = asg_loss(m.transition, inputs, targets, reduction=reduction,
                   impl="scan")
    np.testing.assert_allclose(out, ref, rtol=1e-12)
    assert out.shape == ((3,) if reduction == "none" else ())
    g = jax.grad(lambda tr: m.__class__(**{**m.__dict__, "transition": tr})(
        inputs, targets).sum())(m.transition)
    np.testing.assert_allclose(g, 0.0)


def test_explicit_fused_past_width_budget_raises(rng):
    """Explicit impl='fused'/'pallas' beyond the VMEM width budget must be
    a friendly ValueError pointing at matmul/asg_loss_vp, not a raw Mosaic
    VMEM error (the 'auto' path degrades silently instead)."""
    from torch_asg_tpu.asg import _FUSED_MAX_WIDTH

    N = _FUSED_MAX_WIDTH + 1
    inputs = jnp.zeros((4, 2, N))
    targets = jnp.zeros((2, 3), jnp.int32)
    for impl in ("fused", "pallas"):
        with pytest.raises(ValueError, match="matmul"):
            asg_loss(jnp.zeros((N, N)), inputs, targets, impl=impl)
    # wide targets trip it too (the S dimension is also VMEM-resident)
    wide_targets = jnp.zeros((2, _FUSED_MAX_WIDTH + 1), jnp.int32)
    big_t = jnp.zeros((_FUSED_MAX_WIDTH + 2, 2, 5))
    with pytest.raises(ValueError, match="asg_loss_vp"):
        asg_loss(jnp.zeros((5, 5)), big_t, wide_targets, impl="fused")
    # 'auto' still degrades to matmul and computes
    loss = asg_loss(jnp.zeros((N, N)), inputs, targets, impl="auto")
    assert np.isfinite(float(loss))


def test_strict_chain_precision_context(rng):
    """The precision override must apply to traces made inside the
    context and restore afterwards (bench.py's strict gate depends on
    this); on CPU both settings compute identically."""
    from torch_asg_tpu.ops import semiring
    from torch_asg_tpu.ops.semiring import strict_chain_precision

    assert semiring.chain_precision() == jax.lax.Precision.DEFAULT
    with strict_chain_precision():
        assert semiring.chain_precision() == jax.lax.Precision.HIGHEST
        inputs = jnp.asarray(rng.normal(size=(8, 2, 5)))
        targets = jnp.asarray(rng.integers(0, 5, size=(2, 3)), jnp.int32)
        strict = asg_loss(jnp.zeros((5, 5)), inputs, targets, impl="fused")
    assert semiring.chain_precision() == jax.lax.Precision.DEFAULT
    loose = asg_loss(jnp.zeros((5, 5)), inputs, targets, impl="fused")
    np.testing.assert_allclose(np.asarray(strict), np.asarray(loose), rtol=1e-9)


def test_force_interpret_context():
    from torch_asg_tpu.ops.pallas.common import force_interpret, use_interpret

    base = use_interpret()
    with force_interpret(True):
        assert use_interpret() is True
        with force_interpret(False):
            assert use_interpret() is False
        assert use_interpret() is True
    assert use_interpret() == base


def test_asg_scores_temperature_matches_loss(rng):
    """asg_scores(..., temperature=tau) returns the pair whose difference
    IS asg_loss(..., temperature=tau) (VERDICT r2 item 8), and equals the
    manual tau * score(x / tau) scaling."""
    t_total, num_batches, num_labels, s_total = 9, 2, 5, 3
    inputs = jnp.asarray(rng.normal(size=(t_total, num_batches, num_labels)))
    trans = jnp.asarray(rng.normal(size=(num_labels, num_labels)) * 0.5)
    targets = jnp.asarray(
        rng.integers(0, num_labels, size=(num_batches, s_total)), jnp.int32
    )
    tau = 0.7
    full, aligned = asg_scores(
        trans, inputs, targets, impl="scan", temperature=tau
    )
    loss = asg_loss(
        trans, inputs, targets, reduction="none", impl="scan", temperature=tau
    )
    np.testing.assert_allclose(full - aligned, loss, rtol=1e-12)
    full_m, aligned_m = asg_scores(
        trans / tau, inputs / tau, targets, impl="scan"
    )
    np.testing.assert_allclose(full, tau * full_m, rtol=1e-12)
    np.testing.assert_allclose(aligned, tau * aligned_m, rtol=1e-12)
    with pytest.raises(ValueError, match="temperature"):
        asg_scores(trans, inputs, targets, impl="scan", temperature=0.0)


def test_asg_loss_precision_kwarg(rng):
    """precision=HIGHEST is the inline form of strict_chain_precision:
    identical trace-time effect on the chain matmuls."""
    from torch_asg_tpu.ops.semiring import strict_chain_precision

    t_total, num_batches, num_labels, s_total = 8, 2, 5, 3
    inputs = jnp.asarray(rng.normal(size=(t_total, num_batches, num_labels)))
    trans = jnp.asarray(rng.normal(size=(num_labels, num_labels)) * 0.5)
    targets = jnp.asarray(
        rng.integers(0, num_labels, size=(num_batches, s_total)), jnp.int32
    )
    kw = dict(reduction="none", impl="matmul")
    out_kwarg = asg_loss(
        trans, inputs, targets,
        precision=jax.lax.Precision.HIGHEST, **kw,
    )
    with strict_chain_precision(jax.lax.Precision.HIGHEST):
        out_ctx = asg_loss(trans, inputs, targets, **kw)
    np.testing.assert_allclose(out_kwarg, out_ctx, rtol=1e-15)
    out_plain = asg_loss(trans, inputs, targets, **kw)
    np.testing.assert_allclose(out_kwarg, out_plain, rtol=1e-10)


def _collect_dot_precisions(jaxpr, out):
    """All dot_general precision params in ``jaxpr``, recursing into
    sub-jaxprs (scan/cond bodies, pallas_call kernels, custom_vjp)."""
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "dot_general":
            out.append(eqn.params.get("precision"))
        for v in eqn.params.values():
            vs = v if isinstance(v, (tuple, list)) else (v,)
            for o in vs:
                inner = getattr(o, "jaxpr", None)
                if inner is not None and hasattr(inner, "eqns"):
                    _collect_dot_precisions(inner, out)
                elif hasattr(o, "eqns"):
                    _collect_dot_precisions(o, out)
    return out


def _dot_precision_kinds(fn, arg):
    jx = jax.make_jaxpr(fn)(arg)
    kinds = set()
    for p in _collect_dot_precisions(jx.jaxpr, []):
        if p is None:
            kinds.add("none")
        elif isinstance(p, (tuple, list)):
            kinds.update(str(x) for x in p)
        else:
            kinds.add(str(p))
    return kinds


@pytest.mark.parametrize("impl", ["matmul", "fused"])
def test_precision_kwarg_reaches_backward(rng, impl):
    """The precision kwarg is baked into the custom_vjp as a static
    argument, so the BACKWARD chain matmuls — traced after asg_loss has
    returned and any strict_chain_precision context has exited — also
    run at the requested precision.  (Regression: the kwarg used to wrap
    only the forward trace, silently leaving grads at DEFAULT.)"""
    t_total, num_batches, num_labels, s_total = 8, 2, 5, 3
    inputs = jnp.asarray(rng.normal(size=(t_total, num_batches, num_labels)))
    trans = jnp.asarray(rng.normal(size=(num_labels, num_labels)) * 0.5)
    targets = jnp.asarray(
        rng.integers(0, num_labels, size=(num_batches, s_total)), jnp.int32
    )

    def loss(tr, prec):
        return asg_loss(tr, inputs, targets, impl=impl, precision=prec,
                        reduction="sum")

    strict = _dot_precision_kinds(
        jax.grad(lambda tr: loss(tr, jax.lax.Precision.HIGHEST)), trans
    )
    assert "DEFAULT" not in strict, strict
    assert "HIGHEST" in strict
    # walker sanity: with no override the chain dots ARE DEFAULT, in
    # both the forward and the backward portion of the same jaxpr
    plain = _dot_precision_kinds(jax.grad(lambda tr: loss(tr, None)), trans)
    assert "DEFAULT" in plain, plain


# ---------------------------------------------------------------------------
# Exp-domain spread guard (VERDICT r3 item 3): the reference's log-domain
# C++ recursions accept any finite magnitudes (fully_connected_lattice.cpp:
# 24-27); the exp-domain tiers here do not.  The guard makes the failure
# mode impossible to hit silently: a 150-nat finite spread is either
# rejected, routed to the correct log-domain tier, or NaN-poisoned —
# never silently -inf / zero-grad / clamped-grad.
# ---------------------------------------------------------------------------


def _spread_case(rng, spread=150.0, T=6, B=2, S=3, N=5):
    inputs = jnp.asarray(rng.normal(size=(T, B, N)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, N, size=(B, S)), jnp.int32)
    trans = jnp.asarray(rng.normal(size=(N, N)), jnp.float32)
    trans = trans.at[0, 1].set(-spread)  # finite 150-nat penalty
    return trans, inputs, targets


def test_spread_guard_auto_routes_to_scan(rng):
    trans, inputs, targets = _spread_case(rng)
    got = asg_loss(trans, inputs, targets, impl="auto", reduction="none")
    want = asg_loss(trans, inputs, targets, impl="scan", reduction="none")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)
    assert np.isfinite(np.asarray(got)).all()


@pytest.mark.parametrize("impl", ["fused", "pallas", "matmul"])
def test_spread_guard_explicit_impl_raises(rng, impl):
    trans, inputs, targets = _spread_case(rng)
    with pytest.raises(ValueError, match="spread"):
        asg_loss(trans, inputs, targets, impl=impl)


def test_spread_guard_traced_poisons_nan(rng):
    # Under jit the transition is a tracer: the guard runs in-graph and
    # NaN-poisons the loss instead of returning silently wrong numbers.
    trans, inputs, targets = _spread_case(rng)
    f = jax.jit(lambda tr: asg_loss(tr, inputs, targets, impl="fused",
                                    reduction="none"))
    assert np.isnan(np.asarray(f(trans))).all()
    # ... and leaves a healthy transition untouched (same compiled fn).
    ok = jnp.zeros_like(trans)
    healthy = np.asarray(f(ok))
    want = np.asarray(asg_loss(ok, inputs, targets, impl="scan",
                               reduction="none"))
    np.testing.assert_allclose(healthy, want, rtol=1e-4)


def test_spread_guard_traced_poisons_grads_too(rng):
    # The poison is multiplicative so the NaN rides the VJP: a guarded
    # loss past the bound yields NaN GRADIENTS, not silent zeros (the
    # matmul tier's 60-nat clamp would otherwise return finite wrong
    # grads; a select-style poison would return zeros).
    trans, inputs, targets = _spread_case(rng)
    g = jax.jit(jax.grad(lambda tr: asg_loss(tr, inputs, targets,
                                             impl="matmul",
                                             reduction="sum")))
    assert np.isnan(np.asarray(g(trans))).all()
    # Healthy transition through the same compiled fn: finite grads that
    # match the log-domain oracle's.
    ok = jnp.asarray(rng.normal(size=trans.shape), jnp.float32)
    got = np.asarray(g(ok))
    want = np.asarray(jax.grad(lambda tr: asg_loss(
        tr, inputs, targets, impl="scan", reduction="sum"))(ok))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_spread_guard_validate_false_overrides(rng):
    trans, inputs, targets = _spread_case(rng)
    out = asg_loss(trans, inputs, targets, impl="fused", validate=False,
                   reduction="none")
    assert out.shape == (2,)  # unguarded path dispatches (values unspecified)


def test_spread_guard_ignores_neg_inf(rng):
    # -inf is the semiring zero, fully supported on every tier: it must
    # not trip the guard, eagerly or in-graph.
    trans, inputs, targets = _spread_case(rng, spread=0.0)
    trans = trans.at[0, 1].set(-np.inf)
    eager = asg_loss(trans, inputs, targets, impl="fused", reduction="none")
    jitted = jax.jit(
        lambda tr: asg_loss(tr, inputs, targets, impl="fused",
                            reduction="none"))(trans)
    assert np.isfinite(np.asarray(eager)).all()
    np.testing.assert_allclose(np.asarray(jitted), np.asarray(eager),
                               rtol=1e-5)


def test_spread_guard_scores_api(rng):
    trans, inputs, targets = _spread_case(rng)
    f = jax.jit(lambda tr: asg_scores(tr, inputs, targets, impl="fused"))
    full, aligned = f(trans)
    assert np.isnan(np.asarray(full)).all()
    assert np.isnan(np.asarray(aligned)).all()
    with pytest.raises(ValueError, match="spread"):
        asg_scores(trans, inputs, targets, impl="fused")


def test_spread_guard_temperature_scales_bound(rng):
    # temperature divides the transition before the chains: a 40-nat raw
    # spread is fine at tau=1 but becomes 160 effective nats at tau=0.25.
    trans, inputs, targets = _spread_case(rng, spread=40.0)
    out = asg_loss(trans, inputs, targets, impl="fused", reduction="none")
    assert np.isfinite(np.asarray(out)).all()
    with pytest.raises(ValueError, match="spread"):
        asg_loss(trans, inputs, targets, impl="fused", temperature=0.25)


# ---------------------------------------------------------------------------
# validate='reroute' (VERDICT r4 item 5): under jit a >60-nat finite
# transition must produce the CORRECT loss and gradients — what the
# reference's log-domain recursions return
# (fully_connected_lattice.cpp:22-28) — not NaN.  An in-graph lax.cond
# dispatches between the exp-domain tier and the log-domain scan tier.
# ---------------------------------------------------------------------------


def test_spread_reroute_traced_correct_loss_and_grads(rng):
    trans, inputs, targets = _spread_case(rng)
    vg = jax.jit(jax.value_and_grad(
        lambda tr: asg_loss(tr, inputs, targets, impl="fused",
                            validate="reroute", reduction="sum")))
    loss, grad = vg(trans)
    want_l, want_g = jax.value_and_grad(
        lambda tr: asg_loss(tr, inputs, targets, impl="scan",
                            reduction="sum"))(trans)
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(float(loss), float(want_l), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(want_g),
                               rtol=1e-4, atol=1e-6)
    # ... and a healthy transition through the SAME compiled fn takes the
    # fast branch and still agrees with the oracle.
    ok = jnp.asarray(rng.normal(size=trans.shape), jnp.float32)
    loss2, grad2 = vg(ok)
    want_l2, want_g2 = jax.value_and_grad(
        lambda tr: asg_loss(tr, inputs, targets, impl="scan",
                            reduction="sum"))(ok)
    np.testing.assert_allclose(float(loss2), float(want_l2), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(grad2), np.asarray(want_g2),
                               rtol=1e-3, atol=1e-5)


def test_spread_reroute_eager_explicit_does_not_raise(rng):
    # validate=True raises for an explicit exp-domain tier; 'reroute'
    # silently falls back to the log-domain tier instead.
    trans, inputs, targets = _spread_case(rng)
    got = asg_loss(trans, inputs, targets, impl="fused",
                   validate="reroute", reduction="none")
    want = asg_loss(trans, inputs, targets, impl="scan", reduction="none")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_spread_reroute_scores_api(rng):
    trans, inputs, targets = _spread_case(rng)
    f = jax.jit(lambda tr: asg_scores(tr, inputs, targets, impl="fused",
                                      validate="reroute"))
    full, aligned = f(trans)
    from torch_asg_tpu.ops.fac import fac_score
    from torch_asg_tpu.ops.fcc import fcc_score
    li = jnp.full((inputs.shape[1],), inputs.shape[0], jnp.int32)
    lo = jnp.full((targets.shape[0],), targets.shape[1], jnp.int32)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(fcc_score(trans, inputs, li)), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(aligned),
        np.asarray(fac_score(trans, inputs, targets, li, lo)), rtol=1e-5)


def test_validate_rejects_unknown_value(rng):
    trans, inputs, targets = _spread_case(rng, spread=0.0)
    with pytest.raises(ValueError, match="validate"):
        asg_loss(trans, inputs, targets, validate="yes")


def test_asgloss_module_carries_validate(rng):
    trans, inputs, targets = _spread_case(rng)
    # create() must propagate the knob ...
    crit = ASGLoss.create(5, impl="fused", validate="reroute",
                          reduction="none")
    assert crit.validate == "reroute"
    # ... and a module carrying it reroutes the 150-nat case under jit
    crit = ASGLoss(transition=trans, num_labels=5, impl="fused",
                   validate="reroute", reduction="none")
    got = jax.jit(lambda c: c(inputs, targets))(crit)
    want = asg_loss(trans, inputs, targets, impl="scan", reduction="none")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


# ---------------------------------------------------------------------------
# Emission-side exp-domain precondition (VERDICT r4 item 6): the fused
# kernels' FCC safety argument (ops/pallas/asg_kernels.py:36-45) claims
# full connectivity bounds the within-row alpha spread, so entries more
# than ~80 nats below their row max contribute < e^-80 RELATIVE mass and
# may underflow to exact zero harmlessly.  These tests drive the two
# common pathological user patterns — log-prob one-hots floored at -1e4
# instead of -inf, and a single -200-outlier frame — through every
# exp-domain tier against the log-domain scan oracle, as fp32 (the TPU
# compute dtype), checking loss AND gradients.
# ---------------------------------------------------------------------------


def _emission_case(rng, kind, T=8, B=3, S=4, N=6):
    targets = jnp.asarray(rng.integers(0, N, size=(B, S)), jnp.int32)
    trans = jnp.asarray(rng.normal(size=(N, N)), jnp.float32)
    if kind == "floored_onehot":
        # log-prob one-hots floored at -1e4: each frame has one label at
        # ~0 and the rest at -1e4 (a >80-nat within-row emission spread
        # at every frame)
        hot = rng.integers(0, N, size=(T, B))
        base = np.full((T, B, N), -1e4, np.float32)
        base[np.arange(T)[:, None], np.arange(B)[None, :], hot] = \
            rng.normal(size=(T, B)).astype(np.float32)
        inputs = jnp.asarray(base)
    elif kind == "outlier_frame":
        # one frame with a single -200 outlier entry (fp32 exp-safe in
        # log domain, far past the exp-domain row spread)
        base = rng.normal(size=(T, B, N)).astype(np.float32)
        base[T // 2, :, 0] = -200.0
        inputs = jnp.asarray(base)
    else:
        raise AssertionError(kind)
    return trans, inputs, targets


@pytest.mark.parametrize("impl", ["fused", "pallas", "matmul"])
@pytest.mark.parametrize("kind", ["floored_onehot", "outlier_frame"])
def test_emission_spread_parity_vs_scan(rng, impl, kind):
    trans, inputs, targets = _emission_case(rng, kind)

    def loss(tr, inp, which):
        return asg_loss(tr, inp, targets, impl=which, reduction="sum")

    want_l, (want_gt, want_gi) = jax.value_and_grad(
        lambda tr, inp: loss(tr, inp, "scan"), (0, 1))(trans, inputs)
    got_l, (got_gt, got_gi) = jax.jit(jax.value_and_grad(
        lambda tr, inp: loss(tr, inp, impl), (0, 1)))(trans, inputs)
    assert np.isfinite(float(got_l))
    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_gt), np.asarray(want_gt),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_gi), np.asarray(want_gi),
                               rtol=1e-4, atol=1e-6)


def test_spread_reroute_refuses_past_width_budget(rng):
    # The scan fallback materializes (B, N, N) per step; reroute must
    # refuse loudly past the width budget instead of compiling a branch
    # that OOMs HBM at wordpiece scale (review-pass fix).
    T, B, S, N = 4, 2, 3, 600  # N > _FUSED_MAX_WIDTH=512 -> matmul tier
    inputs = jnp.asarray(rng.normal(size=(T, B, N)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, N, size=(B, S)), jnp.int32)
    trans = jnp.asarray(rng.normal(size=(N, N)), jnp.float32)
    with pytest.raises(ValueError, match="reroute"):
        jax.jit(lambda tr: asg_loss(tr, inputs, targets,
                                    validate="reroute"))(trans)


def test_validate_falsy_disables_guard(rng):
    # validate=0 / numpy False must disable the guard like False
    # (review-pass fix: the membership check ran before the falsy check).
    trans, inputs, targets = _spread_case(rng)
    out = asg_loss(trans, inputs, targets, impl="fused", validate=0,
                   reduction="none")
    assert out.shape == (2,)
    out = asg_loss(trans, inputs, targets, impl="fused",
                   validate=np.bool_(False), reduction="none")
    assert out.shape == (2,)
