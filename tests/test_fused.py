"""Parity tests for the fully-fused ASG kernel (ops/pallas/asg_kernels.py).

The fused kernel is the production path (impl='fused'/'auto'); these tests
pin it against the pure-jnp scan oracle in float64 (interpret mode on the
CPU backend, like the reference's fp64 gradcheck suite,
``test_asg.py:69-72`` in zh217/torch-asg).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_asg_tpu import asg_loss, asg_scores
from torch_asg_tpu.ops.fac import fac_score
from torch_asg_tpu.ops.fcc import fcc_score
from torch_asg_tpu.ops.pallas.asg_kernels import asg_scores_fused


def _case(rng, t_total, num_batches, s_total, num_labels, ragged=True):
    inputs = jnp.asarray(rng.normal(size=(t_total, num_batches, num_labels)))
    trans = jnp.asarray(rng.normal(size=(num_labels, num_labels)) * 0.5)
    targets = jnp.asarray(
        rng.integers(0, num_labels, size=(num_batches, s_total)), jnp.int32
    )
    if ragged:
        li = jnp.asarray(
            rng.integers(max(s_total, t_total // 2), t_total + 1,
                         size=(num_batches,)), jnp.int32)
        lo = jnp.asarray(
            rng.integers(1, s_total + 1, size=(num_batches,)), jnp.int32)
    else:
        li = jnp.full((num_batches,), t_total, jnp.int32)
        lo = jnp.full((num_batches,), s_total, jnp.int32)
    return trans, inputs, targets, li, lo


@pytest.mark.parametrize("ragged", [False, True])
@pytest.mark.parametrize("shape", [(13, 3, 5, 7), (37, 5, 9, 11)])
def test_fused_scores_match_oracle(rng, shape, ragged):
    trans, inputs, targets, li, lo = _case(rng, *shape, ragged=ragged)
    full_ref = fcc_score(trans, inputs, li)
    fac_ref = fac_score(trans, inputs, targets, li, lo)
    full, aligned = asg_scores_fused(trans, inputs, targets, li, lo)
    np.testing.assert_allclose(full, full_ref, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(aligned, fac_ref, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("shape", [(13, 3, 5, 7), (26, 4, 6, 9)])
def test_fused_grads_match_oracle(rng, shape):
    trans, inputs, targets, li, lo = _case(rng, *shape)

    def loss_ref(tr, i):
        return (fcc_score(tr, i, li) - fac_score(tr, i, targets, li, lo)).sum()

    def loss_fused(tr, i):
        f, a = asg_scores_fused(tr, i, targets, li, lo)
        return (f - a).sum()

    gr = jax.grad(loss_ref, (0, 1))(trans, inputs)
    gf = jax.grad(loss_fused, (0, 1))(trans, inputs)
    np.testing.assert_allclose(gf[0], gr[0], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(gf[1], gr[1], rtol=1e-9, atol=1e-12)


def test_fused_grads_numerical(rng):
    """check_grads-style: fused custom_vjp vs finite differences (fp64)."""
    from jax.test_util import check_grads

    trans, inputs, targets, li, lo = _case(rng, 11, 2, 4, 6)

    def loss(tr, i):
        f, a = asg_scores_fused(tr, i, targets, li, lo)
        return (f - a).sum()

    check_grads(loss, (trans, inputs), order=1, modes=["rev"],
                rtol=1e-6, atol=1e-6)


def test_fused_is_default_impl(rng):
    """impl='auto' routes to the fused kernel and matches scan."""
    trans, inputs, targets, li, lo = _case(rng, 13, 3, 5, 7)
    l_auto = asg_loss(trans, inputs, targets, li, lo, reduction="none")
    l_scan = asg_loss(trans, inputs, targets, li, lo, reduction="none",
                      impl="scan")
    np.testing.assert_allclose(l_auto, l_scan, rtol=1e-10, atol=1e-10)


def test_fused_forward_only_matches_vjp_path(rng):
    """The primal (score kernel) and the custom_vjp fwd agree."""
    trans, inputs, targets, li, lo = _case(rng, 17, 3, 5, 7)
    primal = asg_scores(trans, inputs, targets, li, lo, impl="fused")

    def with_grad(tr):
        f, a = asg_scores_fused(tr, inputs, targets, li, lo)
        return (f - a).sum(), (f, a)

    (_, (f2, a2)), _ = jax.value_and_grad(with_grad, has_aux=True)(trans)
    np.testing.assert_allclose(primal[0], f2, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(primal[1], a2, rtol=1e-10, atol=1e-10)


def test_fused_degenerate_lengths(rng):
    """li=1 / lo=1 corners: seeds fire at t=0; finite scores, no NaNs."""
    trans, inputs, targets, _, _ = _case(rng, 9, 3, 4, 6)
    li = jnp.asarray([1, 9, 4], jnp.int32)
    lo = jnp.asarray([1, 1, 4], jnp.int32)
    full_ref = fcc_score(trans, inputs, li)
    fac_ref = fac_score(trans, inputs, targets, li, lo)
    full, aligned = asg_scores_fused(trans, inputs, targets, li, lo)
    np.testing.assert_allclose(full, full_ref, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(aligned, fac_ref, rtol=1e-10, atol=1e-10)

    def loss(tr, i):
        f, a = asg_scores_fused(tr, i, targets, li, lo)
        return (f - a).sum()

    g = jax.grad(loss, (0, 1))(trans, inputs)
    assert np.all(np.isfinite(g[0])) and np.all(np.isfinite(g[1]))


def test_fused_matches_golden():
    """Golden fixture (test_asg.py:380-464 constants) under impl='fused'."""
    import golden

    loss = asg_loss(
        jnp.zeros((golden.N, golden.N)),
        jnp.asarray(golden.INPUTS_TBN),
        jnp.asarray(golden.TARGETS),
        jnp.asarray(golden.INPUT_LENGTHS),
        jnp.asarray(golden.TARGET_LENGTHS),
        reduction="none",
        impl="fused",
    )
    np.testing.assert_allclose(loss, golden.EXPECTED_LOSS, atol=1e-3)
