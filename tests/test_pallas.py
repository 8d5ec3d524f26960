"""Pallas-kernel vs lax.scan-reference parity (interpret mode on CPU).

The scan implementation is the parity oracle (already validated against
golden fixtures, finite differences, and the torch oracle); the Pallas
kernels must agree with it to tight fp64 tolerances in interpreter mode.
On real TPUs the same kernels run compiled in fp32 (bench.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_asg_tpu import asg_loss
from torch_asg_tpu.ops.fac import fac_score
from torch_asg_tpu.ops.fcc import fcc_score
from torch_asg_tpu.ops.pallas import fac_score_pallas, fcc_score_pallas


def _case(seed, T, B, S, N, ragged=True):
    r = np.random.default_rng(seed)
    inputs = jnp.asarray(r.normal(size=(T, B, N)))
    trans = jnp.asarray(r.normal(size=(N, N)) * 0.5)
    targets = jnp.asarray(r.integers(0, N, size=(B, S)))
    if ragged:
        li = jnp.asarray(r.integers(max(S, 1), T + 1, size=(B,)))
        lo = jnp.asarray(r.integers(1, S + 1, size=(B,)))
    else:
        li = jnp.full((B,), T)
        lo = jnp.full((B,), S)
    return trans, inputs, targets, li, lo


@pytest.mark.parametrize("ragged", [False, True])
def test_fcc_pallas_forward(ragged):
    trans, inputs, targets, li, lo = _case(0, T=9, B=3, S=3, N=5, ragged=ragged)
    ref = fcc_score(trans, inputs, li)
    got = fcc_score_pallas(trans, inputs, li)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-9)


@pytest.mark.parametrize("ragged", [False, True])
def test_fcc_pallas_grads(ragged):
    trans, inputs, targets, li, lo = _case(1, T=7, B=3, S=3, N=5, ragged=ragged)
    g_ref = jax.grad(lambda t, i: fcc_score(t, i, li).sum(), argnums=(0, 1))(
        trans, inputs
    )
    g_got = jax.grad(lambda t, i: fcc_score_pallas(t, i, li).sum(), argnums=(0, 1))(
        trans, inputs
    )
    np.testing.assert_allclose(
        np.asarray(g_got[0]), np.asarray(g_ref[0]), rtol=1e-8, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(g_got[1]), np.asarray(g_ref[1]), rtol=1e-8, atol=1e-12
    )


@pytest.mark.parametrize("ragged", [False, True])
def test_fac_pallas_forward(ragged):
    trans, inputs, targets, li, lo = _case(2, T=9, B=3, S=4, N=5, ragged=ragged)
    ref = fac_score(trans, inputs, targets, li, lo)
    got = fac_score_pallas(trans, inputs, targets, li, lo)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-9)


@pytest.mark.parametrize("ragged", [False, True])
def test_fac_pallas_grads(ragged):
    trans, inputs, targets, li, lo = _case(3, T=7, B=3, S=4, N=5, ragged=ragged)
    g_ref = jax.grad(
        lambda t, i: fac_score(t, i, targets, li, lo).sum(), argnums=(0, 1)
    )(trans, inputs)
    g_got = jax.grad(
        lambda t, i: fac_score_pallas(t, i, targets, li, lo).sum(), argnums=(0, 1)
    )(trans, inputs)
    np.testing.assert_allclose(
        np.asarray(g_got[0]), np.asarray(g_ref[0]), rtol=1e-8, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(g_got[1]), np.asarray(g_ref[1]), rtol=1e-8, atol=1e-12
    )


def test_asg_loss_pallas_impl():
    trans, inputs, targets, li, lo = _case(4, T=8, B=2, S=3, N=6)
    ref = asg_loss(trans, inputs, targets, li, lo, reduction="none", impl="scan")
    got = asg_loss(trans, inputs, targets, li, lo, reduction="none", impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-9)

    g_ref = jax.grad(
        lambda t, i: asg_loss(t, i, targets, li, lo, reduction="sum", impl="scan"),
        argnums=(0, 1),
    )(trans, inputs)
    g_got = jax.grad(
        lambda t, i: asg_loss(t, i, targets, li, lo, reduction="sum", impl="pallas"),
        argnums=(0, 1),
    )(trans, inputs)
    np.testing.assert_allclose(
        np.asarray(g_got[0]), np.asarray(g_ref[0]), rtol=1e-8, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(g_got[1]), np.asarray(g_ref[1]), rtol=1e-8, atol=1e-12
    )
