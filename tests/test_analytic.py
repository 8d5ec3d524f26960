"""Analytic known-value tests.

Mirrors the reference's closed-form anchors (zh217/torch-asg
``test_asg.py:50-128`` fcc, ``:190-254`` fac, ``:292-351`` asg): with
probability-normalized log inputs and zero transitions the fully-connected
partition score is exactly 0, and small force-aligned lattices have
hand-computable scores.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_asg_tpu import asg_loss, fac_score, fcc_score

jax.config.update("jax_enable_x64", True)


def test_fcc_onehot_zero_score():
    # B=2, T=3, N=2 one-hot probability inputs -> partition score 0
    B, T, N = 2, 3, 2
    inputs = jnp.log(
        jnp.array(
            [1.0, 0.0, 0.0, 1.0, 1.0, 0.0, 1.0, 0.0, 0.0, 1.0, 0.0, 1.0]
        ).reshape(B, T, N).transpose(1, 0, 2)
    )
    scores = fcc_score(jnp.zeros((N, N)), inputs, jnp.array([T, T]))
    assert float(jnp.abs(scores).sum()) < 1e-10


def test_fcc_uniform_zero_score():
    B, T, N = 2, 3, 4
    inputs = jnp.full((T, B, N), jnp.log(0.25))
    scores = fcc_score(jnp.zeros((N, N)), inputs, jnp.array([T, T]))
    assert float(jnp.abs(scores).sum()) < 1e-10


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 5e-2), (jnp.float64, 1e-4)])
def test_fcc_large_normalized_zero_score(rng, dtype, tol):
    # T=300, N=40 normalized inputs; fp32 and fp64 like the reference's
    # only precision-scaling test (test_asg.py:100-128).  The score
    # magnitude here is ~1100, so the fp32 bound is a relative ~1e-6 per
    # batch element (a 300-step fp32 logsumexp random walk); the
    # reference's own fp32 variant never ran on CPU-only machines
    # (test_asg.py:7 quirk), so its 1e-4 bound was unverified.
    B, T, N = 3, 300, 40
    x = rng.uniform(size=(T, B, N))
    x = x / x.sum(axis=-1, keepdims=True)
    inputs = jnp.asarray(np.log(x), dtype)
    scores = fcc_score(jnp.zeros((N, N), dtype), inputs, jnp.full((B,), T))
    assert float(jnp.abs(scores).sum()) < tol


def test_fac_hand_computed():
    inputs = jnp.array(
        [1.0, 0.0, 0.0, 1.0, 0.5, 0.5, 1.0, 0.0, 0.0, 1.0, 0.0, 1.0]
    ).reshape(2, 3, 2).transpose(1, 0, 2)
    targets = jnp.array([[0, 1], [0, 1]])
    expected = jax.scipy.special.logsumexp(
        jnp.array([[1.5, 2.5], [2.0, 3.0]]), axis=-1
    )
    got = fac_score(
        jnp.zeros((2, 2)), inputs, targets, jnp.array([3, 3]), jnp.array([2, 2])
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-10)


def test_fac_uniform():
    # B=1, T=3, S=2, N=4 uniform log(1/4) inputs -> -log 32
    inputs = jnp.full((3, 1, 4), jnp.log(0.25))
    got = fac_score(
        jnp.zeros((4, 4)), inputs, jnp.array([[0, 1]]), jnp.array([3]), jnp.array([2])
    )
    np.testing.assert_allclose(np.asarray(got), [-np.log(32.0)], atol=1e-10)


def test_asg_hand_computed():
    inputs = jnp.log(
        jnp.array(
            [1.0, 0.0, 0.0, 1.0, 0.5, 0.5, 1.0, 0.0, 0.0, 1.0, 0.0, 1.0]
        ).reshape(2, 3, 2).transpose(1, 0, 2)
    )
    targets = jnp.array([[0, 1], [0, 1]])
    loss = asg_loss(
        jnp.zeros((2, 2)),
        inputs,
        targets,
        jnp.array([3, 3]),
        jnp.array([2, 2]),
        reduction="none",
    )
    np.testing.assert_allclose(np.asarray(loss), [np.log(2.0), 0.0], atol=1e-10)


def test_asg_uniform():
    inputs = jnp.full((3, 1, 4), jnp.log(0.25))
    loss = asg_loss(
        jnp.zeros((4, 4)),
        inputs,
        jnp.array([[0, 1]]),
        jnp.array([3]),
        jnp.array([2]),
        reduction="mean",
    )
    np.testing.assert_allclose(float(loss), np.log(32.0), atol=1e-10)
