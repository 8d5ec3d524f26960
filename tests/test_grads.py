"""Finite-difference gradient checks (fp64), mirroring the reference's
``torch.autograd.gradcheck`` family (zh217/torch-asg ``test_asg.py:69-72,
150-152, 221-224, 283-288, 319-321, 349-351``) — this is what validates the
recursion-free, marginal-based custom backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from torch_asg_tpu import asg_loss, fac_score, fcc_score

TOL = dict(atol=1e-6, rtol=1e-6)


def _rand(rng, shape):
    return jnp.asarray(rng.uniform(size=shape))


def test_fcc_grad_full_lengths(rng):
    T, B, N = 8, 2, 3
    inputs = _rand(rng, (T, B, N))
    trans = _rand(rng, (N, N))
    lengths = jnp.array([T] * B)
    check_grads(
        lambda t, i: fcc_score(t, i, lengths).sum(),
        (trans, inputs),
        order=1,
        modes=["rev"],
        **TOL,
    )


def test_fcc_grad_ragged(rng):
    T, B, N = 6, 3, 7
    inputs = jnp.asarray(rng.normal(size=(T, B, N)))
    trans = _rand(rng, (N, N))
    lengths = jnp.array([6, 3, 1])
    check_grads(
        lambda t, i: fcc_score(t, i, lengths).sum(),
        (trans, inputs),
        order=1,
        modes=["rev"],
        **TOL,
    )


def test_fac_grad_ragged(rng):
    T, B, S, N = 5, 3, 3, 3
    inputs = _rand(rng, (T, B, N))
    trans = _rand(rng, (N, N))
    targets = jnp.array([[1, 2, 1], [0, 1, 0], [1, 0, 0]])
    input_lengths = jnp.array([T, 4, 2])
    target_lengths = jnp.array([3, 2, 1])
    check_grads(
        lambda t, i: fac_score(t, i, targets, input_lengths, target_lengths).sum(),
        (trans, inputs),
        order=1,
        modes=["rev"],
        **TOL,
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_asg_grad_randomized(rng, seed):
    T, B, S, N = 6, 2, 5, 7
    r = np.random.default_rng(seed)
    inputs = jnp.asarray(r.normal(size=(T, B, N)))
    trans = jnp.asarray(r.uniform(size=(N, N)))
    targets = jnp.asarray(r.integers(0, N, size=(B, S)))
    input_lengths = jnp.asarray(r.integers(1, T + 1, size=(B,)))
    target_lengths = jnp.asarray(r.integers(1, S + 1, size=(B,)))
    # Keep alignable: L_out <= L_in
    target_lengths = jnp.minimum(target_lengths, input_lengths)
    check_grads(
        lambda t, i: asg_loss(
            t, i, targets, input_lengths, target_lengths, reduction="sum"
        ),
        (trans, inputs),
        order=1,
        modes=["rev"],
        **TOL,
    )


def test_asg_grad_mean_reduction(rng):
    T, B, S, N = 4, 3, 2, 4
    inputs = jnp.asarray(rng.normal(size=(T, B, N)))
    trans = jnp.asarray(rng.uniform(size=(N, N)))
    targets = jnp.asarray(rng.integers(0, N, size=(B, S)))
    check_grads(
        lambda t, i: asg_loss(t, i, targets, reduction="mean"),
        (trans, inputs),
        order=1,
        modes=["rev"],
        **TOL,
    )


def test_forward_only_value_matches_grad_path(rng):
    # The primal (beta-only, forward-only fast path) and the custom_vjp fwd
    # (alpha+beta) must produce identical scores — the analogue of the
    # reference's eval/train dispatch agreeing (asg.py:129-136).
    T, B, S, N = 7, 3, 4, 5
    inputs = jnp.asarray(rng.normal(size=(T, B, N)))
    trans = jnp.asarray(rng.uniform(size=(N, N)))
    targets = jnp.asarray(rng.integers(0, N, size=(B, S)))
    li = jnp.array([7, 5, 2])
    lo = jnp.array([4, 2, 1])

    def loss(t, i):
        return asg_loss(t, i, targets, li, lo, reduction="none")

    plain = loss(trans, inputs)
    via_grad, _ = jax.value_and_grad(lambda t, i: loss(t, i).sum(), argnums=(0, 1))(
        trans, inputs
    )
    np.testing.assert_allclose(
        float(np.asarray(plain).sum()), float(via_grad), rtol=1e-12
    )
