"""Randomized parity vs an independent PyTorch-autograd oracle.

The oracle (tests/oracle.py) computes scores by plain forward recursions
and gradients by torch autograd — structurally unrelated to both the JAX
framework under test and the reference's marginal-based backward — so
agreement here is strong evidence of correctness on arbitrary shapes,
including ragged input/target lengths.  This covers the driver's
"loss+grad allclose vs torch-asg on randomized shapes" bar (BASELINE.json).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from torch_asg_tpu import asg_loss, fac_score, fcc_score

from oracle import asg_oracle, fac_oracle, fcc_oracle


@pytest.fixture(autouse=True)
def _torch_f64_default():
    """fp64 torch default for the oracle — scoped and RESTORED: a
    module-level set_default_dtype leaked into every later test file
    (caught when the torch_compat bridge saw float64 parameters)."""
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    yield
    torch.set_default_dtype(prev)


def _case(seed, T, B, S, N, ragged=True):
    r = np.random.default_rng(seed)
    inputs = r.normal(size=(T, B, N))
    trans = r.normal(size=(N, N))
    targets = r.integers(0, N, size=(B, S))
    if ragged:
        input_lengths = r.integers(max(1, S), T + 1, size=(B,))
        target_lengths = r.integers(1, S + 1, size=(B,))
    else:
        input_lengths = np.full((B,), T)
        target_lengths = np.full((B,), S)
    return inputs, trans, targets, input_lengths, target_lengths


@pytest.mark.parametrize("seed", range(4))
def test_fcc_parity(seed):
    inputs, trans, targets, li, lo = _case(seed, T=9, B=4, S=3, N=6)
    got = fcc_score(jnp.asarray(trans), jnp.asarray(inputs), jnp.asarray(li))
    want = fcc_oracle(torch.tensor(trans), torch.tensor(inputs), li)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("seed", range(4))
def test_fac_parity(seed):
    inputs, trans, targets, li, lo = _case(seed, T=9, B=4, S=4, N=6)
    got = fac_score(
        jnp.asarray(trans),
        jnp.asarray(inputs),
        jnp.asarray(targets),
        jnp.asarray(li),
        jnp.asarray(lo),
    )
    want = fac_oracle(
        torch.tensor(trans), torch.tensor(inputs), torch.tensor(targets), li, lo
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("ragged", [False, True])
def test_asg_loss_and_grad_parity(seed, ragged):
    inputs, trans, targets, li, lo = _case(seed, T=8, B=3, S=4, N=5, ragged=ragged)

    got = asg_loss(
        jnp.asarray(trans),
        jnp.asarray(inputs),
        jnp.asarray(targets),
        jnp.asarray(li),
        jnp.asarray(lo),
        reduction="none",
    )
    g_trans, g_inputs = jax.grad(
        lambda t, i: asg_loss(
            t, i, jnp.asarray(targets), jnp.asarray(li), jnp.asarray(lo),
            reduction="sum",
        ),
        argnums=(0, 1),
    )(jnp.asarray(trans), jnp.asarray(inputs))

    t_trans = torch.tensor(trans, requires_grad=True)
    t_inputs = torch.tensor(inputs, requires_grad=True)
    want = asg_oracle(t_trans, t_inputs, torch.tensor(targets), li, lo)
    want.sum().backward()

    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(g_trans), t_trans.grad.numpy(), rtol=1e-8, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(g_inputs), t_inputs.grad.numpy(), rtol=1e-8, atol=1e-9
    )


def test_asg_parity_bigger_shape():
    # A letter-vocab-sized case closer to the benchmark config.
    inputs, trans, targets, li, lo = _case(7, T=50, B=4, S=12, N=30)
    got = asg_loss(
        jnp.asarray(trans), jnp.asarray(inputs), jnp.asarray(targets),
        jnp.asarray(li), jnp.asarray(lo), reduction="none",
    )
    t_trans = torch.tensor(trans, requires_grad=True)
    t_inputs = torch.tensor(inputs, requires_grad=True)
    want = asg_oracle(t_trans, t_inputs, torch.tensor(targets), li, lo)
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), rtol=1e-9, atol=1e-9)
