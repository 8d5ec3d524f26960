"""Golden-fixture regression: loss and full gradients vs wav2letter
reference constants (zh217/torch-asg ``test_asg.py:380-464``)."""

import jax
import jax.numpy as jnp
import numpy as np

from torch_asg_tpu import ASGLoss, asg_loss

import golden


def _loss_fn(trans, inputs, reduction="none"):
    return asg_loss(
        trans,
        inputs,
        jnp.asarray(golden.TARGETS),
        jnp.asarray(golden.INPUT_LENGTHS),
        jnp.asarray(golden.TARGET_LENGTHS),
        reduction=reduction,
    )


def test_golden_loss():
    loss = _loss_fn(jnp.zeros((golden.N, golden.N)), jnp.asarray(golden.INPUTS_TBN))
    assert np.abs(np.asarray(loss) - golden.EXPECTED_LOSS).sum() < 1e-3


def test_golden_grads():
    grad_t, grad_i = jax.grad(
        lambda t, i: _loss_fn(t, i).sum(), argnums=(0, 1)
    )(jnp.zeros((golden.N, golden.N)), jnp.asarray(golden.INPUTS_TBN))
    assert np.abs(np.asarray(grad_i) - golden.EXPECTED_INPUT_GRAD_TBN).max() < 1e-4
    assert np.abs(np.asarray(grad_t) - golden.EXPECTED_TRANS_GRAD).max() < 1e-4


def test_golden_under_jit():
    f = jax.jit(lambda t, i: _loss_fn(t, i))
    loss = f(jnp.zeros((golden.N, golden.N)), jnp.asarray(golden.INPUTS_TBN))
    assert np.abs(np.asarray(loss) - golden.EXPECTED_LOSS).sum() < 1e-3


def test_golden_module_api():
    crit = ASGLoss.create(golden.N, reduction="none", dtype=jnp.float64)
    loss = crit(
        jnp.asarray(golden.INPUTS_TBN),
        jnp.asarray(golden.TARGETS),
        jnp.asarray(golden.INPUT_LENGTHS),
        jnp.asarray(golden.TARGET_LENGTHS),
    )
    assert np.abs(np.asarray(loss) - golden.EXPECTED_LOSS).sum() < 1e-3


def test_golden_reductions():
    none = _loss_fn(jnp.zeros((golden.N, golden.N)), jnp.asarray(golden.INPUTS_TBN))
    s = _loss_fn(
        jnp.zeros((golden.N, golden.N)), jnp.asarray(golden.INPUTS_TBN), "sum"
    )
    m = _loss_fn(
        jnp.zeros((golden.N, golden.N)), jnp.asarray(golden.INPUTS_TBN), "mean"
    )
    np.testing.assert_allclose(float(s), float(np.asarray(none).sum()), rtol=1e-12)
    np.testing.assert_allclose(float(m), float(np.asarray(none).mean()), rtol=1e-12)


def test_determinism():
    # Same call twice gives bit-identical results (the reference only gets
    # this on CPU; its CUDA backward is atomicAdd-nondeterministic,
    # test_asg.py:354-376).  XLA scatters are deterministic.
    args = (jnp.zeros((golden.N, golden.N)), jnp.asarray(golden.INPUTS_TBN))
    g = jax.jit(jax.grad(lambda t, i: _loss_fn(t, i).sum(), argnums=(0, 1)))
    r1 = g(*args)
    r2 = g(*args)
    assert np.array_equal(np.asarray(r1[0]), np.asarray(r2[0]))
    assert np.array_equal(np.asarray(r1[1]), np.asarray(r2[1]))
