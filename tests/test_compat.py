"""The compat shim mirrors the reference README example verbatim.

Reference usage being matched (zh217/torch-asg README.md:55-81):
    ASGLoss(num_labels=N, reduction='mean'), forward(inputs (T,B,N),
    targets (B,S), input_lengths (B,), target_lengths (B,)).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_asg_tpu import asg_loss
from torch_asg_tpu.compat import ASGLoss


def test_readme_example_shapes(rng):
    num_labels = 7
    crit = ASGLoss(num_labels=num_labels, reduction="mean")
    inputs = jnp.asarray(rng.normal(size=(6, 2, num_labels)))
    targets = jnp.asarray([[1, 2, 3, 3, 5], [4, 3, 2, 2, 1]], jnp.int32)
    input_lengths = jnp.asarray([6, 5], jnp.int32)
    target_lengths = jnp.asarray([5, 4], jnp.int32)
    loss = crit.forward(inputs, targets, input_lengths, target_lengths)
    assert loss.shape == () and np.isfinite(float(loss))

    ref = asg_loss(
        crit.transition, inputs, targets, input_lengths, target_lengths,
        reduction="mean",
    )
    np.testing.assert_allclose(loss, ref, rtol=1e-12)


def test_gpu_no_stream_impl_maps_to_scan(rng):
    crit_fast = ASGLoss(5)
    crit_serial = ASGLoss(5, gpu_no_stream_impl=True)
    assert crit_serial.impl == "scan"
    inputs = jnp.asarray(rng.normal(size=(8, 2, 5)))
    targets = jnp.asarray(rng.integers(0, 5, size=(2, 3)), jnp.int32)
    np.testing.assert_allclose(
        crit_fast(inputs, targets), crit_serial(inputs, targets), rtol=1e-9
    )


def test_forward_only_blocks_grad(rng):
    crit = ASGLoss(5, forward_only=True)
    inputs = jnp.asarray(rng.normal(size=(8, 2, 5)))
    targets = jnp.asarray(rng.integers(0, 5, size=(2, 3)), jnp.int32)

    g = jax.grad(lambda tr: crit.forward(inputs, targets, transition=tr))(
        crit.transition
    )
    np.testing.assert_allclose(g, 0.0)


def test_transition_is_trainable_leaf(rng):
    crit = ASGLoss(5, reduction="sum")
    inputs = jnp.asarray(rng.normal(size=(8, 2, 5)))
    targets = jnp.asarray(rng.integers(0, 5, size=(2, 3)), jnp.int32)
    g = jax.grad(lambda tr: crit.forward(inputs, targets, transition=tr))(
        crit.transition
    )
    assert np.any(np.asarray(g) != 0.0)


def test_unknown_reduction_raises():
    with pytest.raises(ValueError, match="reduction"):
        ASGLoss(5, reduction="bogus")


def test_eval_mode_takes_score_only_path(rng):
    """Reference parity: eval mode auto-switches to the score-only path
    (``torch_asg/asg.py:129``: ``self.forward_only or not self.training``).
    Here "score-only" = gradients stopped, so the custom_vjp primal (beta
    recursions only, no alpha) is the entire computation."""
    crit = ASGLoss(5)
    assert crit.training is True
    inputs = jnp.asarray(rng.normal(size=(8, 2, 5)))
    targets = jnp.asarray(rng.integers(0, 5, size=(2, 3)), jnp.int32)

    assert crit.eval() is crit and crit.training is False
    g = jax.grad(lambda tr: crit.forward(inputs, targets, transition=tr))(
        crit.transition
    )
    np.testing.assert_allclose(g, 0.0)

    # eval-mode losses match train-mode losses exactly (same primal math)
    loss_eval = crit.forward(inputs, targets)
    crit.train()
    assert crit.training is True
    loss_train = crit.forward(inputs, targets)
    np.testing.assert_allclose(loss_eval, loss_train, rtol=1e-12)
    g2 = jax.grad(lambda tr: crit.forward(inputs, targets, transition=tr))(
        crit.transition
    )
    assert np.any(np.asarray(g2) != 0.0)
