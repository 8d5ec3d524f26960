"""Sequence-parallel (time-sharded) ASG vs the single-chip oracle.

The time axis is split over a virtual 'seq' mesh; values and gradients
must match the plain scan implementation exactly (fp64), including when
utterance lengths end inside interior chunks (the frozen-identity
boundary convention at work).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_asg_tpu import asg_loss
from torch_asg_tpu.parallel import asg_loss_seq, make_mesh


def _mesh(n, name="seq"):
    return make_mesh((n,), (name,), devices=jax.devices("cpu")[:n])


def _case(rng, t_total, num_batches, s_total, num_labels, lis=None, los=None):
    inputs = jnp.asarray(rng.normal(size=(t_total, num_batches, num_labels)))
    trans = jnp.asarray(rng.normal(size=(num_labels, num_labels)) * 0.5)
    targets = jnp.asarray(
        rng.integers(0, num_labels, size=(num_batches, s_total)), jnp.int32
    )
    li = jnp.asarray(
        lis if lis is not None
        else rng.integers(s_total, t_total + 1, size=(num_batches,)),
        jnp.int32,
    )
    lo = jnp.asarray(
        los if los is not None
        else rng.integers(1, s_total + 1, size=(num_batches,)),
        jnp.int32,
    )
    return trans, inputs, targets, li, lo


@pytest.mark.parametrize("chips", [2, 4])
def test_seq_matches_scan(rng, chips):
    mesh = _mesh(chips)
    trans, inputs, targets, li, lo = _case(rng, 16, 3, 4, 5)
    ref = asg_loss(trans, inputs, targets, li, lo, reduction="none", impl="scan")
    got = asg_loss_seq(mesh, trans, inputs, targets, li, lo, reduction="none")
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-10)


def test_seq_lengths_inside_interior_chunks(rng):
    """li ending in chunk 0, mid-chunks, and the last chunk."""
    mesh = _mesh(4)
    trans, inputs, targets, li, lo = _case(
        rng, 16, 4, 3, 5, lis=[3, 7, 12, 16], los=[2, 3, 3, 1]
    )
    ref = asg_loss(trans, inputs, targets, li, lo, reduction="none", impl="scan")
    got = asg_loss_seq(mesh, trans, inputs, targets, li, lo, reduction="none")
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-10)


def test_seq_grads_match_scan(rng):
    mesh = _mesh(4)
    trans, inputs, targets, li, lo = _case(rng, 12, 3, 4, 6, lis=[5, 12, 9])

    def loss_ref(tr, i):
        return asg_loss(tr, i, targets, li, lo, reduction="sum", impl="scan")

    def loss_seq(tr, i):
        return asg_loss_seq(mesh, tr, i, targets, li, lo, reduction="sum")

    gr = jax.grad(loss_ref, (0, 1))(trans, inputs)
    gs = jax.grad(loss_seq, (0, 1))(trans, inputs)
    np.testing.assert_allclose(gs[0], gr[0], rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(gs[1], gr[1], rtol=1e-8, atol=1e-10)
    assert np.all(np.isfinite(gs[0])) and np.all(np.isfinite(gs[1]))


def test_seq_rejects_indivisible_t(rng):
    mesh = _mesh(4)
    trans, inputs, targets, li, lo = _case(rng, 10, 2, 3, 5)
    with pytest.raises(ValueError, match="not divisible"):
        asg_loss_seq(mesh, trans, inputs, targets, li, lo)


def test_seq_under_jit_with_sharded_inputs(rng):
    """Inputs physically placed time-sharded; jit end-to-end."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    mesh = _mesh(4)
    trans, inputs, targets, li, lo = _case(rng, 16, 2, 3, 5)
    inputs_sh = jax.device_put(inputs, NamedSharding(mesh, P("seq", None, None)))
    fn = jax.jit(
        lambda tr, i: asg_loss_seq(mesh, tr, i, targets, li, lo, reduction="mean")
    )
    ref = asg_loss(trans, inputs, targets, li, lo, reduction="mean", impl="scan")
    np.testing.assert_allclose(fn(trans, inputs_sh), ref, rtol=1e-10)


def test_seq_parallel_bf16_and_wide_targets(rng):
    """asg_loss_seq normalizes inputs like asg_loss: bf16 upcast (the
    chunk scans would otherwise crash on a mixed-dtype carry or drift in
    half precision) and the S > T target clamp (regression)."""
    from torch_asg_tpu import asg_loss

    mesh = make_mesh((4,), ("seq",), devices=jax.devices("cpu")[:4])
    T, B, N, S = 8, 2, 5, 10  # S > T
    inputs = jnp.asarray(rng.normal(size=(T, B, N)), jnp.bfloat16)
    trans = jnp.asarray(rng.normal(size=(N, N)) * 0.3, jnp.float32)
    targets = jnp.asarray(rng.integers(0, N, size=(B, S)), jnp.int32)
    loss = asg_loss_seq(mesh, trans, inputs, targets, reduction="none")
    assert np.all(np.isfinite(np.asarray(loss, np.float32)))
    ref = asg_loss(trans, inputs.astype(jnp.float32), targets,
                   reduction="none", impl="scan")
    np.testing.assert_allclose(np.asarray(loss, np.float32), np.asarray(ref),
                               rtol=2e-2, atol=1e-2)
