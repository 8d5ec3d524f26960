"""Batch data-parallel ASG over a device mesh.

Utterances are sharded along the batch axis; the (N, N) transition matrix
is replicated.  Its gradient — already a sum over the batch in the math
(zh217/torch-asg ``doc/tech_report.tex:196-197``, implemented as a batch
reduce at ``fully_connected_lattice.cpp:59-60``) — is combined with a
``psum`` over ICI, inserted automatically by the shard_map transpose of a
replicated input.  This is the multi-chip capability the reference never
had (it is single-device by construction).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..asg import asg_loss


def shard_batch(mesh: Mesh, axis: str, inputs, targets, input_lengths, target_lengths):
    """Place a batch on the mesh: inputs (T, B, N) sharded over B, etc."""
    put = jax.device_put
    return (
        put(inputs, NamedSharding(mesh, P(None, axis, None))),
        put(targets, NamedSharding(mesh, P(axis, None))),
        put(input_lengths, NamedSharding(mesh, P(axis))),
        put(target_lengths, NamedSharding(mesh, P(axis))),
    )


def asg_loss_dp(
    mesh: Mesh,
    transition: jnp.ndarray,
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    input_lengths: Optional[jnp.ndarray] = None,
    target_lengths: Optional[jnp.ndarray] = None,
    *,
    axis: str = "data",
    reduction: str = "mean",
    impl: str = "auto",
) -> jnp.ndarray:
    """ASG loss with the batch sharded over ``mesh[axis]``.

    Per-batch-element results are identical to the single-chip path; the
    global 'mean'/'sum' reductions are computed with a psum so every chip
    returns the same scalar.  Differentiable: d loss / d transition is
    psum-reduced across the mesh.
    """
    t_total, num_batches, _ = inputs.shape
    if input_lengths is None:
        input_lengths = jnp.full((num_batches,), t_total, dtype=jnp.int32)
    if target_lengths is None:
        target_lengths = jnp.full((num_batches,), targets.shape[1], dtype=jnp.int32)
    _dp_batch_check(num_batches, mesh, axis)

    from ..asg import REDUCTIONS

    if reduction not in REDUCTIONS:
        raise ValueError(
            f"unknown reduction {reduction!r}; expected one of {REDUCTIONS}"
        )
    if reduction == "none":
        out_spec = P(axis)
    else:
        out_spec = P()

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None), P(axis, None), P(axis), P(axis)),
        out_specs=out_spec,
        # the lattice scans mix replicated-derived carries (length seeds,
        # grad accumulators) with device-varying values; skip vma typing
        check_vma=False,
    )
    def _shard(trans, inp, tgt, li, lo):
        local = asg_loss(trans, inp, tgt, li, lo, reduction="none", impl=impl)
        if reduction == "none":
            return local
        total = jax.lax.psum(local.sum(), axis)
        if reduction == "mean":
            return total / num_batches
        return total

    return _shard(transition, inputs, targets, input_lengths, target_lengths)


def _dp_batch_check(num_batches: int, mesh: Mesh, axis: str) -> None:
    if num_batches % mesh.shape[axis] != 0:
        raise ValueError(
            f"batch {num_batches} not divisible by mesh axis "
            f"{axis!r} = {mesh.shape[axis]}"
        )


def viterbi_decode_dp(
    mesh: Mesh,
    transition: jnp.ndarray,
    inputs: jnp.ndarray,
    input_lengths: Optional[jnp.ndarray] = None,
    *,
    axis: str = "data",
    impl: str = "auto",
):
    """``ops.viterbi.viterbi_decode`` with the batch sharded over
    ``mesh[axis]`` (decoding is embarrassingly batch-parallel; this wrapper
    pins the per-shard Pallas/XLA tier choice and keeps every shard's
    backtrace on its own chip — no cross-chip traffic at all).

    Returns a ``ViterbiResult`` whose ``scores`` (B,) and ``paths`` (T, B)
    stay sharded over the batch axis.
    """
    from ..ops.viterbi import viterbi_decode

    t_total, num_batches, _ = inputs.shape
    if input_lengths is None:
        input_lengths = jnp.full((num_batches,), t_total, dtype=jnp.int32)
    _dp_batch_check(num_batches, mesh, axis)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None), P(axis)),
        out_specs=(P(axis), P(None, axis)),
        check_vma=False,
    )
    def _shard(trans, inp, li):
        res = viterbi_decode(trans, inp, li, impl=impl)
        return res.scores, res.paths

    from ..ops.viterbi import ViterbiResult

    scores, paths = _shard(transition, inputs, input_lengths)
    return ViterbiResult(scores, paths)


def beam_decode_dp(
    mesh: Mesh,
    transition: jnp.ndarray,
    inputs: jnp.ndarray,
    input_lengths: Optional[jnp.ndarray] = None,
    *,
    axis: str = "data",
    beam_size: int = 16,
):
    """``ops.viterbi.beam_decode`` with the batch sharded over
    ``mesh[axis]`` — the batch-parallel form of the pruned wordpiece-scale
    decoder (each shard prunes its own beams; no cross-chip traffic).

    Returns a ``ViterbiResult`` whose ``scores`` (B,) and ``paths`` (T, B)
    stay sharded over the batch axis.
    """
    from ..ops.viterbi import ViterbiResult, beam_decode

    t_total, num_batches, _ = inputs.shape
    if input_lengths is None:
        input_lengths = jnp.full((num_batches,), t_total, dtype=jnp.int32)
    _dp_batch_check(num_batches, mesh, axis)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None), P(axis)),
        out_specs=(P(axis), P(None, axis)),
        check_vma=False,
    )
    def _shard(trans, inp, li):
        res = beam_decode(trans, inp, li, beam_size=beam_size)
        return res.scores, res.paths

    scores, paths = _shard(transition, inputs, input_lengths)
    return ViterbiResult(scores, paths)


def viterbi_align_dp(
    mesh: Mesh,
    transition: jnp.ndarray,
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    input_lengths: Optional[jnp.ndarray] = None,
    target_lengths: Optional[jnp.ndarray] = None,
    *,
    axis: str = "data",
    impl: str = "auto",
):
    """``ops.viterbi.viterbi_align`` (forced alignment) with the batch
    sharded over ``mesh[axis]``; same contract as ``viterbi_decode_dp``."""
    from ..ops.viterbi import AlignmentResult, viterbi_align

    t_total, num_batches, _ = inputs.shape
    if input_lengths is None:
        input_lengths = jnp.full((num_batches,), t_total, dtype=jnp.int32)
    if target_lengths is None:
        target_lengths = jnp.full(
            (num_batches,), targets.shape[1], dtype=jnp.int32
        )
    _dp_batch_check(num_batches, mesh, axis)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None), P(axis, None), P(axis), P(axis)),
        out_specs=(P(axis), P(None, axis), P(None, axis)),
        check_vma=False,
    )
    def _shard(trans, inp, tgt, li, lo):
        res = viterbi_align(trans, inp, tgt, li, lo, impl=impl)
        return res.scores, res.positions, res.labels

    scores, positions, labels = _shard(
        transition, inputs, targets, input_lengths, target_lengths
    )
    return AlignmentResult(scores, positions, labels)
