"""Length-masking helpers.

The reference handles ragged batches by physically rolling valid frames to
the array tail (``utils.cpp:40-66`` in zh217/torch-asg) which requires a
host-side length read (D2H sync).  On TPU we keep everything static-shaped
and mask instead: emissions outside ``t < input_lengths[b]`` are forced to
the semiring zero (-inf) and the beta recursions are re-seeded at
``t == input_lengths[b]-1`` with jnp.where, so no data-dependent shapes or
host syncs ever appear inside jit.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.semiring import NEG_INF


def time_mask(batch_input_len: int, input_lengths: jnp.ndarray) -> jnp.ndarray:
    """(T, B) bool mask: True where frame t is valid for batch b."""
    t = jnp.arange(batch_input_len, dtype=input_lengths.dtype)
    return t[:, None] < input_lengths[None, :]


def label_mask(batch_output_len: int, target_lengths: jnp.ndarray) -> jnp.ndarray:
    """(B, S) bool mask: True where target slot s is valid for batch b."""
    s = jnp.arange(batch_output_len, dtype=target_lengths.dtype)
    return s[None, :] < target_lengths[:, None]


def mask_emissions(inputs: jnp.ndarray, input_lengths: jnp.ndarray) -> jnp.ndarray:
    """Force emissions at invalid frames to -inf (the semiring zero).

    inputs: (T, B, N).  Replaces the reference's roll_to_end machinery.
    """
    mask = time_mask(inputs.shape[0], input_lengths)
    return jnp.where(mask[:, :, None], inputs, NEG_INF)


def default_lengths(n: int, length: int, like: jnp.ndarray) -> jnp.ndarray:
    """Full-length vector used when the user passes lengths=None."""
    return jnp.full((n,), length, dtype=like.dtype if jnp.issubdtype(like.dtype, jnp.integer) else jnp.int32)
