"""Shared helpers for the Pallas TPU lattice kernels.

Layout strategy: the label axis N is padded to the 128-lane boundary and
the batch axis B to the 8-sublane boundary; padded emissions carry -inf
(the semiring zero) so padded labels/batches never contribute.  The whole
T-recursion runs inside ONE pallas_call with the running lattice row held
in VMEM scratch across sequential grid steps — the TPU-native answer to
the reference's "keep everything on-device, recursion in a tight loop"
design (its CUDA streams disappear: XLA/Mosaic pipelines the HBM streaming
of emissions against compute automatically via the grid).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")
LANE = 128
SUBLANE = 8


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pad_axis(x: jnp.ndarray, size: int, axis: int, value) -> jnp.ndarray:
    """Pad ``axis`` of x up to ``size`` with ``value``."""
    cur = x.shape[axis]
    if cur == size:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, size - cur)
    return jnp.pad(x, widths, constant_values=value)


_INTERPRET_OVERRIDE = None


def use_interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (tests on CPU meshes).

    The default tracks the process-default backend; ``force_interpret``
    overrides it for programs placed on a CPU mesh from a TPU-default
    process (e.g. the driver's virtual multi-chip dry run)."""
    if _INTERPRET_OVERRIDE is not None:
        return _INTERPRET_OVERRIDE
    return jax.default_backend() != "tpu"


@contextlib.contextmanager
def force_interpret(value: bool = True):
    global _INTERPRET_OVERRIDE
    prev = _INTERPRET_OVERRIDE
    _INTERPRET_OVERRIDE = value
    try:
        yield
    finally:
        _INTERPRET_OVERRIDE = prev


def kernel_dtype(x: jnp.ndarray) -> jnp.dtype:
    """Compiled TPU kernels run fp32; interpret mode keeps the input dtype
    (tests use fp64 on CPU)."""
    if use_interpret():
        return x.dtype
    return jnp.float32
