"""Device-mesh helpers.

The reference has no distributed support at all (SURVEY.md section 2:
no torch.distributed / NCCL / MPI anywhere; its only concurrency is CUDA
streams within one GPU).  Here distribution is first-class: criteria scale
over a ``jax.sharding.Mesh`` with XLA collectives riding ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices.

    make_mesh() -> 1D 'data' mesh over all devices.
    make_mesh((4, 2), ('data', 'model')) -> 4x2 mesh.
    """
    if devices is None:
        devices = jax.devices()
    if axis_sizes is None:
        axis_sizes = (len(devices),)
    if int(np.prod(axis_sizes)) != len(devices):
        raise ValueError(
            f"mesh axes {tuple(axis_sizes)} need {int(np.prod(axis_sizes))} devices, "
            f"got {len(devices)}"
        )
    arr = np.asarray(devices).reshape(tuple(axis_sizes))
    return Mesh(arr, tuple(axis_names))
