"""Multi-host (pod-slice) initialization and hybrid DCN x ICI meshes.

The reference is a single-process, single-device library (SURVEY.md
section 2: no torch.distributed / NCCL / MPI anywhere).  Scaling the
criterion across a TPU pod slice needs three things, all thin and
deliberately boring:

  1. process bring-up: ``jax.distributed.initialize`` with retry, so a
     restarted worker can rejoin a training job (elastic-ish recovery —
     the coordinator hands back the same process id on reconnect);
  2. a mesh whose data axis spans hosts over DCN while model/seq axes
     stay inside a host's ICI domain (collectives on the inner axes never
     cross the slow network) — ``make_hybrid_mesh``;
  3. batch bookkeeping: every host feeds only its local shard —
     ``local_batch_slice``.

On a single host everything degrades to no-ops, so the same training
script runs anywhere.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    *,
    retries: int = 3,
    retry_delay_s: float = 5.0,
) -> bool:
    """Initialize jax.distributed with retry; returns True when multi-host.

    With no arguments, uses the TPU pod environment auto-detection.  On a
    single host (or when initialization is already done) this is a no-op
    returning False/True accordingly.  Retries cover the restarted-worker
    case: the coordinator accepts a rejoining process id.

    Must be the FIRST jax call in the process: this function deliberately
    avoids touching any backend-initializing API (jax.devices,
    jax.process_count, ...) before jax.distributed.initialize, which
    refuses to run once the XLA backend is up.
    """
    last_err = None
    n_tries = max(1, retries)
    for attempt in range(n_tries):
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
            return jax.process_count() > 1
        except RuntimeError as e:
            msg = str(e)
            if "already initialized" in msg:
                return jax.process_count() > 1
            if "must be called before" in msg:
                # the XLA backend is already up: too late to initialize.
                # Report the topology the runtime landed on — correct when
                # the runtime (or an earlier call) did the initialization,
                # a loud mistake to fix otherwise.
                import warnings

                warnings.warn(
                    "init_distributed called after the XLA backend "
                    "initialized; multi-host setup must happen before any "
                    "other jax call",
                    RuntimeWarning,
                    stacklevel=2,
                )
                return jax.process_count() > 1
            last_err = e
            if attempt + 1 < n_tries:  # no pointless sleep after the last try
                time.sleep(retry_delay_s)
        except ValueError:
            if (
                coordinator_address is not None
                or num_processes is not None
                or process_id is not None
            ):
                # explicit coordinator config that jax rejected: a real
                # misconfiguration, never mask it as "single process"
                raise
            # single-process environment without coordinator config
            return False
    if last_err is not None:
        raise last_err
    return False


def make_hybrid_mesh(
    inner_sizes: Sequence[int] = (),
    inner_names: Sequence[str] = (),
    *,
    data_axis: str = "data",
) -> Mesh:
    """('data', *inner) mesh: data-parallel across hosts (DCN), inner axes
    (model/seq) within each host's ICI domain.

    The transition-gradient psum of the data axis is the only collective
    that may cross DCN; everything the vocab/sequence-sharded paths emit
    (all_gather / psum over the inner axes) stays on ICI.
    """
    inner_sizes = tuple(int(s) for s in inner_sizes)
    if len(inner_sizes) != len(inner_names):
        raise ValueError(
            f"inner_sizes {inner_sizes} and inner_names {tuple(inner_names)} "
            f"must have the same length"
        )
    inner = int(np.prod(inner_sizes)) if inner_sizes else 1
    n_local = jax.local_device_count()
    if inner > n_local or n_local % inner != 0:
        raise ValueError(
            f"inner axes {inner_sizes} need a divisor of the per-host "
            f"device count {n_local}"
        )
    if jax.process_count() > 1:
        # multi-host: the DCN-vs-ICI placement is the point — never fall
        # back silently, surface topology mismatches to the caller.
        from jax.experimental import mesh_utils

        try:
            arr = mesh_utils.create_hybrid_device_mesh(
                (n_local // inner, *inner_sizes) if inner_sizes else (n_local,),
                ((jax.process_count(), *([1] * len(inner_sizes)))
                 if inner_sizes else (jax.process_count(),)),
            )
        except ValueError as e:
            if "slices" not in str(e):
                raise
            # Non-TPU multi-process (CPU/gRPC — the simulated-multi-host
            # test path): devices carry no slice topology, so group by
            # process explicitly.  Same layout contract: the leading data
            # axis is ordered process-major (crosses the slow network),
            # inner axes stay within one process's devices.
            devices = sorted(
                jax.devices(), key=lambda d: (d.process_index, d.id)
            )
            arr = np.asarray(devices).reshape(
                (jax.process_count() * (n_local // inner), *inner_sizes)
                if inner_sizes
                else (jax.device_count(),)
            )
    else:
        # single host: every axis is ICI, a plain reshape is exact
        devices = np.asarray(jax.devices())
        arr = devices.reshape(
            (jax.device_count() // inner, *inner_sizes)
            if inner_sizes else (jax.device_count(),)
        )
    return Mesh(arr, (data_axis, *tuple(inner_names)))


def local_batch_slice(global_batch: int) -> slice:
    """The slice of a globally-indexed batch this host should load."""
    per = global_batch // jax.process_count()
    if per * jax.process_count() != global_batch:
        raise ValueError(
            f"global batch {global_batch} not divisible by "
            f"{jax.process_count()} processes"
        )
    start = jax.process_index() * per
    return slice(start, start + per)
