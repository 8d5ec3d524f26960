"""Single-host behavior of the multi-host helpers (degenerate no-ops)."""

import jax
import numpy as np
import pytest

from torch_asg_tpu.parallel import (
    init_distributed,
    local_batch_slice,
    make_hybrid_mesh,
)


def test_init_distributed_single_host_noop():
    assert init_distributed() is False
    assert jax.process_count() == 1


def test_hybrid_mesh_shapes():
    mesh = make_hybrid_mesh()
    assert mesh.axis_names == ("data",)
    assert mesh.shape["data"] == jax.device_count()

    mesh2 = make_hybrid_mesh((2,), ("model",))
    assert mesh2.axis_names == ("data", "model")
    assert mesh2.shape["model"] == 2
    assert mesh2.shape["data"] * 2 == jax.device_count()


def test_hybrid_mesh_rejects_bad_inner():
    with pytest.raises(ValueError, match="divisor"):
        make_hybrid_mesh((jax.local_device_count() + 1,), ("model",))


def test_local_batch_slice():
    sl = local_batch_slice(16)
    assert sl == slice(0, 16)
    with pytest.raises(ValueError, match="divisible"):
        # process_count() == 1, so any batch divides; force the error path
        # by asking for a fractional share via a monkeypatched count
        import torch_asg_tpu.parallel.distributed as d

        orig = d.jax.process_count
        d.jax.process_count = lambda: 3
        try:
            d.local_batch_slice(16)
        finally:
            d.jax.process_count = orig


def test_hybrid_mesh_runs_collectives():
    """The ('data','model') hybrid mesh actually executes a psum."""
    from functools import partial

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    mesh = make_hybrid_mesh((2,), ("model",))

    @partial(
        jax.shard_map, mesh=mesh, in_specs=P("data", "model"), out_specs=P()
    )
    def total(x):
        return jax.lax.psum(jnp.sum(x), ("data", "model"))[None]

    n_d, n_m = mesh.shape["data"], mesh.shape["model"]
    x = jnp.ones((n_d * 2, n_m * 3))
    np.testing.assert_allclose(total(x)[0], x.size)


def test_init_distributed_retries_rejoining_worker(monkeypatch):
    """A restarted worker sees a transient RuntimeError from the
    coordinator; init_distributed must retry and succeed (elastic
    rejoin, SURVEY section 5 failure-recovery row)."""
    import torch_asg_tpu.parallel.distributed as d

    calls = []

    def flaky_initialize(**kwargs):
        calls.append(kwargs)
        if len(calls) == 1:
            raise RuntimeError("connection to coordinator failed")
        return None

    monkeypatch.setattr(d.jax.distributed, "initialize", flaky_initialize)
    out = d.init_distributed(
        coordinator_address="localhost:1234",
        num_processes=1,
        process_id=0,
        retries=3,
        retry_delay_s=0.0,
    )
    assert len(calls) == 2  # failed once, rejoined on retry
    assert out is False  # single-process topology after init


def test_init_distributed_exhausted_retries_raise(monkeypatch):
    import torch_asg_tpu.parallel.distributed as d

    def always_down(**kwargs):
        raise RuntimeError("connection to coordinator failed")

    monkeypatch.setattr(d.jax.distributed, "initialize", always_down)
    with pytest.raises(RuntimeError, match="coordinator"):
        d.init_distributed(
            coordinator_address="localhost:1234",
            num_processes=2,
            process_id=1,
            retries=2,
            retry_delay_s=0.0,
        )


def test_init_distributed_explicit_args_never_masked(monkeypatch):
    """ValueError with explicit coordinator args is a misconfiguration and
    must propagate; without args it means 'single process' (no-op)."""
    import torch_asg_tpu.parallel.distributed as d

    def reject(**kwargs):
        raise ValueError("bad coordinator config")

    monkeypatch.setattr(d.jax.distributed, "initialize", reject)
    with pytest.raises(ValueError, match="bad coordinator"):
        d.init_distributed(coordinator_address="localhost:9", retries=1)
    assert d.init_distributed(retries=1) is False


def test_hybrid_mesh_rejects_mismatched_inner_lengths():
    with pytest.raises(ValueError, match="same length"):
        make_hybrid_mesh((2, 2), ("model",))
