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
