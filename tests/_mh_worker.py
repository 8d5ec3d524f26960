"""Worker process for the 2-process multi-host integration test.

Spawned by tests/test_distributed.py::test_two_process_dp_parity with
argv = (coordinator, num_processes, process_id, problem.npz, out.npz).
Each process initializes jax.distributed against the localhost
coordinator, builds the hybrid mesh (data axis spanning both processes —
the simulated-DCN axis), runs the data-parallel loss WITH gradients on
the globally-sharded batch, and writes its view of the replicated
results for the parent to compare against the single-process oracle.

This is the executed form of the ">= 2 hosts" BASELINE axis: same code
path (`init_distributed` -> `make_hybrid_mesh` -> `asg_loss_dp`) a real
pod-slice job runs, on two OS processes connected over gRPC.
"""

import sys


def main():
    coordinator, num_processes, process_id, problem_path, out_path = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
        sys.argv[5],
    )

    import jax

    # Force the CPU backend in-process (a sitecustomize may pre-import jax
    # with a TPU plugin pinned; env mutation is too late).  Must precede
    # init_distributed, which must precede any backend-initializing call.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from torch_asg_tpu.parallel.distributed import (
        init_distributed,
        local_batch_slice,
        make_hybrid_mesh,
    )

    is_multi = init_distributed(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        retries=3,
        retry_delay_s=1.0,
    )
    assert is_multi, "expected a multi-process topology"
    assert jax.process_count() == num_processes
    assert jax.process_index() == process_id

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from torch_asg_tpu.parallel.data_parallel import asg_loss_dp

    data = np.load(problem_path)
    transition = jnp.asarray(data["transition"])
    num_batches = int(data["inputs"].shape[1])

    mesh = make_hybrid_mesh()  # data axis spans both processes (DCN-like)
    assert mesh.shape["data"] == jax.device_count()

    # Each host feeds only its local batch shard (the production data
    # path), assembled into the global array with the mesh sharding.
    sl = local_batch_slice(num_batches)
    per_proc = sl.stop - sl.start

    def put_global(host_full, spec, batch_axis):
        local = np.take(host_full, np.arange(sl.start, sl.stop), batch_axis)
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), local
        )

    inputs = put_global(data["inputs"], P(None, "data", None), 1)
    targets = put_global(data["targets"], P("data", None), 0)
    input_lengths = put_global(data["input_lengths"], P("data"), 0)
    target_lengths = put_global(data["target_lengths"], P("data"), 0)

    # global arrays must be jit ARGUMENTS (closing over non-addressable
    # arrays is disallowed in multi-process mode)
    def loss_fn(trans, inp, tgt, li, lo):
        return asg_loss_dp(
            mesh, trans, inp, tgt, li, lo, reduction="mean", impl="scan",
        )

    loss, grad = jax.jit(jax.value_and_grad(loss_fn))(
        transition, inputs, targets, input_lengths, target_lengths
    )

    # ---- phase 2: hybrid DCN x ICI mesh with a REAL inner axis ----
    # data axis crosses the two processes (the simulated-DCN direction);
    # the model axis lives inside each process's device pool (ICI) — the
    # layout contract make_hybrid_mesh exists to guarantee.
    mesh2 = make_hybrid_mesh((2,), ("model",))
    assert dict(mesh2.shape) == {"data": 2, "model": 2}
    dev = mesh2.devices
    for r in range(dev.shape[0]):  # each data row = ONE process
        assert len({d.process_index for d in dev[r]}) == 1
    assert {d.process_index for d in dev[:, 0]} == {0, 1}

    from torch_asg_tpu.parallel.vocab_parallel import asg_loss_vp

    def rep_global(host_full):
        # every process holds the full array; replicate it onto mesh2
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh2, P()), np.asarray(host_full)
        )

    vp_args = tuple(
        rep_global(data[k])
        for k in ("transition", "inputs", "targets",
                  "input_lengths", "target_lengths")
    )

    def vp_fn(trans, inp, tgt, li, lo):
        return asg_loss_vp(mesh2, trans, inp, tgt, li, lo,
                           reduction="mean", axis="model")

    vp_loss, vp_grad = jax.jit(jax.value_and_grad(vp_fn))(*vp_args)
    # the transition grad comes back model-sharded; replicate so each
    # process can read the whole array from one addressable shard
    vp_grad = jax.jit(
        lambda x: x, out_shardings=NamedSharding(mesh2, P())
    )(vp_grad)

    # loss and grad are replicated: every process holds the full value on
    # each of its addressable shards.
    np.savez(
        out_path,
        loss=np.asarray(jax.device_get(loss.addressable_data(0))),
        grad=np.asarray(jax.device_get(grad.addressable_data(0))),
        vp_loss=np.asarray(jax.device_get(vp_loss.addressable_data(0))),
        vp_grad=np.asarray(jax.device_get(vp_grad.addressable_data(0))),
        process_count=jax.process_count(),
        device_count=jax.device_count(),
        local_device_count=jax.local_device_count(),
        local_slice=np.asarray([sl.start, sl.stop]),
    )
    assert per_proc * num_processes == num_batches
    print(f"worker {process_id}: ok", flush=True)


if __name__ == "__main__":
    main()
