"""Round-5: measure the torch_compat bridge's cost vs the native JAX
step (VERDICT r4 item 7).

The bridge (torch_asg_tpu/torch_compat.py) is synchronous by contract:
every forward copies (T, B, N) host->device, runs the fused kernels, and
copies loss + gradients device->host, so plain wall timing IS the honest
user-visible number here (unlike async dispatch timing, which the
tunnel distorts — the bridge's returned tensors force completion).

What this decomposes, at the bench shape (B=64, T=1000, N=30):

  native_ms        in-graph chained fused fwd+bwd (the JAX-user step,
                   same methodology as bench.py) — the floor
  bridge_mean_ms   torch ASGLoss(reduction='mean') forward+backward wall
  bridge_none_ms   reduction='none' forward+backward wall (its backward
                   re-dispatches one fused fwd+bwd with the real
                   vector cotangent, torch_compat.py:143-147,172-176)
  h2d_ms           host->device copy+commit of the (T,B,N) emissions
  d2h_ms           device->host fetch of the (T,B,N) gradient
  fetch_ms         scalar round-trip floor of this tunnel (per trip)

On this stack the tunnel's ~25-30 ms scalar round-trip dominates the
bridge wall; on a directly-attached TPU host the same copies are PCIe
(~1 ms for 7.7 MB each way) and the decomposition below is what
transfers.  docs/MIGRATION.md carries the resulting guidance.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

B, T, S, N = 64, 1000, 50, 30
CHAIN_K = 8
ITERS = 20


def stats(obs):
    obs = sorted(obs)
    return {"best": round(obs[0], 3), "median": round(obs[len(obs) // 2], 3),
            "spread": round(obs[-1] - obs[0], 3)}


def wall_per_call(fn, iters=ITERS, warmup=3, repeats=3):
    out = []
    for _ in range(repeats):
        for _ in range(warmup):
            fn()
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        out.append((time.perf_counter() - t0) / iters * 1e3)
    return stats(out)


def main():
    import torch

    from torch_asg_tpu import asg_loss
    from torch_asg_tpu.torch_compat import ASGLoss
    from torch_asg_tpu.utils.profiling import fetch_overhead_s, time_fn_chained

    print("backend:", jax.default_backend(), file=sys.stderr)
    r = np.random.default_rng(0)
    inputs_np = r.normal(size=(T, B, N)).astype(np.float32)
    targets_np = r.integers(0, N, size=(B, S)).astype(np.int64)
    li_np = r.integers(T // 2, T + 1, size=(B,)).astype(np.int64)
    lo_np = r.integers(S // 2, S + 1, size=(B,)).astype(np.int64)

    fetch_s = fetch_overhead_s()

    # ---- native JAX chained step (same as bench.py's fused path)
    trans_j = jnp.zeros((N, N), jnp.float32)
    inputs_j = jnp.asarray(inputs_np)
    targets_j = jnp.asarray(targets_np.astype(np.int32))
    li_j = jnp.asarray(li_np.astype(np.int32))
    lo_j = jnp.asarray(lo_np.astype(np.int32))

    def vg(tr, inp):
        return jax.value_and_grad(
            lambda a, b: asg_loss(a, b, targets_j, li_j, lo_j,
                                  reduction="mean", impl="fused"),
            argnums=(0, 1))(tr, inp)

    def chain(inp):
        def body(inp_c, _):
            loss, (gt, gi) = vg(trans_j, inp_c)
            return inp_c + 0.0 * gi, loss
        inp_o, losses = jax.lax.scan(body, inp, None, length=CHAIN_K)
        return losses[-1], inp_o

    f = jax.jit(chain)
    f(inputs_j)
    native = stats([
        time_fn_chained(f, lambda _, out: out[1], inputs_j, warmup=2,
                        iters=12, fetch_s=fetch_s) / CHAIN_K * 1e3
        for _ in range(5)
    ])

    # ---- torch bridge, mean reduction (fwd computes grads too)
    inputs_t = torch.from_numpy(inputs_np).requires_grad_(True)
    targets_t = torch.from_numpy(targets_np)
    li_t = torch.from_numpy(li_np)
    lo_t = torch.from_numpy(lo_np)

    crit = ASGLoss(num_labels=N, reduction="mean")

    def bridge_mean():
        if inputs_t.grad is not None:
            inputs_t.grad = None
        crit.transition.grad = None
        loss = crit(inputs_t, targets_t, li_t, lo_t)
        loss.backward()
        assert inputs_t.grad is not None

    bridge_mean_ms = wall_per_call(bridge_mean)

    crit_none = ASGLoss(num_labels=N, reduction="none")

    def bridge_none():
        if inputs_t.grad is not None:
            inputs_t.grad = None
        crit_none.transition.grad = None
        loss = crit_none(inputs_t, targets_t, li_t, lo_t)
        loss.sum().backward()

    bridge_none_ms = wall_per_call(bridge_none)

    # ---- component walls
    def h2d():
        jax.block_until_ready(jnp.asarray(inputs_np))

    h2d_ms = wall_per_call(h2d, iters=10)

    # d2h must fetch FRESH device buffers: jax arrays cache their host
    # copy, so re-fetching one array measures the cache, not the wire.
    gi_fn = jax.jit(lambda tr, inp: vg(tr, inp)[1][1])

    def d2h_batch():
        arrs = [
            jax.block_until_ready(gi_fn(trans_j, inputs_j + float(i)))
            for i in range(4)
        ]
        t0 = time.perf_counter()
        for a in arrs:
            np.asarray(a)
        return (time.perf_counter() - t0) / len(arrs) * 1e3

    d2h_batch()  # warm the jit
    d2h_ms = stats([d2h_batch() for _ in range(3)])

    row = {
        "exp": "torch_bridge_r5",
        "shape": f"T={T},B={B},N={N}",
        "native_fused_ms": native,
        "bridge_mean_ms": bridge_mean_ms,
        "bridge_none_ms": bridge_none_ms,
        "h2d_emissions_ms": h2d_ms,
        "d2h_grad_ms": d2h_ms,
        "scalar_fetch_ms": round(fetch_s * 1e3, 2),
        "emissions_mb": round(inputs_np.nbytes / 1e6, 2),
        "note": ("bridge walls are synchronous end-to-end (copies + "
                 "round-trips included); tunnel scalar round-trip floor "
                 "applies per trip on this stack"),
    }
    print(json.dumps(row))


if __name__ == "__main__":
    main()
