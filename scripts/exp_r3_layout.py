"""Round-3 layout-copy experiment: dot orientation of the one-hot
gather/scatter einsums.

ADJUDICATED (round 4, docs/PERF_R4.md §2): swapped orientation measured
GO (~15 us) and is now the unconditional default; the ASG_EINSUM_SWAP
env knob was deleted, so both legs of this script now measure the same
(production) configuration.  Kept as the timing harness of record.

PERF_R3 §3 names 110 us of XLA minor-dim layout copies around the
one-hot einsums as the one open lead.  The only source-level lever over
the copy's direction is the dot's operand orientation (dot_general
output order is batch, lhs-free, rhs-free; the compiler may or may not
canonicalize the swap away).  This measures the fused fwd+bwd chain at
the bench shape under both orientations (ASG_EINSUM_SWAP=0/1, separate
processes — the knob is read at trace time) and prints the go/no-go.

Run: python scripts/exp_r3_layout.py          (spawns both modes)
     python scripts/exp_r3_layout.py one      (this process's env only)
"""

import os
import subprocess
import sys
import time as _time

_T0 = _time.time()


def _mark(s):
    print(f"[lay {_time.time()-_T0:6.1f}s] {s}", file=sys.stderr, flush=True)


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAIN_K = 8
B, T, S, N = 64, 1000, 50, 30


def run_one():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from torch_asg_tpu import asg_loss
    from torch_asg_tpu.utils.profiling import fetch_overhead_s, time_fn_chained

    swap = os.environ.get("ASG_EINSUM_SWAP", "0")
    r = np.random.default_rng(0)
    inputs = jnp.asarray(r.normal(size=(T, B, N)), jnp.float32)
    trans = jnp.asarray(r.normal(size=(N, N)) * 0.5, jnp.float32)
    targets = jnp.asarray(r.integers(0, N, size=(B, S)), jnp.int32)
    li = jnp.asarray(r.integers(T // 2, T + 1, size=(B,)), jnp.int32)
    lo = jnp.asarray(r.integers(S // 2, S + 1, size=(B,)), jnp.int32)

    def vg(tr, inp):
        return jax.value_and_grad(
            lambda tr_, inp_: asg_loss(tr_, inp_, targets, li, lo,
                                       reduction="mean", impl="fused"),
            argnums=(0, 1),
        )(tr, inp)

    def chain(inp):
        def body(inp_c, _):
            loss, (gt, gi) = vg(trans, inp_c)
            return inp_c + 0.0 * gi, loss
        inp_o, losses = jax.lax.scan(body, inp, None, length=CHAIN_K)
        return losses[-1], inp_o

    f = jax.jit(chain)
    _mark(f"swap={swap} compile")
    out = f(inputs)
    loss0 = float(out[0])
    fetch_s = fetch_overhead_s()
    _mark(f"swap={swap} time (loss {loss0:.6f})")
    tt = min(
        time_fn_chained(f, lambda _, o: o[1], inputs,
                        warmup=2, iters=12, fetch_s=fetch_s)
        for _ in range(3)
    ) * 1e3 / CHAIN_K
    print(f"RESULT swap={swap} fused_ms={tt:.4f} loss={loss0:.6f}",
          flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        run_one()
        return 0
    for swap in ("0", "1"):
        env = dict(os.environ, ASG_EINSUM_SWAP=swap)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "one"],
            env=env, timeout=5400,
        )
        if r.returncode != 0:
            print(f"swap={swap} FAILED rc={r.returncode}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
