"""Round-3 experiment: on-chip profiler-trace decomposition of the fused
fwd+bwd train step (VERDICT r2 next-round item 1).

Captures a jax.profiler trace around chained fused train-step dispatches
at the benchmark shape (B=64, T=1000, N=30), then parses the XSpace
protobuf directly (tensorflow's xplane proto — no TensorBoard UI needed)
and prints every device-timeline op >= 0.02 ms/step, so the ~0.15 ms the
round-2 decomposition bucketed as "value_and_grad/jit glue" gets named
stage by stage.

Usage:  python scripts/exp_r3_trace.py [outdir]
Writes: <outdir>/plugins/profile/... (raw trace) and prints the table.
"""

import sys
import time as _time

_T0 = _time.time()


def _mark(label):
    print(f"[trace {_time.time()-_T0:6.1f}s] {label}", file=sys.stderr, flush=True)


import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, T, S, N = 64, 1000, 50, 30
CHAIN_K = 8

# mode '10k': the bench's BASELINE-config-5 shape (impl='matmul'); the
# transition is 400 MB so it must be a jit ARGUMENT and the chain is
# short (57 ms/step needs no depth for resolution)
BIG_T, BIG_B, BIG_S, BIG_N, BIG_CHAIN = 100, 8, 10, 10_000, 2


def make_case(b, t, s, n, dtype=jnp.float32, scale=0.5):
    r = np.random.default_rng(0)
    inputs = jnp.asarray(r.normal(size=(t, b, n)), dtype)
    trans = jnp.asarray(r.normal(size=(n, n)) * scale, dtype)
    targets = jnp.asarray(r.integers(0, n, size=(b, s)), jnp.int32)
    li = jnp.asarray(r.integers(t // 2, t + 1, size=(b,)), jnp.int32)
    lo = jnp.asarray(r.integers(s // 2, s + 1, size=(b,)), jnp.int32)
    return trans, inputs, targets, li, lo


def build_chain(impl="fused"):
    from torch_asg_tpu import asg_loss

    big = impl == "matmul"
    trans, inputs, targets, li, lo = (
        make_case(BIG_B, BIG_T, BIG_S, BIG_N, scale=0.1) if big
        else make_case(B, T, S, N)
    )
    chain_k = BIG_CHAIN if big else CHAIN_K

    def vg(tr, inp):
        return jax.value_and_grad(
            lambda a, b: asg_loss(a, b, targets, li, lo,
                                  reduction="mean", impl=impl),
            argnums=(0, 1),
        )(tr, inp)

    def chain(tr, inp):
        def body(inp_c, _):
            loss, (gt, gi) = vg(tr, inp_c)
            return inp_c + 0.0 * gi, loss
        inp_o, losses = jax.lax.scan(body, inp, None, length=chain_k)
        return losses[-1], inp_o

    f = jax.jit(chain)
    return (lambda x: f(trans, x)), inputs, chain_k


def collect_device_events(trace_dir):
    """Aggregate (name -> total_us, count) of device-timeline events from
    the captured Chrome-format trace (vm.trace.json.gz); also returns the
    per-event args keyed by name for shape/bytes detail."""
    import glob
    import gzip
    import json
    import os

    paths = glob.glob(
        os.path.join(trace_dir, "plugins", "profile", "*", "*.trace.json.gz")
    )
    if not paths:
        return None, None
    agg = {}
    details = {}
    for p in paths:
        d = json.load(gzip.open(p))
        evs = d.get("traceEvents", [])
        device_pids = {
            e["pid"]
            for e in evs
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "TPU" in str(e.get("args", {}).get("name", ""))
        }
        for e in evs:
            if e.get("ph") == "X" and e.get("pid") in device_pids:
                name = e["name"]
                tot, cnt = agg.get(name, (0.0, 0))
                agg[name] = (tot + e.get("dur", 0), cnt + 1)
                if name not in details:
                    details[name] = e.get("args", {})
    return agg, details


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/asg_trace_r3"
    impl = sys.argv[2] if len(sys.argv) > 2 else "fused"
    if impl == "10k":
        impl = "matmul"
    _mark(f"build + compile {impl} chain")
    step, inputs, chain_k = build_chain(impl)
    out = step(inputs)  # compile
    float(out[0])
    _mark("warm steps")
    cur = inputs
    for _ in range(2):
        loss, cur = step(cur)
    float(loss)

    n_dispatch = 3  # dispatches x chain_k steps inside the trace window
    _mark(f"trace {n_dispatch} dispatches x {chain_k} steps")
    with jax.profiler.trace(outdir):
        cur = inputs
        for _ in range(n_dispatch):
            loss, cur = step(cur)
        float(loss)  # force completion inside the window
    _mark("parse trace")
    agg, details = collect_device_events(outdir)
    if not agg:
        print("NO DEVICE EVENTS CAPTURED — profiler does not reach the "
              "remote device timeline on this platform")
        return 1
    steps = n_dispatch * chain_k
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    print(f"{'us/step':>9} {'count':>7} name  [long_name]")
    total = 0.0
    skip = {"jit_chain", "while"}  # container events double-count children
    for name, (us, cnt) in rows:
        if any(name.startswith(s) for s in skip) or name in ("0", "1", "2"):
            continue
        us_step = us / steps
        total += us_step
        if us_step >= 1.0:
            long = str(details.get(name, {}).get("long_name", ""))[:90]
            print(f"{us_step:9.1f} {cnt:7d} {name[:40]}  {long}")
    print(f"sum of leaf events: {total:.1f} us/step (TPU timeline is "
          f"serial; compare against the bench wall-clock)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
