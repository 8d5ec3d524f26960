"""Round-4 experiment: Viterbi decode coverage for 128 < N <= 512
(VERDICT r3 next-round item 4).

The rotation-trick kernel (ops/pallas/viterbi_kernels.py) is generic in
N — VITERBI_KERNEL_MAX_LABELS=128 is pure dispatch policy, set where the
measured speedup had degraded to 1.96x (N=128) with no number past it.
This measures BOTH tiers at N=256 and N=512 (B=32, T=500, the wordpiece
shape family from exp_r3_vit.py) with the cap lifted for the kernel,
asserting parity on the spot.  GO = raise the cap to where speedup stays
>= 1.3x; NO-GO = commit the measured crossover in PERF docs.

Run: python scripts/exp_r4_vit_wide.py  (real TPU; compile time for the
static N-rotation unroll is itself a go/no-go axis — logged per shape).
"""

import sys
import time as _time

_T0 = _time.time()


def _mark(s):
    print(f"[vitw {_time.time()-_T0:6.1f}s] {s}", file=sys.stderr, flush=True)


import os as _os

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CHAIN_K = 8

SHAPES = [
    ("wordpiece N=256 B=32,T=500", 32, 500, 256),
    ("wordpiece N=512 B=32,T=500", 32, 500, 512),
]


def measure(label, b, t, n, fetch_s):
    from torch_asg_tpu import viterbi_decode
    from torch_asg_tpu.ops.pallas import viterbi_kernels as vk
    from torch_asg_tpu.utils.profiling import time_fn_chained

    r = np.random.default_rng(0)
    inputs = jnp.asarray(r.normal(size=(t, b, n)), jnp.float32)
    trans = jnp.asarray(r.normal(size=(n, n)) * 0.5, jnp.float32)
    li = jnp.asarray(r.integers(t // 2, t + 1, size=(b,)), jnp.int32)

    cap = vk.VITERBI_KERNEL_MAX_LABELS
    vk.VITERBI_KERNEL_MAX_LABELS = 1024  # lift for the experiment only
    try:
        out = {}
        ref = None
        for impl in ("xla", "pallas"):
            def chain(inp, _impl=impl):
                def body(inp_c, _):
                    res = viterbi_decode(trans, inp_c, li, impl=_impl)
                    s = res.scores.sum()
                    return inp_c + 0.0 * s, (res.scores, res.paths)
                inp_o, (scores, paths) = jax.lax.scan(
                    body, inp, None, length=CHAIN_K
                )
                return scores[-1].sum(), inp_o, scores[-1], paths[-1]

            f = jax.jit(chain)
            _mark(f"compile {label} {impl}")
            c0 = _time.time()
            try:
                _, _, scores, paths = jax.block_until_ready(f(inputs))
            except Exception as e:  # the N=512 kernel VMEM-OOMs at compile
                msg = str(e).splitlines()[-1][:200]
                print(f"{label:30s} {impl} FAILED to compile/run: {msg}",
                      flush=True)
                out[impl] = None
                continue
            compile_s = _time.time() - c0
            _mark(f"compiled {label} {impl} in {compile_s:.0f}s")
            if ref is None:
                ref = (np.asarray(scores), np.asarray(paths))
            else:
                assert np.allclose(np.asarray(scores), ref[0], rtol=1e-5), label
                assert np.array_equal(np.asarray(paths), ref[1]), label
            tt = min(
                time_fn_chained(f, lambda _, o: o[1], inputs,
                                warmup=2, iters=12, fetch_s=fetch_s)
                for _ in range(3)
            ) * 1e3 / CHAIN_K
            out[impl] = tt
            out[impl + "_compile_s"] = compile_s
            print(f"{label:30s} {impl:6s} {tt:8.3f} ms  "
                  f"(compile {compile_s:.0f}s)", flush=True)
        if out.get("xla") and out.get("pallas"):
            print(f"{label:30s} speedup {out['xla']/out['pallas']:5.2f}x",
                  flush=True)
        return out
    finally:
        vk.VITERBI_KERNEL_MAX_LABELS = cap


def main():
    from torch_asg_tpu.utils.profiling import fetch_overhead_s

    print("backend:", jax.default_backend(), flush=True)
    fetch_s = fetch_overhead_s()
    want = sys.argv[1] if len(sys.argv) > 1 else None
    for label, b, t, n in SHAPES:
        if want and want not in label:
            continue
        measure(label, b, t, n, fetch_s)
    return 0


if __name__ == "__main__":
    sys.exit(main())
