"""Round-3 experiment: Pallas rotation-trick Viterbi kernel go/no-go
(VERDICT r2 next-round item 2).

Measures viterbi_decode impl='xla' vs impl='pallas' (forward+backtrace,
the full production decode) at the benchmark shape and the sweep shapes,
with in-graph chained timing.  Parity is asserted on the spot.  Ship the
kernel as 'auto' if >= 1.3x, else commit the no-go memo.
"""

import sys
import time as _time

_T0 = _time.time()


def _mark(s):
    print(f"[vit {_time.time()-_T0:6.1f}s] {s}", file=sys.stderr, flush=True)


import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CHAIN_K = 8

SHAPES = [
    ("bench B=64,T=1000,N=30", 64, 1000, 30),
    ("letters-long B=16,T=3000,N=30", 16, 3000, 30),
    ("serving B=8,T=500,N=30", 8, 500, 30),
    ("wordpiece-small B=32,T=500,N=128", 32, 500, 128),
]


def measure(label, b, t, n, fetch_s):
    from torch_asg_tpu import viterbi_decode
    from torch_asg_tpu.utils.profiling import time_fn_chained

    r = np.random.default_rng(0)
    inputs = jnp.asarray(r.normal(size=(t, b, n)), jnp.float32)
    trans = jnp.asarray(r.normal(size=(n, n)) * 0.5, jnp.float32)
    li = jnp.asarray(r.integers(t // 2, t + 1, size=(b,)), jnp.int32)

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
        _, _, scores, paths = f(inputs)
        if ref is None:
            ref = (np.asarray(scores), np.asarray(paths))
        else:
            assert np.allclose(np.asarray(scores), ref[0], rtol=1e-5), label
            assert np.array_equal(np.asarray(paths), ref[1]), label
        _mark(f"time {label} {impl}")
        tt = min(
            time_fn_chained(f, lambda _, o: o[1], inputs,
                            warmup=2, iters=12, fetch_s=fetch_s)
            for _ in range(3)
        ) * 1e3 / CHAIN_K
        out[impl] = tt
    speedup = out["xla"] / out["pallas"]
    print(f"{label:36s} xla {out['xla']:8.3f} ms  pallas "
          f"{out['pallas']:8.3f} ms  speedup {speedup:5.2f}x", flush=True)
    return out


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
