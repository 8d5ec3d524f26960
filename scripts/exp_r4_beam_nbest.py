"""Round-4: beam_nbest at wordpiece scale on-chip.

The docs claim beam n-best costs "one beam pass" (the forward is shared
with beam_decode; the extra work is n-1 more backtraces, O(T B n) lane
selects).  This measures beam_nbest(n=4, K=16) next to beam_decode(K=16)
at the SWEEP_r3 bigvocab shape (B=8, T=100, N=10000) and at the bench
letters shape, parity of rank 0 asserted on the spot.

Run: python scripts/exp_r4_beam_nbest.py   (real TPU)
"""

import os
import sys
import time as _time

_T0 = _time.time()


def _mark(s):
    print(f"[bnb {_time.time()-_T0:6.1f}s] {s}", file=sys.stderr, flush=True)


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SHAPES = [
    ("letters B=64,T=1000,N=30", 64, 1000, 30, 8),
    ("bigvocab B=8,T=100,N=10000", 8, 100, 10_000, 4),
]


def main():
    from torch_asg_tpu import beam_decode, beam_nbest
    from torch_asg_tpu.utils.profiling import fetch_overhead_s, time_fn_chained

    print("backend:", jax.default_backend(), flush=True)
    fetch_s = fetch_overhead_s()
    for label, b, t, n, chain_k in SHAPES:
        r = np.random.default_rng(0)
        inputs = jnp.asarray(r.normal(size=(t, b, n)), jnp.float32)
        # transition passed as a jit ARGUMENT (400 MB at N=10k)
        trans = jnp.asarray(r.normal(size=(n, n)) * 0.5, jnp.float32)
        li = jnp.asarray(r.integers(t // 2, t + 1, size=(b,)), jnp.int32)

        out = {}
        for name, fn in (
            ("beam_decode", lambda tr, i: beam_decode(tr, i, li, beam_size=16)),
            ("beam_nbest", lambda tr, i: beam_nbest(tr, i, 4, li, beam_size=16)),
        ):
            def chain(tr, inp, _fn=fn):
                def body(inp_c, _):
                    res = _fn(tr, inp_c)
                    s = res.scores.sum() + res.paths.sum().astype(
                        res.scores.dtype)
                    return inp_c + 0.0 * s, (res.scores, res.paths)
                inp_o, (scores, paths) = jax.lax.scan(
                    body, inp, None, length=chain_k)
                return inp_o, scores[-1], paths[-1]

            f = jax.jit(chain)
            _mark(f"compile {label} {name}")
            _, scores, paths = jax.block_until_ready(f(trans, inputs))
            # trans rides as a jit ARGUMENT of f (not a closure constant
            # in the HLO); only the emissions thread the feedback loop
            step = lambda inp: f(trans, inp)  # noqa: E731
            out[name] = (
                min(time_fn_chained(step, lambda x0, o: o[0], inputs,
                                    warmup=2, iters=12, fetch_s=fetch_s)
                    for _ in range(3)) * 1e3 / chain_k,
                np.asarray(scores), np.asarray(paths),
            )
        s1, sc1, p1 = out["beam_decode"]
        sn, scn, pn = out["beam_nbest"]
        assert np.allclose(scn[:, 0], sc1, rtol=1e-6), label
        assert np.array_equal(pn[:, :, 0], p1), label
        print(f"{label:28s} beam_decode {s1:8.3f} ms   beam_nbest(4) "
              f"{sn:8.3f} ms   overhead {sn/s1:4.2f}x", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
