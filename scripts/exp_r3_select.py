"""Round-3 follow-up: gather-free backtrace scans (one-hot row select).

Every backtrace scan (XLA decode path, n-best, forced alignment, both
streaming finalizers) used a per-step ``take_along_axis`` — a serialized
TPU gather that PERF_R3 §2 measured at ~1.7 us/step (73% of the whole
XLA decode).  ``_select_rows`` replaces it with an iota-compare + masked
sum.  This script measures, in-graph chained:

  * viterbi_decode impl='xla' at the bench shape (old recorded number:
    3.051 ms, PERF_R3 §2 table) — the N>128 production path;
  * viterbi_align at the bench shape (first recorded number);
  * viterbi_nbest k=4 at N=30 (first recorded number at letter scale).

Run: python scripts/exp_r3_select.py  (real TPU)
"""

import os
import sys
import time as _time

_T0 = _time.time()


def _mark(s):
    print(f"[sel {_time.time()-_T0:6.1f}s] {s}", file=sys.stderr, flush=True)


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CHAIN_K = 8
B, T, S, N = 64, 1000, 50, 30


def _timed(f, inputs, fetch_s, label):
    from torch_asg_tpu.utils.profiling import time_fn_chained

    _mark(f"compile {label}")
    f(inputs)
    _mark(f"time {label}")
    tt = min(
        time_fn_chained(f, lambda _, o: o[1], inputs,
                        warmup=2, iters=12, fetch_s=fetch_s)
        for _ in range(3)
    ) * 1e3 / CHAIN_K
    print(f"{label:32s} {tt:8.3f} ms", flush=True)
    return tt


def main():
    from torch_asg_tpu import viterbi_align, viterbi_decode, viterbi_nbest
    from torch_asg_tpu.utils.profiling import fetch_overhead_s

    print("backend:", jax.default_backend(), flush=True)
    fetch_s = fetch_overhead_s()
    r = np.random.default_rng(0)
    inputs = jnp.asarray(r.normal(size=(T, B, N)), jnp.float32)
    trans = jnp.asarray(r.normal(size=(N, N)) * 0.5, jnp.float32)
    targets = jnp.asarray(r.integers(0, N, size=(B, S)), jnp.int32)
    li = jnp.asarray(r.integers(T // 2, T + 1, size=(B,)), jnp.int32)
    lo = jnp.asarray(r.integers(S // 2, S + 1, size=(B,)), jnp.int32)

    def dec_chain(inp):
        def body(inp_c, _):
            res = viterbi_decode(trans, inp_c, li, impl="xla")
            return inp_c + 0.0 * res.scores.sum(), (res.scores, res.paths)
        inp_o, (sc, pa) = jax.lax.scan(body, inp, None, length=CHAIN_K)
        return sc[-1].sum(), inp_o, pa[-1]

    def make_align_chain(impl):
        def align_chain(inp):
            def body(inp_c, _):
                res = viterbi_align(trans, inp_c, targets, li, lo, impl=impl)
                return inp_c + 0.0 * res.scores.sum(), (res.scores, res.labels)
            inp_o, (sc, la) = jax.lax.scan(body, inp, None, length=CHAIN_K)
            return sc[-1].sum(), inp_o, la[-1]
        return align_chain

    def nbest_chain(inp):
        def body(inp_c, _):
            res = viterbi_nbest(trans, inp_c, 4, li)
            return inp_c + 0.0 * res.scores.sum(), (res.scores, res.paths)
        inp_o, (sc, pa) = jax.lax.scan(body, inp, None, length=CHAIN_K)
        return sc[-1].sum(), inp_o, pa[-1]

    _timed(jax.jit(dec_chain), inputs, fetch_s, "xla decode (select bt)")
    _timed(jax.jit(make_align_chain("xla")), inputs, fetch_s,
           "viterbi_align xla")
    _timed(jax.jit(make_align_chain("pallas")), inputs, fetch_s,
           "viterbi_align pallas")
    _timed(jax.jit(nbest_chain), inputs, fetch_s, "viterbi_nbest k=4")
    return 0


if __name__ == "__main__":
    sys.exit(main())
