"""Serving-surface benchmark sweep: streaming, large-vocab decode, WFSA.

VERDICT r2 next-round item 4: the streaming and WFSA surfaces (the
"beyond the reference" serving capabilities) had zero on-chip numbers.
One JSON line per row, in-graph chained timing (see bench.py /
docs/PERF_R2.md for why anything else lies through this tunnel):

  * streaming_update / streaming_viterbi_update per-chunk latency at a
    realistic serving shape (B=8, chunk=16) for N=30 and N=512, with
    ``streaming_targets`` precompute (the advertised serving fast path);
  * viterbi_decode + viterbi_nbest(k=4) at N=10k (the chunked max-plus
    path past _CHUNK_MIN_LABELS — no recorded number existed above 512);
  * wfsa_score / wfsa_viterbi on a lexicon-scale graph (E ~ 5k arcs).

Run: python benchmarks/serving_sweep.py  (real TPU; several minutes)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time as _time

_T0 = _time.time()


def _mark(s):
    print(f"[serv {_time.time()-_T0:6.1f}s] {s}", file=sys.stderr, flush=True)


import jax
import jax.numpy as jnp
import numpy as np

CHAIN_K = 8


def _best(fn, x0, feedback, fetch_s, iters=12, repeats=3, steps=CHAIN_K):
    from torch_asg_tpu.utils.profiling import time_fn_chained

    return min(
        time_fn_chained(fn, feedback, x0, warmup=2, iters=iters,
                        fetch_s=fetch_s)
        for _ in range(repeats)
    ) * 1e3 / steps


STREAM_CHAIN = 512  # per-chunk cost is ~30 us; an 8-step chain cannot
# resolve it against the ~25 ms tunnel fetch (the first sweep attempt
# read N=512 "faster" than N=30 — pure noise).  512 chained updates put
# ~15 ms of real work in each dispatch.


def bench_streaming(num_labels, fetch_s):
    """Per-chunk latency of the streaming scorer and streaming Viterbi,
    stream_targets precomputed (the long-running-loop fast path)."""
    from torch_asg_tpu.ops.streaming import (
        streaming_init, streaming_targets, streaming_update,
        streaming_viterbi_init, streaming_viterbi_update,
    )

    b, t_c, s = 8, 16, 24
    r = np.random.default_rng(0)
    trans = jnp.asarray(r.normal(size=(num_labels, num_labels)) * 0.5,
                        jnp.float32)
    targets = jnp.asarray(r.integers(0, num_labels, size=(b, s)), jnp.int32)
    lo = jnp.full((b,), s, jnp.int32)
    chunk = jnp.asarray(r.normal(size=(t_c, b, num_labels)), jnp.float32)
    pre = streaming_targets(trans, targets, num_labels, lo)

    st0 = streaming_init(b, num_labels, s)

    def score_chain(chunk_in, st_in):
        def body(carry, _):
            st, ck = carry
            st = streaming_update(trans, st, ck, stream_targets=pre)
            # thread the chunk through the state so nothing hoists
            ck = ck + 0.0 * st.alpha_full[0, 0]
            return (st, ck), None
        (st, ck), _ = jax.lax.scan(body, (st_in, chunk_in), None,
                                   length=STREAM_CHAIN)
        return st, ck

    f = jax.jit(score_chain)
    _mark(f"compile streaming scores N={num_labels}")
    f(chunk, st0)
    t_scores = _best(
        lambda ck: f(ck, st0), chunk, lambda _, out: out[1], fetch_s,
        steps=STREAM_CHAIN,
    )

    vst0 = streaming_viterbi_init(b, num_labels)

    def vit_chain(chunk_in, st_in):
        def body(carry, _):
            st, ck = carry
            st, (bp, valid) = streaming_viterbi_update(trans, st, ck)
            # thread bp too — a bp-free chain lets XLA DCE the backpointer
            # computation (the r2 decode bench fell to exactly that)
            ck = ck + 0.0 * (st.delta[0, 0] + bp.sum().astype(ck.dtype))
            return (st, ck), None
        (st, ck), _ = jax.lax.scan(body, (st_in, chunk_in), None,
                                   length=STREAM_CHAIN)
        return st, ck

    v = jax.jit(vit_chain)
    _mark(f"compile streaming viterbi N={num_labels}")
    v(chunk, vst0)
    t_vit = _best(
        lambda ck: v(ck, vst0), chunk, lambda _, out: out[1], fetch_s,
        steps=STREAM_CHAIN,
    )
    print(json.dumps({
        "row": "streaming",
        "shape": {"B": b, "chunk": t_c, "S": s, "N": num_labels},
        "scores_update_ms_per_chunk": round(t_scores, 3),
        "viterbi_update_ms_per_chunk": round(t_vit, 3),
        "scores_us_per_frame": round(t_scores / t_c * 1e3, 1),
        "note": f"stream_targets precomputed; {STREAM_CHAIN} chained "
                "updates per dispatch, chunk+bp threaded in-graph",
        "backend": jax.default_backend(),
    }), flush=True)


def bench_streaming_beam(fetch_s):
    """Per-chunk latency of the streaming BEAM decoder at wordpiece
    scale (N=10k, K=16) — the online large-vocab serving path the exact
    streaming Viterbi (O(N^2) per frame) cannot serve."""
    from torch_asg_tpu.ops.streaming import (
        streaming_beam_init, streaming_beam_update,
    )

    b, t_c, n, k = 8, 16, 10_000, 16
    chain = 64  # N=10k chunks are ~100x the N=30 work; shorter chain
    r = np.random.default_rng(0)
    trans = jnp.asarray(r.normal(size=(n, n)) * 0.5, jnp.float32)
    chunk = jnp.asarray(r.normal(size=(t_c, b, n)), jnp.float32)
    st0 = streaming_beam_init(b, k)

    # trans is 400 MB at N=10k: it MUST be a jit argument — as a closure
    # constant it bakes into the HLO body and the remote-compile tunnel
    # chokes on it (observed: the r4 first sweep attempt hung 15+ min
    # uploading it; CLAUDE.md's HTTP-413 trap).
    def beam_chain(tr, chunk_in, st_in):
        def body(carry, _):
            st, ck = carry
            st, (lab, bp, valid) = streaming_beam_update(tr, st, ck)
            # thread labels+bps so the slot bookkeeping cannot DCE
            ck = ck + 0.0 * (st.delta[0, 0]
                             + (lab.sum() + bp.sum()).astype(ck.dtype))
            return (st, ck), None
        (st, ck), _ = jax.lax.scan(body, (st_in, chunk_in), None,
                                   length=chain)
        return st, ck

    f = jax.jit(beam_chain)
    _mark(f"compile streaming beam N={n}")
    f(trans, chunk, st0)
    t_beam = _best(
        lambda ck: f(trans, ck, st0), chunk, lambda _, out: out[1], fetch_s,
        steps=chain,
    )
    print(json.dumps({
        "row": "streaming_beam",
        "shape": {"B": b, "chunk": t_c, "N": n, "K": k},
        "beam_update_ms_per_chunk": round(t_beam, 3),
        "beam_us_per_frame": round(t_beam / t_c * 1e3, 1),
        "note": f"{chain} chained updates per dispatch, "
                "labels+bps threaded in-graph",
        "backend": jax.default_backend(),
    }), flush=True)


def bench_bigvocab_decode(fetch_s):
    """Decode + n-best at wordpiece scale (N=10k, chunked max-plus)."""
    from torch_asg_tpu import viterbi_decode, viterbi_nbest

    b, t, n, k = 8, 100, 10_000, 4
    r = np.random.default_rng(1)
    inputs = jnp.asarray(r.normal(size=(t, b, n)), jnp.float32)
    trans = jnp.asarray(r.normal(size=(n, n)) * 0.1, jnp.float32)
    li = jnp.full((b,), t, jnp.int32)

    def dec_chain(tr, inp):
        def body(inp_c, _):
            res = viterbi_decode(tr, inp_c, li, impl="xla")
            # thread paths too: a scores-only chain DCEs the backtrace
            # (the r2 decode bench fell to exactly that)
            s = res.scores.sum() + res.paths.sum().astype(res.scores.dtype)
            return inp_c + 0.0 * s, s
        inp_o, ss = jax.lax.scan(body, inp, None, length=2)
        return ss[-1], inp_o

    f = jax.jit(dec_chain)
    _mark("compile 10k decode")
    f(trans, inputs)
    t_dec = _best(lambda i: f(trans, i), inputs, lambda _, o: o[1],
                  fetch_s, iters=3, repeats=2) * CHAIN_K / 2

    def nb_chain(tr, inp):
        def body(inp_c, _):
            res = viterbi_nbest(tr, inp_c, k, li)
            s = res.scores.sum() + res.paths.sum().astype(res.scores.dtype)
            return inp_c + 0.0 * s, s
        inp_o, ss = jax.lax.scan(body, inp, None, length=2)
        return ss[-1], inp_o

    g = jax.jit(nb_chain)
    _mark("compile 10k nbest")
    g(trans, inputs)
    t_nb = _best(lambda i: g(trans, i), inputs, lambda _, o: o[1],
                 fetch_s, iters=3, repeats=2) * CHAIN_K / 2

    from torch_asg_tpu import beam_decode

    def beam_chain(tr, inp):
        def body(inp_c, _):
            res = beam_decode(tr, inp_c, li, beam_size=16)
            s = res.scores.sum() + res.paths.sum().astype(res.scores.dtype)
            return inp_c + 0.0 * s, s
        inp_o, ss = jax.lax.scan(body, inp, None, length=CHAIN_K)
        return ss[-1], inp_o

    h = jax.jit(beam_chain)
    _mark("compile 10k beam_decode")
    h(trans, inputs)
    t_beam = _best(lambda i: h(trans, i), inputs, lambda _, o: o[1],
                   fetch_s, iters=6, repeats=2)
    print(json.dumps({
        "row": "bigvocab_decode",
        "shape": {"B": b, "T": t, "N": n, "k": k, "beam": 16},
        "viterbi_decode_ms": round(t_dec, 1),
        "viterbi_nbest_ms": round(t_nb, 1),
        "beam_decode_ms": round(t_beam, 2),
        "us_per_frame_decode": round(t_dec / t * 1e3, 1),
        "backend": jax.default_backend(),
    }), flush=True)


def bench_align(fetch_s):
    """Forced alignment: one-shot kernel-vs-XLA at the bench shape plus
    streaming per-chunk update latency (the r3 additions had no on-chip
    number — same discipline as the decode kernel's go/no-go)."""
    from torch_asg_tpu import viterbi_align
    from torch_asg_tpu.ops.streaming import (
        streaming_align_init, streaming_align_update, streaming_targets,
    )

    b, t, n, s = 64, 1000, 30, 50
    r = np.random.default_rng(2)
    inputs = jnp.asarray(r.normal(size=(t, b, n)), jnp.float32)
    trans = jnp.asarray(r.normal(size=(n, n)) * 0.5, jnp.float32)
    targets = jnp.asarray(r.integers(0, n, size=(b, s)), jnp.int32)
    li = jnp.full((b,), t, jnp.int32)
    lo = jnp.full((b,), s, jnp.int32)

    times = {}
    for impl in ("pallas", "xla"):
        def al_chain(tr, inp, _impl=impl):
            def body(inp_c, _):
                res = viterbi_align(tr, inp_c, targets, li, lo, impl=_impl)
                # thread positions too: a scores-only chain would DCE the
                # backtrace (the r2 decode bench fell to exactly that)
                sc = (res.scores.sum()
                      + res.positions.sum().astype(res.scores.dtype))
                return inp_c + 0.0 * sc, sc
            inp_o, ss = jax.lax.scan(body, inp, None, length=CHAIN_K)
            return ss[-1], inp_o

        f = jax.jit(al_chain)
        _mark(f"compile align {impl}")
        f(trans, inputs)
        times[impl] = _best(lambda i: f(trans, i), inputs,
                            lambda _, o: o[1], fetch_s)

    # streaming forced alignment at the serving shape
    b2, t_c, s2, n2 = 8, 16, 24, 30
    targets2 = jnp.asarray(r.integers(0, n2, size=(b2, s2)), jnp.int32)
    lo2 = jnp.full((b2,), s2, jnp.int32)
    trans2 = jnp.asarray(r.normal(size=(n2, n2)) * 0.5, jnp.float32)
    chunk = jnp.asarray(r.normal(size=(t_c, b2, n2)), jnp.float32)
    pre = streaming_targets(trans2, targets2, n2, lo2)
    st0 = streaming_align_init(b2, s2)

    def al_stream(chunk_in, st_in):
        def body(carry, _):
            st, ck = carry
            st, (adv, valid) = streaming_align_update(
                trans2, st, ck, stream_targets=pre)
            ck = ck + 0.0 * (st.delta[0, 0]
                             + adv.sum().astype(ck.dtype))
            return (st, ck), None
        (st, ck), _ = jax.lax.scan(body, (st_in, chunk_in), None,
                                   length=STREAM_CHAIN)
        return st, ck

    g = jax.jit(al_stream)
    _mark("compile streaming align")
    g(chunk, st0)
    t_stream = _best(lambda ck: g(ck, st0), chunk, lambda _, out: out[1],
                     fetch_s, steps=STREAM_CHAIN)
    print(json.dumps({
        "row": "forced_align",
        "shape": {"B": b, "T": t, "N": n, "S": s},
        "align_pallas_ms": round(times["pallas"], 3),
        "align_xla_ms": round(times["xla"], 3),
        "speedup": round(times["xla"] / max(times["pallas"], 1e-9), 2),
        "stream_shape": {"B": b2, "chunk": t_c, "S": s2, "N": n2},
        "stream_update_ms_per_chunk": round(t_stream, 3),
        "backend": jax.default_backend(),
    }), flush=True)


def bench_wfsa(fetch_s):
    """Lexicon-scale acceptor scoring/decoding (E ~ 5k arcs)."""
    from torch_asg_tpu.ops.wfsa import lexicon_wfsa, wfsa_score, wfsa_viterbi

    n, words_count, b, t = 30, 800, 8, 200
    r = np.random.default_rng(2)
    trans = jnp.asarray(r.normal(size=(n, n)) * 0.5, jnp.float32)
    words = [
        r.integers(0, n, size=int(r.integers(2, 5))).astype(np.int32)
        for _ in range(words_count)
    ]
    # loop=False: the continuous-recognition loop adds words^2 arcs (640k
    # here), a different graph scale; the VERDICT row asks for E ~ 5k
    fsa = lexicon_wfsa(trans, words, loop=False)
    inputs = jnp.asarray(r.normal(size=(t, b, n)), jnp.float32)
    li = jnp.full((b,), t, jnp.int32)
    num_arcs = int(fsa.src.shape[0])

    def score_chain(inp):
        def body(inp_c, _):
            s = wfsa_score(fsa, inp_c, li).sum()
            return inp_c + 0.0 * s, s
        inp_o, ss = jax.lax.scan(body, inp, None, length=CHAIN_K)
        return ss[-1], inp_o

    f = jax.jit(score_chain)
    _mark(f"compile wfsa score (E={num_arcs})")
    f(inputs)
    t_score = _best(f, inputs, lambda _, o: o[1], fetch_s)

    def vit_chain(inp):
        def body(inp_c, _):
            res = wfsa_viterbi(fsa, inp_c, li)
            s = (res.scores.sum()
                 + res.labels.sum().astype(res.scores.dtype)
                 + res.states.sum().astype(res.scores.dtype))
            return inp_c + 0.0 * s, s
        inp_o, ss = jax.lax.scan(body, inp, None, length=2)
        return ss[-1], inp_o

    g = jax.jit(vit_chain)
    _mark("compile wfsa viterbi")
    g(inputs)
    t_vit = _best(g, inputs, lambda _, o: o[1], fetch_s,
                  iters=6, repeats=2) * CHAIN_K / 2

    # online form: per-chunk latency of the streaming WFSA best-path
    # decoder on the same lexicon graph (serving chunk shape)
    from torch_asg_tpu.ops.streaming import (
        streaming_wfsa_viterbi_init, streaming_wfsa_viterbi_update,
    )

    t_c = 16
    chunk = jnp.asarray(r.normal(size=(t_c, b, n)), jnp.float32)
    st0 = streaming_wfsa_viterbi_init(fsa, b)
    chain = 64

    def swv_chain(chunk_in, st_in):
        def body(carry, _):
            st, ck = carry
            st, (bk, v) = streaming_wfsa_viterbi_update(fsa, st, ck)
            # thread backs so the arc bookkeeping cannot DCE
            ck = ck + 0.0 * (st.delta[0, 0] + bk.sum().astype(ck.dtype))
            return (st, ck), None
        (st, ck), _ = jax.lax.scan(body, (st_in, chunk_in), None,
                                   length=chain)
        return st, ck

    h = jax.jit(swv_chain)
    _mark("compile streaming wfsa viterbi")
    h(chunk, st0)
    t_swv = _best(
        lambda ck: h(ck, st0), chunk, lambda _, out: out[1], fetch_s,
        steps=chain,
    )
    print(json.dumps({
        "row": "wfsa_lexicon",
        "shape": {"B": b, "T": t, "N": n, "states": int(fsa.num_states),
                  "arcs": num_arcs, "words": words_count, "loop": False},
        "wfsa_score_ms": round(t_score, 2),
        "wfsa_viterbi_ms": round(t_vit, 2),
        "streaming_viterbi_ms_per_chunk16": round(t_swv, 3),
        "backend": jax.default_backend(),
    }), flush=True)


def main():
    from torch_asg_tpu.utils.profiling import fetch_overhead_s

    print("backend:", jax.default_backend(), file=sys.stderr, flush=True)
    fetch_s = fetch_overhead_s()
    bench_streaming(30, fetch_s)
    bench_streaming(512, fetch_s)
    bench_streaming_beam(fetch_s)
    bench_bigvocab_decode(fetch_s)
    bench_wfsa(fetch_s)
    bench_align(fetch_s)
    return 0


if __name__ == "__main__":
    sys.exit(main())
