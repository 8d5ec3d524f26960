"""Benchmark: ASG fwd+bwd frames/sec/chip at the BASELINE.json config
(B=64, T=1000, N=30 letter vocab), run on the real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

The reference publishes no benchmark numbers (README.md:27-34 roadmap item
unchecked; see BASELINE.md), so vs_baseline compares the fused Pallas
kernel against this repo's own XLA lax.scan implementation on the same
chip — the honest stand-in for "the same math without the custom kernels".

Correctness gates run first (a failed gate reports value 0):
  1. fused vs scan at production precision (CHAIN_PRECISION=DEFAULT,
     one bf16 MXU pass), wide tolerances;
  2. fused at Precision.HIGHEST vs scan, TIGHT tolerances — so a
     DEFAULT-precision rounding regression cannot hide inside gate 1.

Timing methodology (round 2 — see scripts/exp_r2_chain.py): every
dispatch runs CHAIN_K data-dependent steps inside one jit (lax.scan with
the loop carry threaded through each step's gradient), and the loop is
closed by fetching a scalar to the host.  Through remote-TPU tunnels,
plain dispatch timing lies in BOTH directions: block_until_ready can
acknowledge early (impossibly fast numbers), and any host-side feedback
op between iterations costs a ~0.3-1 ms dispatch floor (inflated
round-1 numbers).  In-graph chaining removes both.  The chain threads
INPUTS (not just the transition) so XLA cannot hoist the emission
gathers out of the loop — each step pays the full production data path.

Roofline accounting: the JSON reports the analytic HBM bytes the fused
fwd+bwd moves (raw-width streams, see ops/pallas/asg_kernels.py), the
achieved bandwidth fraction against a bandwidth anchor measured in-run,
and the serial-chain latency floor (2T dependent MXU dots; per-step
latency measured by scripts/exp_r2_chain.py's bare dot chain).
"""

import json
import sys
import time as _time

_T0 = _time.time()


def _mark(label):
    print(f"[bench {_time.time()-_T0:6.1f}s] {label}", file=sys.stderr, flush=True)

import jax
import jax.numpy as jnp
import numpy as np

B, T, S, N = 64, 1000, 50, 30
CHAIN_K = 8  # in-graph steps per dispatch
WARMUP, ITERS = 2, 12  # dispatches (each = CHAIN_K steps)
# >=7 repeats with median + spread reported (VERDICT r4 item 1): the r4
# round showed ~0.05 ms cross-run disagreement on the 0.9 ms step and
# ~23% on the in-run walk floor, so best-of-3 alone cannot support
# round-over-round comparisons at the granularity being claimed.
REPEATS = 7
# Floors are MEASURED IN-RUN (measure_dot_chain_ns / measure_walk_ns
# below) so a compiler/runtime update cannot silently stale them; the
# round-2 hardcoded constants were 78.0 (bare dot) and 270.0 (walk).

BIG_N = 10_000  # BASELINE config 5: wordpiece-scale vocabulary
BIG_T, BIG_B, BIG_S = 100, 8, 10


def make_case(dtype=jnp.float32):
    r = np.random.default_rng(0)
    inputs = jnp.asarray(r.normal(size=(T, B, N)), dtype)
    trans = jnp.asarray(r.normal(size=(N, N)) * 0.5, dtype)
    targets = jnp.asarray(r.integers(0, N, size=(B, S)), jnp.int32)
    li = jnp.asarray(r.integers(T // 2, T + 1, size=(B,)), jnp.int32)
    lo = jnp.asarray(r.integers(S // 2, S + 1, size=(B,)), jnp.int32)
    return trans, inputs, targets, li, lo


def stats_of(fn, x0, feedback, fetch_s, iters=ITERS, repeats=REPEATS,
             per=1.0):
    """Repeated chained loops; per-UNIT milliseconds (unit = chain/``per``).

    Returns {"best", "median", "spread"} in ms: round-4 showed ~0.05 ms
    cross-run disagreement on the headline step and 23% on the in-run
    walk floor, so single best-of numbers cannot support the
    round-over-round deltas being claimed — the JSON now carries the
    distribution (VERDICT r4 item 1).
    """
    import statistics

    from torch_asg_tpu.utils.profiling import time_fn_chained

    obs = sorted(
        time_fn_chained(fn, feedback, x0, warmup=WARMUP, iters=iters,
                        fetch_s=fetch_s) * 1e3 / per
        for _ in range(repeats)
    )
    return {
        "best": obs[0],
        "median": statistics.median(obs),
        "spread": obs[-1] - obs[0],
    }


def measured_bandwidth(fetch_s):
    """Achieved HBM GB/s on a chained 256 MB elementwise pass: each step
    moves 3 x 256 MB (full read for the sum barrier + read-modify-write
    for the add)."""
    from torch_asg_tpu.utils.profiling import time_fn_chained

    # 256 MB so the chained loop dwarfs the ~30 ms scalar-fetch cost
    x = jnp.ones((64 * 1024 * 1024,), jnp.float32)

    def chain(v):
        def body(c, _):
            # the scalar sum() makes each pass depend on ALL of the
            # previous one, so XLA cannot fuse the CHAIN_K passes into a
            # single read-modify-write sweep (which would overstate
            # bandwidth by CHAIN_K times)
            return c + (1e-30 * jnp.sum(c)), None
        c, _ = jax.lax.scan(body, v, None, length=CHAIN_K)
        return c

    f = jax.jit(chain)
    f(x)
    t = min(
        time_fn_chained(f, lambda _, out: out, x, warmup=2, iters=12,
                        fetch_s=fetch_s)
        for _ in range(2)
    ) / CHAIN_K
    # per iteration: one full read (the sum), one read+write (the add)
    return (3 * x.nbytes) / t / 1e9


def measure_dot_chain_ns(fetch_s):
    """Bare dependent-MXU-dot latency, ns/step: T serial (B_pad, N_pad) @
    (N_pad, N_pad) dots in a Pallas kernel, chained CHAIN_K deep in-graph.
    This is the latency floor a recursion step cannot beat on this chip
    (replaces the round-2 hardcoded 78 ns)."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from torch_asg_tpu.ops.pallas import asg_kernels as ak
    from torch_asg_tpu.ops.pallas.common import LANE, SUBLANE, round_up
    from torch_asg_tpu.utils.profiling import time_fn_chained

    kb = ak.ASG_TIME_BLOCK
    b_pad = round_up(B, SUBLANE)
    n_pad = round_up(N, LANE)

    def kern(e_ref, x_ref, out_ref, acc_c):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            acc_c[:] = x_ref[:]

        acc = acc_c[:]
        e = e_ref[:]
        for _ in range(kb):
            acc = ak._dot(acc, e, acc.dtype)
        acc_c[:] = acc

        @pl.when(k == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = acc

    # spectral-radius ~1 so T chained matmuls neither overflow nor die
    e = jnp.exp(
        jnp.asarray(
            np.random.default_rng(1).normal(size=(n_pad, n_pad)), jnp.float32
        ) * 0.01 - 1.0
    )
    x0 = jnp.ones((b_pad, n_pad), jnp.float32) / n_pad
    dc = pl.pallas_call(
        kern,
        grid=(T // kb,),
        in_specs=[
            pl.BlockSpec((n_pad, n_pad), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, n_pad), lambda k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (b_pad, n_pad), lambda k: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b_pad, n_pad), jnp.float32)],
    )

    def chain(e_, x):
        def body(x_c, _):
            return dc(e_, x_c), None
        x_o, _ = jax.lax.scan(body, x, None, length=CHAIN_K)
        return x_o

    f = jax.jit(chain)
    f(e, x0)
    # The bare chain is only ~30 us per dispatch; at 12 iters the loop
    # (~3 ms) drowns in the ~26 ms fetch jitter and the subtraction can
    # even go negative (r5 observed a 0.0 'best').  48 iters puts the
    # loop above the noise.
    obs = sorted(
        time_fn_chained(lambda x: f(e, x), lambda _, out: out, x0,
                        warmup=2, iters=4 * ITERS, fetch_s=fetch_s)
        / CHAIN_K / T * 1e9
        for _ in range(5)
    )
    return {"best": obs[0], "median": obs[len(obs) // 2],
            "spread": obs[-1] - obs[0]}


def measure_walk_ns(trans, inputs, targets, li, lo, fetch_s):
    """The both-chain walk AS BUILT, ns/step: the production store-less
    fwd kernel (FCC exp-domain dot+rescale interleaved with the FAC
    log-domain 2-way band step) chained on pre-prepared operands — no
    prep einsum, no residual stores.  2*T of this walk is the binding
    serial constraint of the fused fwd+bwd (docs/PERF_R2.md §2); measured
    in-run (replaces the round-2 hardcoded 270 ns)."""
    from torch_asg_tpu.ops.pallas import asg_kernels as ak
    from torch_asg_tpu.utils.profiling import time_fn_chained

    from torch_asg_tpu.ops.pallas.common import LANE, round_up

    lat, ip, ap, e, e_t, self_p, next_p, li_col, lo_col, c, dims = jax.jit(
        lambda tr, i: ak._prepare(tr, i, targets, li, lo)
    )(trans, inputs)
    # static geometry (the jit-returned dims are traced scalars, which the
    # kernel cannot capture as compile-time constants)
    geom = (
        N,
        round_up(max(N, LANE), LANE),
        round_up(max(S, LANE), LANE),
    )

    def chain(e_, ip_, ap_):
        def body(e_c, _):
            sful, sfac = ak._run_fwd(
                li_col, lo_col, e_c, self_p, next_p, ip_, ap_, geom,
                store=False,
            )
            # nan_to_num: sfac can be -inf for unalignable pads; 0*(-inf)
            # would poison the chained carry
            e_n = e_c + jnp.nan_to_num(0.0 * (sful[0, 0] + sfac[0, 0]))
            return e_n, None
        e_o, _ = jax.lax.scan(body, e_, None, length=CHAIN_K)
        return e_o

    f = jax.jit(chain)
    f(e, ip, ap)
    # 24 iters: each dispatch is ~1.7 ms of walk, so the loop must sit
    # well above the ~26 ms fetch jitter (same rationale as the dot chain)
    obs = sorted(
        time_fn_chained(lambda e_: f(e_, ip, ap), lambda _, out: out, e,
                        warmup=2, iters=2 * ITERS, fetch_s=fetch_s)
        / CHAIN_K / T * 1e9
        for _ in range(5)
    )
    return {"best": obs[0], "median": obs[len(obs) // 2],
            "spread": obs[-1] - obs[0]}


def fused_hbm_bytes():
    """Analytic major HBM streams of one fused fwd+bwd step (fp32, raw
    widths), including the XLA prep/scatter stages."""
    f4 = 4
    emis = T * B * N * f4  # (T, B, N)
    alig = T * B * S * f4  # (T, B, S)
    streams = {
        # prep: emission gather reads inputs, writes aligned
        "prep_gather": emis + alig,
        # fwd kernel: reads emissions + aligned, writes pb + qb residuals
        "fwd_read": emis + alig,
        "fwd_store": emis + alig,  # pb is (T,B,N), qb is (T,B,S)
        # bwd kernel: reads emissions + aligned + pb + qb, writes gi + gali
        "bwd_read": 2 * (emis + alig),
        "bwd_store": emis + alig,
        # scatter: reads gali, writes gi_fac, reads+writes gi for the sum
        "scatter": alig + 3 * emis,
    }
    return sum(streams.values()), streams


def main():
    # Bounded backend probe: a dead tunnel can HANG device init for ~10
    # minutes before raising (2026-08-17 saw a 10+ hour axon UNAVAILABLE
    # window; docs/PERF_R3.md §5).  Emit an explicit marker row so the
    # recorded artifact says WHY there is no measurement, instead of a
    # bare crash or an unbounded hang.
    import threading

    probe = {}

    def _probe():
        try:
            jax.devices()
            probe["ok"] = True
        except Exception as e:  # RuntimeError on init failure
            probe["err"] = e

    th = threading.Thread(target=_probe, daemon=True)
    th.start()
    th.join(600)
    if probe.get("ok") is not True:
        err = probe.get("err")
        detail = (str(err).splitlines()[0][:200] if err is not None
                  else "backend init still hanging after 600 s")
        print(json.dumps({
            "metric": "asg_fwd_bwd_frames_per_sec_per_chip",
            "value": 0,
            "unit": "frames/s",
            "vs_baseline": 0,
            "error": "tpu_backend_unavailable",
            "detail": detail,
        }))
        return 1

    from torch_asg_tpu import asg_loss, viterbi_decode
    from torch_asg_tpu.ops.pallas.asg_kernels import strict_chain_precision
    from torch_asg_tpu.utils.profiling import fetch_overhead_s

    trans, inputs, targets, li, lo = make_case()

    def value_and_grads(impl):
        def f(tr, inp):
            return jax.value_and_grad(
                lambda a, b: asg_loss(a, b, targets, li, lo,
                                      reduction="mean", impl=impl),
                argnums=(0, 1),
            )(tr, inp)
        return f

    _mark("fetch overhead")
    fetch_s = fetch_overhead_s()

    # ------------------------------------------------------------------
    # timed paths: in-graph chains threading the INPUTS.  The chains also
    # return the final step's (loss, grads): the carry only ever adds
    # exact zeros, so those equal a single step's outputs — the
    # correctness gates below reuse them instead of paying separate
    # (multi-minute) unchained compiles.
    # ------------------------------------------------------------------
    def train_chain(impl):
        vg = value_and_grads(impl)

        def chain(inp):
            def body(inp_c, _):
                loss, (gt, gi) = vg(trans, inp_c)
                return inp_c + 0.0 * gi, loss
            inp_o, _ = jax.lax.scan(body, inp, None, length=CHAIN_K - 1)
            loss, (gt, gi) = vg(trans, inp_o)  # step CHAIN_K of CHAIN_K
            return loss, inp_o + 0.0 * gi, loss, gt, gi

        return jax.jit(chain)

    feedback = lambda _, out: out[1]
    scan_step = train_chain("scan")
    fused_step = train_chain("fused")
    _mark("compile+gate scan chain")
    _, _, l_s, gt_s, gi_s = scan_step(inputs)
    _mark("compile+gate fused chain")
    _, _, l_f, gt_f, gi_f = fused_step(inputs)

    # gate 1: fused vs scan at production precision (wide tolerances
    # absorb the single-bf16-pass chain rounding, ~2e-5 on scores)
    ok = (
        np.allclose(float(l_s), float(l_f), rtol=2e-3, atol=2e-3)
        and np.allclose(np.asarray(gt_s), np.asarray(gt_f), rtol=2e-2, atol=2e-3)
        and np.allclose(np.asarray(gi_s), np.asarray(gi_f), rtol=2e-2, atol=2e-3)
    )
    # gate 2 (strict): fused at HIGHEST precision vs scan, tight
    _mark("gate2: strict fused")
    with strict_chain_precision():
        vg_h = jax.jit(
            lambda tr, inp: value_and_grads("fused")(tr, inp)
        )
        l_h, (gt_h, gi_h) = vg_h(trans, inputs)
    strict_ok = (
        np.allclose(float(l_s), float(l_h), rtol=1e-4, atol=1e-4)
        and np.allclose(np.asarray(gt_s), np.asarray(gt_h), rtol=2e-3, atol=1e-4)
        and np.allclose(np.asarray(gi_s), np.asarray(gi_h), rtol=2e-3, atol=1e-4)
    )
    if not (ok and strict_ok):
        print(json.dumps({
            "metric": "ASG fwd+bwd frames/sec/chip (B=64,T=1000,N=30)",
            "value": 0, "unit": "frames/s", "vs_baseline": 0.0,
            "error": f"gate failure: default_ok={ok} strict_ok={strict_ok}",
        }))
        return 1

    _mark("time scan")
    s_scan = stats_of(scan_step, inputs, feedback, fetch_s, per=CHAIN_K)
    t_scan = s_scan["median"]
    _mark("time fused")
    s_fused = stats_of(fused_step, inputs, feedback, fetch_s, per=CHAIN_K)
    t_fused = s_fused["median"]

    def fwd_chain(inp):
        def body(inp_c, _):
            loss = asg_loss(trans, inp_c, targets, li, lo,
                            reduction="mean", impl="fused")
            return inp_c + 0.0 * loss, loss
        inp_o, losses = jax.lax.scan(body, inp, None, length=CHAIN_K)
        return losses[-1], inp_o

    f = jax.jit(fwd_chain)
    _mark("compile fwd chain")
    f(inputs)
    _mark("time fwd")
    s_fwd = stats_of(f, inputs, feedback, fetch_s, per=CHAIN_K)
    t_fwd = s_fwd["median"]

    def vit_chain(inp):
        def body(inp_c, _):
            res = viterbi_decode(trans, inp_c, li)
            # thread paths too: a scores-only chain lets XLA DCE the whole
            # backtrace, and the round-2 "decode" number was silently
            # forward-only because of exactly that (docs/PERF_R3.md §2)
            s = res.scores.sum() + res.paths.sum().astype(res.scores.dtype)
            return inp_c + 0.0 * s, s
        inp_o, scores = jax.lax.scan(body, inp, None, length=CHAIN_K)
        return scores[-1], inp_o

    v = jax.jit(vit_chain)
    _mark("compile viterbi chain")
    v(inputs)
    _mark("time viterbi")
    s_vit = stats_of(v, inputs, feedback, fetch_s, per=CHAIN_K)
    t_vit = s_vit["median"]

    # ------------------------------------------------------------------
    # roofline accounting
    # ------------------------------------------------------------------
    _mark("bandwidth anchor")
    bw_gbps = measured_bandwidth(fetch_s)
    bytes_total, _ = fused_hbm_bytes()
    t_bw_floor_ms = bytes_total / (bw_gbps * 1e9) * 1e3
    _mark("dot-chain floor (in-run)")
    s_dot = measure_dot_chain_ns(fetch_s)
    dot_ns = s_dot["median"]
    t_chain_floor_ms = 2 * T * dot_ns * 1e-6  # fwd + bwd serial walks
    # the floor of the chain AS BUILT (FCC exp-domain dot+rescale
    # interleaved with the FAC 2-way logaddexp — docs/PERF_R2.md §2/§4):
    # the gap between it and the bare dot chain is VPU work with no
    # cheaper measured form (§4 NO-GOs).  This is the BINDING constraint:
    # it exceeds both the HBM floor and the bare-dot floor.
    _mark("walk floor (in-run)")
    s_walk = measure_walk_ns(trans, inputs, targets, li, lo, fetch_s)
    walk_ns = s_walk["median"]
    t_walk_ms = 2 * T * walk_ns * 1e-6
    walk_frac = t_walk_ms / t_fused if t_fused > 0 else 0.0
    floors = {
        "hbm": t_bw_floor_ms,
        "bare dot chain": t_chain_floor_ms,
        "implemented walk": t_walk_ms,
    }
    binding = max(floors, key=floors.get)
    roofline_frac = floors[binding] / t_fused if t_fused > 0 else 0.0

    # ------------------------------------------------------------------
    # BASELINE config 5: 10k-label vocabulary, single chip (impl matmul)
    # ------------------------------------------------------------------
    r = np.random.default_rng(1)
    big_inputs = jnp.asarray(r.normal(size=(BIG_T, BIG_B, BIG_N)), jnp.float32)
    big_trans = jnp.asarray(r.normal(size=(BIG_N, BIG_N)) * 0.1, jnp.float32)
    big_tgt = jnp.asarray(r.integers(0, BIG_N, size=(BIG_B, BIG_S)), jnp.int32)
    big_li = jnp.full((BIG_B,), BIG_T, jnp.int32)
    big_lo = jnp.full((BIG_B,), BIG_S, jnp.int32)

    # the 10k transition (400 MB) MUST be a jit argument, not a closure:
    # captured constants ride inside the remote-compile request (413s)
    def big_chain(btr, inp):
        def body(inp_c, _):
            loss, (gt, gi) = jax.value_and_grad(
                lambda a, b: asg_loss(a, b, big_tgt, big_li, big_lo,
                                      reduction="mean", impl="matmul"),
                argnums=(0, 1),
            )(btr, inp_c)
            return inp_c + 0.0 * gi, loss
        inp_o, losses = jax.lax.scan(body, inp, None, length=2)
        return losses[-1], inp_o

    bigf = jax.jit(big_chain)
    _mark("compile 10k chain")
    l_big, _ = bigf(big_trans, big_inputs)
    _mark("gate 10k strict")
    # fresh function object, NOT jax.jit(big_chain): the trace cache is
    # keyed on (callable identity, avals) ACROSS jit wrappers, so
    # re-jitting big_chain itself would silently reuse the DEFAULT-
    # precision executable and gate DEFAULT against DEFAULT (caught in
    # round 5, scripts/exp_r5_bigvocab.py).  With the dual-stream kernel
    # electing only under DEFAULT (ops/fcc.py::_resolve_dual), this gate
    # now also cross-checks kernel-vs-scan formulations at 10k.
    with strict_chain_precision():
        l_big_h, _ = jax.jit(lambda a, b: big_chain(a, b))(
            big_trans, big_inputs)
    big_ok = bool(np.allclose(float(l_big), float(l_big_h), rtol=1e-3))
    _mark("time 10k")
    s_big = stats_of(lambda i: bigf(big_trans, i), big_inputs, feedback,
                     fetch_s, iters=4, repeats=3, per=2)
    t_big = s_big["median"]

    # 10k forward-only (score path, no alpha/no grads): the 2x20 GB
    # alpha+beta scan analysis (docs/PERF_R2.md §3.4) implies ~2/3 of the
    # train step; VERDICT r2 item 9 asked for the measurement.
    def big_fwd_chain(btr, inp):
        def body(inp_c, _):
            loss = asg_loss(btr, inp_c, big_tgt, big_li, big_lo,
                            reduction="mean", impl="matmul")
            return inp_c + 0.0 * loss, loss
        inp_o, losses = jax.lax.scan(body, inp, None, length=2)
        return losses[-1], inp_o

    bigfw = jax.jit(big_fwd_chain)
    _mark("compile 10k fwd-only")
    bigfw(big_trans, big_inputs)
    _mark("time 10k fwd-only")
    s_big_fwd = stats_of(lambda i: bigfw(big_trans, i), big_inputs,
                         feedback, fetch_s, iters=4, repeats=3, per=2)
    t_big_fwd = s_big_fwd["median"]

    frames = B * T

    def dist(s):
        # {"best","median","spread"} rounded for the JSON (ms or ns)
        return {k: round(v, 3) for k, v in s.items()}

    frames_per_sec = frames / (t_fused / 1e3)
    print(json.dumps({
        "metric": "ASG fwd+bwd frames/sec/chip (B=64,T=1000,N=30)",
        "value": round(frames_per_sec, 1),
        "unit": "frames/s",
        "vs_baseline": round(t_scan / t_fused, 3),
        "detail": {
            # all headline numbers are MEDIANS of REPEATS chained loops;
            # the *_dist blocks carry best/median/spread so round-over-
            # round deltas are checkable against the run's own noise
            "fused_ms": round(t_fused, 3),
            "fused_ms_dist": dist(s_fused),
            "repeats": REPEATS,
            # BASELINE.json's "audio-seconds/s" phrasing at the standard
            # 10 ms acoustic frame stride (100 frames of audio per second)
            "audio_seconds_per_sec_per_chip": round(frames_per_sec / 100.0, 1),
            "xla_scan_ms": round(t_scan, 3),
            "xla_scan_ms_dist": dist(s_scan),
            "forward_only_ms": round(t_fwd, 3),
            "forward_only_ms_dist": dist(s_fwd),
            "viterbi_decode_ms": round(t_vit, 3),
            "viterbi_decode_ms_dist": dist(s_vit),
            "strict_precision_gate": "pass (HIGHEST vs scan, rtol 2e-3)",
            "roofline": {
                "hbm_bytes_per_step": bytes_total,
                "measured_bw_gbps": round(bw_gbps, 1),
                "bw_floor_ms": round(t_bw_floor_ms, 3),
                "dot_chain_ns_per_step": round(dot_ns, 1),
                "dot_chain_ns_dist": dist(s_dot),
                "serial_chain_floor_ms": round(t_chain_floor_ms, 3),
                "walk_ns_per_step": round(walk_ns, 1),
                "walk_ns_dist": dist(s_walk),
                "implemented_walk_floor_ms": round(t_walk_ms, 3),
                # all three floors are measured in THIS run; the binding
                # one is the largest (normally the implemented walk,
                # docs/PERF_R2.md §2)
                "binding_floor": binding,
                "fraction_of_binding_floor": round(roofline_frac, 3),
                "fraction_of_walk_floor": round(walk_frac, 3),
            },
            "vocab10k_matmul": {
                "shape": f"T={BIG_T},B={BIG_B},N={BIG_N}",
                "step_ms": round(t_big, 1),
                "step_ms_dist": dist(s_big),
                "forward_only_ms": round(t_big_fwd, 1),
                "forward_only_ms_dist": dist(s_big_fwd),
                "strict_precision_loss_match": big_ok,
            },
            "backend": jax.default_backend(),
            "note": (
                "reference publishes no numbers; vs_baseline = xla_scan /"
                " fused on the same chip; in-graph chained timing"
                " (CHAIN_K dependent steps per dispatch, inputs threaded);"
                " headline values are medians of 'repeats' chained loops"
            ),
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
