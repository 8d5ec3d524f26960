"""Round-3 layout-copy probe #2: consume the one-hot gather's NATIVE
(B, T, S) output with (B, kb, S) Pallas blocks + in-kernel transpose.


ADJUDICATED (round 4, docs/PERF_R4.md §2): the native-(B,T,S) stream
measured GO (~30 us) and is now the unconditional kernel default; the
ASG_BTS env knob was deleted.  This probe remains the standalone
microbenchmark of the three block arrangements.
PERF_R3 §3 names 110 us of XLA minor-dim relayout copies around the
one-hot einsums as the one open lead, and records that (kb, B, S) blocks
over a (B, S, T) array are structurally rejected by Mosaic (minor block
dim 8 < 128).  This probes the third arrangement: write the gather as
``einsum('tbi,bsi->bts')`` whose batched-dot output (B, T, S) has S
minor — the DEFAULT row-major layout, so XLA needs no relayout — and
read it with blocks (B, kb, S), index map (0, k, 0).  Block legality:
last two dims (kb=8, S) with kb | 8 and S == array minor dim.  The
(B, kb, S) -> rows-of-(B, S) rearrangement moves INTO the kernel, where
it may hide under the serial chain's latency slack.

Three pipelines, identical math (einsum + sentinel mask + 8-step/block
row consumption into a serial carry), chained in-graph:

  tbs   : status quo — 'tbi,bsi->tbs' einsum, XLA relayout, (kb,B,S) blocks
  btsT  : 'bts' einsum, (B,kb,S) blocks, ONE jnp.swapaxes(0,1) per block
  btsS  : 'bts' einsum, (B,kb,S) blocks, per-step middle-dim slice [:,j,:]

Run: python scripts/exp_r3_bts.py          (real TPU)
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time as _time

_T0 = _time.time()


def _mark(s):
    print(f"[bts {_time.time()-_T0:6.1f}s] {s}", file=sys.stderr, flush=True)


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHAIN_K = 8
B, T, S, N = 64, 1000, 50, 30
KB = 8
NB = T // KB


def _consume_rows(carry, rows_fn):
    # Serial consumption mimicking the beta chain's data dependence: each
    # step's carry feeds the next (prevents reassociation into one sum).
    for j in range(KB):
        carry = jnp.maximum(carry * 0.5, rows_fn(j))
    return carry


def _kern_tbs(x_ref, o_ref, carry):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    blk = x_ref[:]  # (KB, B, S)
    carry[:] = _consume_rows(carry[:], lambda j: blk[j])

    @pl.when(k == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = carry[:]


def _kern_bts(x_ref, o_ref, carry, *, mode):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    blk = x_ref[:]  # (B, KB, S)
    if mode == "T":
        blk_t = jnp.swapaxes(blk, 0, 1)  # (KB, B, S) once per block
        carry[:] = _consume_rows(carry[:], lambda j: blk_t[j])
    else:
        carry[:] = _consume_rows(carry[:], lambda j: blk[:, j, :])

    @pl.when(k == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = carry[:]


INTERPRET = os.environ.get("ASG_BTS_INTERPRET", "0") == "1"


def _call_tbs(x):
    return pl.pallas_call(
        _kern_tbs,
        grid=(NB,),
        in_specs=[pl.BlockSpec((KB, B, S), lambda k: (k, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, S), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S), x.dtype),
        scratch_shapes=[pltpu.VMEM((B, S), x.dtype)],
        interpret=INTERPRET,
    )(x)


def _call_bts(x, mode):
    return pl.pallas_call(
        functools.partial(_kern_bts, mode=mode),
        grid=(NB,),
        in_specs=[pl.BlockSpec((B, KB, S), lambda k: (0, k, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, S), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S), x.dtype),
        scratch_shapes=[pltpu.VMEM((B, S), x.dtype)],
        interpret=INTERPRET,
    )(x)


def _pipeline(variant, inp, onehot):
    sentinel = jnp.asarray(-1e4, inp.dtype)
    safe = jnp.where(jnp.isfinite(inp), inp, sentinel)
    if variant == "tbs":
        al = jnp.einsum("tbi,bsi->tbs", safe, onehot,
                        precision=jax.lax.Precision.HIGHEST)
        al = jnp.where(al > 0.5 * sentinel, al, sentinel)
        return _call_tbs(al)
    al = jnp.einsum("tbi,bsi->bts", safe, onehot,
                    precision=jax.lax.Precision.HIGHEST)
    al = jnp.where(al > 0.5 * sentinel, al, sentinel)
    return _call_bts(al, "T" if variant == "btsT" else "S")


def main():
    from torch_asg_tpu.utils.profiling import fetch_overhead_s, time_fn_chained

    r = np.random.default_rng(0)
    inp = jnp.asarray(r.normal(size=(T, B, N)), jnp.float32)
    tgt = r.integers(0, N, size=(B, S))
    onehot = jnp.asarray(np.eye(N, dtype=np.float32)[tgt])  # (B, S, N)

    fetch_s = fetch_overhead_s()
    _mark(f"fetch {fetch_s*1e3:.1f} ms")

    ref_out = None
    results = {}
    for variant in ("tbs", "btsT", "btsS"):
        def chain(inp_c, _v=variant):
            def body(c, _):
                out = _pipeline(_v, c, onehot)
                s = out.sum()
                return c + 0.0 * s, s
            c_o, ss = jax.lax.scan(body, inp_c, None, length=CHAIN_K)
            return ss[-1], c_o

        try:
            f = jax.jit(chain)
            _mark(f"{variant}: compile")
            out = f(inp)
            val = float(out[0])
        except Exception as e:  # lowering rejection is a real result here
            _mark(f"{variant}: FAILED {type(e).__name__}: {e}")
            results[variant] = None
            continue
        if ref_out is None:
            ref_out = val
        ok = abs(val - ref_out) < 1e-3 * max(1.0, abs(ref_out))
        _mark(f"{variant}: value {val:.6f} (match={ok}) — timing")
        tt = min(
            time_fn_chained(f, lambda _, o: o[1], inp,
                            warmup=2, iters=12, fetch_s=fetch_s)
            for _ in range(3)
        ) * 1e3 / CHAIN_K
        results[variant] = round(tt, 4)
        _mark(f"{variant}: {tt:.4f} ms/step")

    print(json.dumps({"exp": "r3_bts", "shape": {"B": B, "T": T, "S": S, "N": N},
                      "ms_per_step": results}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
