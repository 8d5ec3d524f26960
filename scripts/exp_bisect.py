"""Bisect which feature of the fused fwd kernel costs 2.4us/step.

Levels:
  A: fcc asc exp-chain, no stores (baseline)
  B: A + per-step output stores (ascending)
  C: B + second fcc chain on DESCENDING blocks + desc stores
  D: C + in-kernel exp of emission rows (instead of pre-exp'd inputs)
  E: D + beta offset tracking (per-step (B,1) log)
  F: E + FAC alpha (asc) + FAC beta (desc) log-domain chains + stores
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, T, N = 64, 1000, 128
KB = 8
NEG_INF = float("-inf")


def _exp_rows(x):
    m = jnp.max(x, axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    return jnp.exp(x - m), m


def kern(
    li_ref, lo_ref,
    e_ref, s_ref, n_ref, ia_ref, ib_ref, qa_in_ref, qb_in_ref,
    pa_ref, pb_ref, qa_ref, qb_ref, out_ref,
    pa_c, pb_c, qa_c, qb_c, off_c, top_c,
    *, kb, level,
):
    k = pl.program_id(0)
    nb = pl.num_programs(0)
    li = li_ref[:]
    lo = lo_ref[:]

    @pl.when(k == 0)
    def _():
        pa_c[:] = jnp.ones_like(pa_c)
        pb_c[:] = jnp.ones_like(pb_c)
        qa_c[:] = jnp.zeros_like(qa_c)
        qb_c[:] = jnp.zeros_like(qb_c)
        off_c[:] = jnp.zeros_like(off_c)
        top_c[:] = jnp.zeros_like(top_c)

    e_t = e_ref[:]
    selft = s_ref[:]
    nextt = n_ref[:]
    pa, pb, qa, qb = pa_c[:], pb_c[:], qa_c[:], qb_c[:]
    off = off_c[:]
    col = jax.lax.broadcasted_iota(jnp.int32, qa.shape, 1)
    seed_fcc = (col < 30).astype(pa.dtype)
    seed_fac = jnp.where(col == lo - 1, 0.0, NEG_INF).astype(pa.dtype)
    b_start = (nb - 1 - k) * kb

    for j in range(kb):
        j_local = kb - 1 - j
        # chain 1: fcc asc
        if level >= "d":
            ei, _ = _exp_rows(ia_ref[j])
        else:
            ei = ia_ref[j]
        s = jnp.dot(pa, e_t, preferred_element_type=pa.dtype)
        raw = s * ei
        m = jnp.max(raw, axis=1, keepdims=True)
        pa = raw * (1.0 / jnp.where(m > 0, m, 1.0))
        if level >= "b":
            pa_ref[j] = pa

        if level >= "c":
            if level >= "d":
                eb, cb = _exp_rows(ib_ref[j_local])
            else:
                eb, cb = ib_ref[j_local], jnp.zeros_like(off)
            sb = jnp.dot(pb * eb, e_t, preferred_element_type=pb.dtype)
            mb = jnp.max(sb, axis=1, keepdims=True)
            mb_s = jnp.where(mb > 0, mb, 1.0)
            pb = sb * (1.0 / mb_s)
            if level >= "g":
                seed_b = li - 1 == b_start + j_local
                pb = jnp.where(seed_b, seed_fcc, pb)
                off = jnp.where(seed_b, 0.0, off + cb + jnp.log(mb_s))
            elif level >= "e":
                off = off + cb + jnp.log(mb_s)
            pb_ref[j_local] = pb

        if level >= "f":
            ai = qa_in_ref[j]
            y = jnp.concatenate([qa[:, -1:], qa[:, :-1]], axis=1)
            diag = jnp.where(col == 0, NEG_INF, y + nextt)
            qa = ai + jnp.logaddexp(qa + selft, diag)
            qa_ref[j] = qa

            aib = qb_in_ref[j_local]
            x = qb + aib
            y2 = jnp.concatenate([x[:, 1:], x[:, :1]], axis=1)
            diag2 = jnp.where(col == N - 1, NEG_INF, y2) + nextt
            qb = jnp.logaddexp(selft + x, diag2)
            if level >= "g":
                qb = jnp.where(li - 1 == b_start + j_local, seed_fac, qb)
            qb_ref[j_local] = qb

    pa_c[:], pb_c[:], qa_c[:], qb_c[:] = pa, pb, qa, qb
    off_c[:] = off

    @pl.when(k == nb - 1)
    def _():
        if level >= "g":
            tot = jnp.sum(pb * jnp.exp(ib_ref[0]), axis=1, keepdims=True)
            out_ref[:] = (jnp.log(tot) + off) + (pa + pb + qa + qb)
        else:
            out_ref[:] = pa + pb + qa + qb + off


def build(level):
    kb = KB
    nb = T // kb
    blk = (kb, B, N)
    asc = pl.BlockSpec(blk, lambda k: (k, 0, 0), memory_space=pltpu.VMEM)
    desc = pl.BlockSpec(blk, lambda k: (nb - 1 - k, 0, 0), memory_space=pltpu.VMEM)
    const = pl.BlockSpec((B, N), lambda k: (0, 0), memory_space=pltpu.VMEM)
    constn = pl.BlockSpec((N, N), lambda k: (0, 0), memory_space=pltpu.VMEM)

    cb1 = pl.BlockSpec((B, 1), lambda k: (0, 0), memory_space=pltpu.VMEM)

    def f(li, lo, e, selft, nextt, inp, ainp):
        return pl.pallas_call(
            functools.partial(kern, kb=kb, level=level),
            grid=(nb,),
            in_specs=[cb1, cb1, constn, const, const, asc, desc, asc, desc],
            out_specs=[asc, desc, asc, desc, const],
            out_shape=[
                jax.ShapeDtypeStruct((T, B, N), jnp.float32),
                jax.ShapeDtypeStruct((T, B, N), jnp.float32),
                jax.ShapeDtypeStruct((T, B, N), jnp.float32),
                jax.ShapeDtypeStruct((T, B, N), jnp.float32),
                jax.ShapeDtypeStruct((B, N), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((B, N), jnp.float32),
                pltpu.VMEM((B, N), jnp.float32),
                pltpu.VMEM((B, N), jnp.float32),
                pltpu.VMEM((B, N), jnp.float32),
                pltpu.VMEM((B, 1), jnp.float32),
                pltpu.VMEM((B, N), jnp.float32),
            ],
        )(li, lo, e, selft, nextt, inp, inp, ainp, ainp)

    return jax.jit(f)


def timed(fn, *args, iters=20):
    for _ in range(3):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    r = np.random.default_rng(0)
    e = jnp.asarray(np.exp(r.normal(size=(N, N)) * 0.1 - 1), jnp.float32)
    selft = jnp.asarray(r.normal(size=(B, N)), jnp.float32)
    nextt = jnp.asarray(r.normal(size=(B, N)), jnp.float32)
    inp = jnp.asarray(np.exp(-np.abs(r.normal(size=(T, B, N)))), jnp.float32)
    ainp = jnp.asarray(r.normal(size=(T, B, N)) - 1, jnp.float32)

    li = jnp.asarray(r.integers(T // 2, T + 1, size=(B, 1)), jnp.int32)
    lo = jnp.asarray(r.integers(10, 40, size=(B, 1)), jnp.int32)
    masked = np.array(ainp)
    tmask = np.arange(T)[:, None] < np.asarray(li)[None, :, 0]
    masked[~tmask] = -np.inf
    masked[:, :, 30:] = -np.inf
    ainp_inf = jnp.asarray(masked)
    im = np.array(inp)
    im[~tmask] = 0.0
    inp_inf = jnp.asarray(im)

    for level in "fg":
        f = build(level)
        print(f"level {level} finite: {timed(f, li, lo, e, selft, nextt, inp, ainp):7.3f} ms")
        print(f"level {level} -inf  : {timed(f, li, lo, e, selft, nextt, inp_inf, ainp_inf):7.3f} ms")


if __name__ == "__main__":
    main()
