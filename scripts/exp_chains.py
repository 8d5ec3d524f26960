"""Microbenchmark: isolate per-chain cost (FCC exp-matmul vs FAC logaddexp).

Each kernel runs T=1000 steps of ONE chain, unrolled kb per grid step,
reading emission blocks from HBM, writing nothing but a final row.
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


def fcc_kernel(e_ref, i_ref, out_ref, pa_c, *, kb, precision):
    k = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(k == 0)
    def _():
        pa_c[:] = jnp.ones_like(pa_c)

    e_t = e_ref[:]
    pa = pa_c[:]
    for j in range(kb):
        ei = i_ref[j]  # pre-exp'd emissions
        s = jnp.dot(pa, e_t, preferred_element_type=pa.dtype, precision=precision)
        raw = s * ei
        m = jnp.max(raw, axis=1, keepdims=True)
        pa = raw * (1.0 / jnp.where(m > 0, m, 1.0))
    pa_c[:] = pa

    @pl.when(k == nb - 1)
    def _():
        out_ref[:] = pa


def fcc_noren_kernel(e_ref, i_ref, out_ref, pa_c, *, kb, precision):
    """No per-step renorm: renorm once per block."""
    k = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(k == 0)
    def _():
        pa_c[:] = jnp.ones_like(pa_c)

    e_t = e_ref[:]
    pa = pa_c[:]
    for j in range(kb):
        ei = i_ref[j]
        s = jnp.dot(pa, e_t, preferred_element_type=pa.dtype, precision=precision)
        pa = s * ei
    m = jnp.max(pa, axis=1, keepdims=True)
    pa = pa * (1.0 / jnp.where(m > 0, m, 1.0))
    pa_c[:] = pa

    @pl.when(k == nb - 1)
    def _():
        out_ref[:] = pa


def fac_kernel(s_ref, n_ref, i_ref, out_ref, qa_c, *, kb):
    k = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(k == 0)
    def _():
        qa_c[:] = jnp.zeros_like(qa_c)

    selft = s_ref[:]
    nextt = n_ref[:]
    qa = qa_c[:]
    col = jax.lax.broadcasted_iota(jnp.int32, qa.shape, 1)
    for j in range(kb):
        ai = i_ref[j]
        y = jnp.concatenate([qa[:, -1:], qa[:, :-1]], axis=1)
        diag = jnp.where(col == 0, -jnp.inf, y + nextt)
        qa = ai + jnp.logaddexp(qa + selft, diag)
    qa_c[:] = qa

    @pl.when(k == nb - 1)
    def _():
        out_ref[:] = qa


def run(kern, consts, inp, scratch_shape, kb=KB):
    nb = T // kb
    in_specs = [
        pl.BlockSpec(c.shape, lambda k: (0,) * c.ndim, memory_space=pltpu.VMEM)
        for c in consts
    ] + [pl.BlockSpec((kb, B, N), lambda k: (k, 0, 0), memory_space=pltpu.VMEM)]
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, N), lambda k: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM(scratch_shape, jnp.float32)],
    )(*consts, inp)


def timed(fn, *args, iters=30):
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
    ei = jnp.asarray(np.exp(-np.abs(r.normal(size=(T, B, N)))), jnp.float32)
    ai = jnp.asarray(r.normal(size=(T, B, N)) - 1, jnp.float32)
    selft = jnp.asarray(r.normal(size=(B, N)), jnp.float32)
    nextt = jnp.asarray(r.normal(size=(B, N)), jnp.float32)

    for prec in (jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST):
        f = jax.jit(
            lambda e, ei, p=prec: run(
                functools.partial(fcc_kernel, kb=KB, precision=p), [e], ei, (B, N)
            )
        )
        print(f"fcc exp-chain  prec={str(prec):8s} {timed(f, e, ei):7.3f} ms")
    f = jax.jit(
        lambda e, ei: run(
            functools.partial(
                fcc_noren_kernel, kb=KB, precision=jax.lax.Precision.DEFAULT
            ),
            [e], ei, (B, N),
        )
    )
    print(f"fcc exp-chain  no-renorm DEFAULT {timed(f, e, ei):7.3f} ms")
    f = jax.jit(
        lambda s, n, ai: run(functools.partial(fac_kernel, kb=KB), [s, n], ai, (B, N))
    )
    print(f"fac log-chain  {timed(f, selft, nextt, ai):7.3f} ms")


if __name__ == "__main__":
    main()
