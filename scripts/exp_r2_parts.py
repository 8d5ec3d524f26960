"""Round-2: honest stage decomposition of the fused train step.

All timings in-graph chained (CHAIN_K dependent runs per dispatch).
Stages: _prepare (XLA gathers/exp), fwd kernel (store), bwd kernel,
scatter_to_full (XLA).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import torch_asg_tpu.ops.pallas.asg_kernels as ak
from torch_asg_tpu.ops.fac import scatter_to_full
from torch_asg_tpu.utils.profiling import fetch_overhead_s, time_fn_chained

B, T, S, N = 64, 1000, 50, 30
CHAIN_K = 8


def timed(f, x0, fetch, pick):
    return min(
        time_fn_chained(f, lambda _, out: out[pick], x0,
                        warmup=2, iters=30, fetch_s=fetch)
        for _ in range(3)
    ) * 1e3 / CHAIN_K


def main():
    r = np.random.default_rng(0)
    inputs = jnp.asarray(r.normal(size=(T, B, N)), jnp.float32)
    trans = jnp.asarray(r.normal(size=(N, N)) * 0.5, jnp.float32)
    targets = jnp.asarray(r.integers(0, N, size=(B, S)), jnp.int32)
    li = jnp.asarray(r.integers(T // 2, T + 1, size=(B,)), jnp.int32)
    lo = jnp.asarray(r.integers(S // 2, S + 1, size=(B,)), jnp.int32)
    fetch = fetch_overhead_s()
    print("backend:", jax.default_backend())

    # ---- stage outputs (concrete), computed once
    prep1 = jax.jit(lambda tr, i: ak._prepare(tr, i, targets, li, lo))
    lat, ip, ap, e, e_t, self_p, next_p, li_col, lo_col, c, dims = prep1(
        trans, inputs
    )
    geom = (N, 128, 128)
    b_pad = ip.shape[1]

    fwd1 = jax.jit(lambda *a: ak._run_fwd(*a[:7], geom, store=True))
    pb, qb, sful, sfac = fwd1(li_col, lo_col, e, self_p, next_p, ip, ap)
    g = jnp.full((b_pad, 1), 1.0 / B, jnp.float32)
    gneg = -g

    bwd1 = jax.jit(
        lambda *a: ak._run_bwd(li_col, lo_col, g, gneg, *a, geom)
    )
    gi, gali, gt, gself, gnext = bwd1(e, e_t, self_p, next_p, ip, ap, pb, qb)

    # ---- chained stage timers
    def prep_chain(tr):
        def body(tr_c, _):
            out = ak._prepare(tr_c, inputs, targets, li, lo)
            return tr_c + 0.0 * out[3][0, 0], out[3][0, 0]
        tr_o, x = jax.lax.scan(body, tr, None, length=CHAIN_K)
        return x[-1], tr_o

    t_prep = timed(jax.jit(prep_chain), trans, fetch, 1)
    print(f"prepare (XLA):   {t_prep:7.3f} ms")

    def fwd_chain(e_):
        def body(e_c, _):
            pb_, qb_, sf, sa = ak._run_fwd(
                li_col, lo_col, e_c, self_p, next_p, ip, ap, geom, store=True
            )
            return e_c + 0.0 * sf[0, 0], (sf[0, 0], pb_[0, 0, 0])
        e_o, x = jax.lax.scan(body, e_, None, length=CHAIN_K)
        return x, e_o

    t_fwd = timed(jax.jit(fwd_chain), e, fetch, 1)
    print(f"fwd kernel:      {t_fwd:7.3f} ms")

    def fwds_chain(e_):
        def body(e_c, _):
            sf, sa = ak._run_fwd(
                li_col, lo_col, e_c, self_p, next_p, ip, ap, geom, store=False
            )
            return e_c + 0.0 * sf[0, 0], sf[0, 0]
        e_o, x = jax.lax.scan(body, e_, None, length=CHAIN_K)
        return x, e_o

    t_fwds = timed(jax.jit(fwds_chain), e, fetch, 1)
    print(f"fwd score-only:  {t_fwds:7.3f} ms")

    def bwd_chain(e_):
        def body(e_c, _):
            gi_, gali_, gt_, gs_, gn_ = ak._run_bwd(
                li_col, lo_col, g, gneg, e_c, e_t, self_p, next_p, ip, ap,
                pb, qb, geom,
            )
            return e_c + 0.0 * gt_[0, 0], (gt_[0, 0], gi_[0, 0, 0])
        e_o, x = jax.lax.scan(body, e_, None, length=CHAIN_K)
        return x, e_o

    t_bwd = timed(jax.jit(bwd_chain), e, fetch, 1)
    print(f"bwd kernel:      {t_bwd:7.3f} ms")

    def scat_chain(ga):
        def body(ga_c, _):
            gt_fac, gi_fac = scatter_to_full(
                lat, ga_c[:T, :B, :S], gself[:B, :S], gnext[:B, :S], N
            )
            return ga_c + 0.0 * gt_fac[0, 0], gt_fac[0, 0]
        ga_o, x = jax.lax.scan(body, ga, None, length=CHAIN_K)
        return x, ga_o

    t_scat = timed(jax.jit(scat_chain), gali, fetch, 1)
    print(f"scatter (XLA):   {t_scat:7.3f} ms")
    print(f"sum:             {t_prep + t_fwd + t_bwd + t_scat:7.3f} ms")


if __name__ == "__main__":
    main()
