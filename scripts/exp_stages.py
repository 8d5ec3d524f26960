"""Honest stage breakdown of the fused op: prep / fwd / bwd / post."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, T, S, N = 64, 1000, 50, 30


def main():
    from torch_asg_tpu.ops.pallas import asg_kernels as ak
    from torch_asg_tpu.ops.fac import scatter_to_full
    from torch_asg_tpu.utils.profiling import fetch_overhead_s, time_fn_chained

    r = np.random.default_rng(0)
    inputs = jnp.asarray(r.normal(size=(T, B, N)), jnp.float32)
    trans = jnp.asarray(r.normal(size=(N, N)) * 0.5, jnp.float32)
    targets = jnp.asarray(r.integers(0, N, size=(B, S)), jnp.int32)
    li = jnp.asarray(r.integers(T // 2, T + 1, size=(B,)), jnp.int32)
    lo = jnp.asarray(r.integers(S // 2, S + 1, size=(B,)), jnp.int32)

    fetch_s = fetch_overhead_s()

    def bench(name, fn, x0, feedback):
        jfn = jax.jit(fn)
        best = min(
            time_fn_chained(jfn, feedback, x0, iters=30, fetch_s=fetch_s)
            for _ in range(3)
        )
        print(f"{name:12s} {best*1e3:7.3f} ms")
        return jfn

    # ---- prep
    def prep_fn(i):
        out = ak._prepare(trans, i, targets, li, lo)
        return out[1:9]

    bench("prep", prep_fn, inputs, lambda x0, out: x0 + 0.0 * jnp.sum(jax.tree_util.tree_leaves(out)[0]))

    prepped = jax.jit(lambda i: ak._prepare(trans, i, targets, li, lo))(inputs)
    lat, ip, ap, e, e_t, self_p, next_p, li_col, lo_col, c, dims = prepped
    geom = (N, dims[5], dims[6])

    # ---- fwd kernel (with stores)
    def fwd_fn(ip_):
        return ak._run_fwd(li_col, lo_col, e, self_p, next_p, ip_, ap, geom,
                           store=True)

    bench("fwd kernel", fwd_fn, ip, lambda x0, out: x0 + 0.0 * jnp.sum(out[0]))

    # ---- score kernel (no stores)
    def score_fn(ip_):
        return ak._run_fwd(li_col, lo_col, e, self_p, next_p, ip_, ap, geom,
                           store=False)

    bench("score kern", score_fn, ip, lambda x0, out: x0 + 0.0 * jnp.sum(out[0]))

    pb, qb, sful, sfac = jax.jit(fwd_fn)(ip)
    g = jnp.ones((dims[4], 1), jnp.float32)

    # ---- bwd kernel
    def bwd_fn(ip_):
        return ak._run_bwd(li_col, lo_col, g, g, e, e_t, self_p, next_p, ip_,
                           ap, pb, qb, geom)

    bench("bwd kernel", bwd_fn, ip, lambda x0, out: x0 + 0.0 * jnp.sum(out[0]))

    gi, gali, gt, gself, gnext = jax.jit(bwd_fn)(ip)

    # ---- post (FAC scatters + final adds)
    def post_fn(gali_):
        gt_fac, gi_fac = scatter_to_full(
            lat, gali_[:T, :B, :S], gself[:B, :S], gnext[:B, :S], N
        )
        return gt[:N, :N] + gt_fac, gi[:T, :B, :N] + gi_fac

    bench("post", post_fn, gali, lambda x0, out: x0 + 0.0 * jnp.sum(out[1]))


if __name__ == "__main__":
    main()
