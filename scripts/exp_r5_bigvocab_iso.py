"""Round-5 diagnostic: isolate the dual-kernel streams from the rest of
the matmul-tier step.  Times, on one TPU chip at T=100,B=8,N=10000:

  1. two-scan streams (alpha scan + beta scan, XLA)
  2. dual-kernel streams (one matrix pass)
  3. dual kernel with the alpha contraction knocked out (beta only) —
     if (3) ~ half of (2), the A @ stripe^T alpha dot is paying a
     hidden stripe transpose; if (3) ~ (2), the stripe stream itself
     isn't pipelining.

Each returns the (alpha, beta) streams reduced to a scalar; in-graph
chained over 2 steps per dispatch.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from torch_asg_tpu.ops import fcc
from torch_asg_tpu.ops.pallas import bigvocab_kernels as bk
from torch_asg_tpu.utils.lengths import mask_emissions
from torch_asg_tpu.utils.profiling import fetch_overhead_s, time_fn_chained

T, B, N = 100, 8, 10_000
REPEATS = 5


def stats(obs):
    obs = sorted(obs)
    return {"best": round(obs[0], 3), "median": round(obs[len(obs) // 2], 3),
            "spread": round(obs[-1] - obs[0], 3)}


def main():
    assert jax.default_backend() == "tpu"
    r = np.random.default_rng(1)
    inputs = jnp.asarray(r.normal(size=(T, B, N)), jnp.float32)
    trans = jnp.asarray(r.normal(size=(N, N)) * 0.1, jnp.float32)
    li = jnp.full((B,), T, jnp.int32)

    def scans(tr, inp):
        im = mask_emissions(inp, li)
        a = fcc._alpha_scan_mm(tr, im)
        b = fcc._beta_scan_mm(tr, im, li)
        return a, b

    def dual(tr, inp):
        im = mask_emissions(inp, li)
        return bk.fcc_dual_streams(tr, im, li)

    def chain_of(fn):
        def chain(tr, inp):
            def body(inp_c, _):
                a, b = fn(tr, inp_c)
                s = jnp.sum(a[-1]) + jnp.sum(b[0])
                return inp_c + 0.0 * s, s
            inp_o, ss = jax.lax.scan(body, inp, None, length=2)
            return ss[-1], inp_o
        return jax.jit(chain)

    fetch_s = fetch_overhead_s()
    feedback = lambda x0, out: out[1]
    rows = []
    for name, fn in (("scans", scans), ("dual", dual)):
        f = chain_of(fn)
        f(trans, inputs)  # compile
        obs = [
            time_fn_chained(lambda i, f=f: f(trans, i), feedback, inputs,
                            warmup=2, iters=4, fetch_s=fetch_s) / 2 * 1e3
            for _ in range(REPEATS)
        ]
        s = stats(obs)
        print(f"[iso] {name}: {s}", file=sys.stderr)
        rows.append({"exp": "bigvocab_iso_r5", "variant": name,
                     "streams_ms": s})
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
