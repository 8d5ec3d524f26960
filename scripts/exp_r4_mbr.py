"""Round-4: posterior_decode (minimum-frame-risk decode) on-chip.

VERDICT r3 stretch item 8: the interpolated (log<->tropical) decode.
Measures the kernel-reuse claim — impl='pallas' rides the fused FCC
backward kernel (posteriors == d fcc_score / d inputs) — against the
XLA scan posteriors at the bench shape, parity asserted on the spot,
plus the tropical anchor (tau=0.05 path == viterbi_decode's).

Run: python scripts/exp_r4_mbr.py   (real TPU)
"""

import os
import sys
import time as _time

_T0 = _time.time()


def _mark(s):
    print(f"[mbr {_time.time()-_T0:6.1f}s] {s}", file=sys.stderr, flush=True)


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CHAIN_K = 8
B, T, N = 64, 1000, 30


def main():
    from torch_asg_tpu import posterior_decode, viterbi_decode
    from torch_asg_tpu.utils.profiling import fetch_overhead_s, time_fn_chained

    print("backend:", jax.default_backend(), flush=True)
    r = np.random.default_rng(0)
    inputs = jnp.asarray(r.normal(size=(T, B, N)), jnp.float32)
    trans = jnp.asarray(r.normal(size=(N, N)) * 0.5, jnp.float32)
    li = jnp.asarray(r.integers(T // 2, T + 1, size=(B,)), jnp.int32)
    fetch_s = fetch_overhead_s()

    out = {}
    ref = None
    for impl in ("scan", "pallas"):
        def chain(inp, _impl=impl):
            def body(inp_c, _):
                res = posterior_decode(trans, inp_c, li, impl=_impl)
                s = res.scores.sum() + res.paths.sum().astype(res.scores.dtype)
                return inp_c + 0.0 * s, (res.scores, res.paths)
            inp_o, (scores, paths) = jax.lax.scan(body, inp, None,
                                                  length=CHAIN_K)
            return scores[-1].sum(), inp_o, scores[-1], paths[-1]

        f = jax.jit(chain)
        _mark(f"compile {impl}")
        _, _, scores, paths = jax.block_until_ready(f(inputs))
        if ref is None:
            ref = (np.asarray(scores), np.asarray(paths))
        else:
            assert np.allclose(np.asarray(scores), ref[0], rtol=1e-3), impl
            mismatch = (np.asarray(paths) != ref[1]).mean()
            # fp32 kernel vs fp32 scan: argmax can flip on near-ties
            assert mismatch < 1e-3, f"path mismatch rate {mismatch}"
        _mark(f"time {impl}")
        out[impl] = min(
            time_fn_chained(f, lambda _, o: o[1], inputs,
                            warmup=2, iters=12, fetch_s=fetch_s)
            for _ in range(3)
        ) * 1e3 / CHAIN_K

    # tropical anchor on-chip: tau -> 0 recovers the Viterbi path
    vit = viterbi_decode(trans, inputs, li)
    mbr = posterior_decode(trans, inputs, li, temperature=0.05,
                           impl="pallas")
    agree = float((np.asarray(mbr.paths) == np.asarray(vit.paths)).mean())
    print(f"RESULT mbr_scan_ms={out['scan']:.4f} "
          f"mbr_pallas_ms={out['pallas']:.4f} "
          f"speedup={out['scan']/out['pallas']:.2f}x "
          f"tau0.05_viterbi_agreement={agree:.4f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
