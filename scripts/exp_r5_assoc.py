"""Round-5: associative (tree) semiring-matrix formulation of the FCC
forward — the only formulation whose wall-clock is not bound by
T x (serial step latency).  VERDICT r4 item 2 / SURVEY §5 stretch goal.

The log-semiring recursion alpha_t = I_t + lse_j(T[i,j] + alpha_{t-1,j})
is a semiring matrix product (reference tech_report.tex:164-168): with
M_t[i,j] = I_t[i] + T[i,j], the score is

    lse( (M_{L-1} (x) ... (x) M_1) (x) alpha_0 )

and the matrix chain can be reduced as a balanced TREE of batched
log-semiring matmuls (depth ceil(log2 T)) instead of a serial walk
(depth T).  Cost model: every timestep becomes a full (N,N)@(N,N)
matmul per batch element — N_pad x the serial walk's FLOPs — but those
FLOPs are MXU-throughput-bound and embarrassingly parallel, while the
serial walk pays a fixed ~300 ns/step latency floor regardless of B.
Predicted crossover: small B (the per-step matrix work B*N_pad^3*2
drops below the latency floor at B ~ 8-16), NOT the bench shape B=64.

Measured here, one TPU chip, in-graph chained timing:

  shape (T, B)        serial walk (fcc pallas kernel)  vs  tree reduce
  (1000, 64)  bench   expected NO-GO (matrix FLOPs dominate)
  (16384, 8)  long-T  crossover candidate
  (65536, 1)  single-stream scoring (hour-scale audio)

Parity: each tree score is gated against the lax.scan oracle
(ops/fcc.fcc_score) at fp32 tolerances before timing.

Exp-domain handling: matrices are max-normalized per combine (scale
carried additively in log space), the same scaled-probability scheme as
the fused kernels; the within-matrix spread after k combines is bounded
by the same full-connectivity argument as the alpha rows
(ops/pallas/asg_kernels.py:36-45) plus the start-state row spread —
checked empirically by the parity gate.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from torch_asg_tpu.utils.profiling import fetch_overhead_s, time_fn_chained

CHAIN_K = 4
REPEATS = 5


def stats(obs):
    obs = sorted(obs)
    return {"best": round(obs[0], 4), "median": round(obs[len(obs) // 2], 4),
            "spread": round(obs[-1] - obs[0], 4)}


def fcc_tree_score(transition, inputs, input_lengths):
    """FCC full score via balanced-tree semiring matrix reduction.

    inputs (T, B, N); returns (B,).  Frames t >= L_in[b] contribute
    identity transfer matrices, so ragged lengths fall out of the
    padding (alpha stops evolving at t = L_in - 1).
    """
    t_total, num_batches, n = inputs.shape
    dt = inputs.dtype
    # transfer matrices for t = 1..T-1: M_t[b, i, j] = I_t[b, i] + T[i, j]
    # (transition[i, j] = score j -> i, ops/fcc.py convention)
    t_idx = jnp.arange(1, t_total)[:, None]
    live = t_idx < input_lengths[None, :]  # (T-1, B)
    emis = jnp.where(live[:, :, None], inputs[1:], 0.0)  # masked frames: +0
    eye_log = jnp.where(jnp.eye(n, dtype=bool), 0.0, -jnp.inf).astype(dt)
    m = jnp.where(
        live[:, :, None, None],
        emis[:, :, :, None] + transition[None, None, :, :],
        eye_log[None, None],
    )  # (T-1, B, N, N)

    # exp-domain with per-matrix max normalization
    def norm(x):
        c = jnp.max(x, axis=(-2, -1), keepdims=True)
        c = jnp.where(jnp.isfinite(c), c, 0.0)
        return jnp.exp(x - c), c[..., 0, 0]

    p, off = norm(m)  # (n_mats, B, N, N), (n_mats, B)

    n_mats = t_total - 1
    while n_mats > 1:
        if n_mats % 2:
            # fold the LAST (latest-t) matrix into its neighbor later;
            # carve it off to keep pairs order-preserving
            tailp, tailo = p[-1:], off[-1:]
            p, off = p[:-1], off[:-1]
        else:
            tailp = tailo = None
        # order: composition newer (x) older — pair (2k+1, 2k)
        a, b = p[1::2], p[0::2]
        # batched exp-domain matmul over (pairs, B): contract a's j with
        # b's i:  (a (x) b)[i, j] = sum_k a[i, k] b[k, j]
        prod = jax.lax.dot_general(
            a, b,
            dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=dt,
        )
        c = jnp.max(prod, axis=(-2, -1), keepdims=True)
        c = jnp.where(c > 0, c, 1.0)
        p = prod / c
        off = off[1::2] + off[0::2] + jnp.log(c[..., 0, 0])
        if tailp is not None:
            # compose the carved tail (newer) onto the last pair product
            prod = jax.lax.dot_general(
                tailp, p[-1:],
                dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
                preferred_element_type=dt,
            )
            c = jnp.max(prod, axis=(-2, -1), keepdims=True)
            c = jnp.where(c > 0, c, 1.0)
            p = jnp.concatenate([p[:-1], prod / c], axis=0)
            off = jnp.concatenate(
                [off[:-1], off[-1:] + tailo + jnp.log(c[..., 0, 0])], axis=0
            )
        n_mats = p.shape[0]

    # alpha_0 = I_0 (t = 0 is always live: L_in >= 1), normalized per row
    c0 = jnp.max(inputs[0], axis=-1)  # (B,)
    a0 = jnp.exp(inputs[0] - c0[:, None])
    v = jnp.einsum("bij,bj->bi", p[0], a0)
    tot = jnp.sum(v, axis=-1)
    return jnp.log(tot) + off[0] + c0


def timed(f, x0, fetch_s, per):
    obs = [
        time_fn_chained(f, lambda _, out: out, x0, warmup=1, iters=6,
                        fetch_s=fetch_s) / per
        for _ in range(REPEATS)
    ]
    return stats(obs)


def run_shape(t_total, b, n, fetch_s):
    from torch_asg_tpu.ops.fcc import fcc_score
    from torch_asg_tpu.ops.pallas import fcc_score_pallas

    r = np.random.default_rng(0)
    inputs = jnp.asarray(r.normal(size=(t_total, b, n)), jnp.float32)
    trans = jnp.asarray(r.normal(size=(n, n)) * 0.5, jnp.float32)
    li = jnp.asarray(
        r.integers(max(2, t_total // 2), t_total + 1, size=(b,)), jnp.int32
    )

    # ---- parity gate: tree vs scan oracle
    tree_fn = jax.jit(lambda i: fcc_tree_score(trans, i, li))
    oracle = np.asarray(jax.jit(lambda i: fcc_score(trans, i, li))(inputs))
    got = np.asarray(tree_fn(inputs))
    # DEFAULT-precision bf16 dot passes compound over log2(T) levels;
    # scores grow ~O(T) so relative tolerance is the meaningful one
    ok = bool(np.allclose(oracle, got, rtol=2e-3, atol=5e-3))
    max_err = float(np.max(np.abs(oracle - got)))

    # ---- serial walk (production FCC pallas forward kernel)
    def serial_chain(inp):
        def body(inp_c, _):
            s = fcc_score_pallas(trans, inp_c, li)
            return inp_c + 0.0 * s.sum(), s.sum()
        inp_o, _ = jax.lax.scan(body, inp, None, length=CHAIN_K)
        return inp_o

    fs = jax.jit(serial_chain)
    fs(inputs)
    s_serial = timed(fs, inputs, fetch_s, per=CHAIN_K / 1e3)  # ms

    # ---- tree reduce
    def tree_chain(inp):
        def body(inp_c, _):
            s = fcc_tree_score(trans, inp_c, li)
            return inp_c + 0.0 * s.sum(), s.sum()
        inp_o, _ = jax.lax.scan(body, inp, None, length=CHAIN_K)
        return inp_o

    ft = jax.jit(tree_chain)
    ft(inputs)
    s_tree = timed(ft, inputs, fetch_s, per=CHAIN_K / 1e3)  # ms

    row = {
        "shape": f"T={t_total},B={b},N={n}",
        "parity_ok": ok,
        "max_abs_err": round(max_err, 6),
        "serial_ms": s_serial,
        "tree_ms": s_tree,
        "tree_over_serial": round(
            s_tree["median"] / s_serial["median"], 3
        ),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    print("backend:", jax.default_backend(), file=sys.stderr)
    fetch_s = fetch_overhead_s()
    rows = []
    for (t_total, b) in ((1000, 64), (16384, 8), (65536, 1)):
        rows.append(run_shape(t_total, b, 30, fetch_s))
    print(json.dumps({"assoc_tree": rows}))


if __name__ == "__main__":
    main()
