"""Big-vocabulary FCC dual-chain kernel: one HBM pass for alpha AND beta.

The large-N matmul tier (ops/fcc.py) is bandwidth-bound on streaming the
(N, N) exp-transition matrix from HBM: at N = 10k the matrix is ~200 MB
(bf16) and each of the two lax.scan recursions (alpha ascending, beta
descending) re-reads it every timestep — 2 x T x N^2 bytes, ~40 GB per
fwd+bwd step at the bench shape (T=100, B=8), which is the measured 83%%-
of-bandwidth floor of PERF_R2 §3.4.

The chains are independent, so their steps can be PAIRED: while alpha sits
at t (ascending) and beta at T-2-t (descending), both need a full pass
over the same matrix — alpha contracting columns (from-labels), beta
contracting rows.  This kernel runs both chains in ONE pallas_call that
streams each (gp, N) stripe of the matrix ONCE per paired step and feeds
it to both contractions while it is resident in VMEM:

    alpha_new[:, p-block] = xa        @ stripe^T   (contract stripe cols)
    beta_new  (full row) += xb[:, p-block] @ stripe (contract stripe rows)

halving the dominant HBM stream (2 x T x N^2 -> T x N^2 bytes).  The MXU
work is unchanged and remains far below the bandwidth floor (two (B, gp)
x (gp, N) products per stripe against a gp x N x ~2-byte read).

Numerics match the matmul tier exactly in structure: exp-domain
scaled-probability rows (running row-max normalization, per-batch offset
columns repaying the scaling), the same global exp(T - c) shift, emission
rows exponentiated against their own row max.  Exp-domain safety is the
FCC boundedness argument of ops/pallas/asg_kernels.py (full connectivity
bounds the within-row spread); the >60-nat transition guard in asg.py
covers this tier the same way it covers 'fused'.

Behavior parity: the (alpha, beta) log-domain streams equal
ops/fcc.py::_alpha_scan_mm / _beta_scan_mm (same recursions as the
reference's fully_connected_lattice.cpp:9-47) — pinned by
tests/test_bigvocab.py against the scan oracle on ragged batches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import (
    LANE,
    NEG_INF,
    SUBLANE,
    kernel_dtype,
    pad_axis,
    round_up,
    use_interpret,
)
from ..semiring import chain_precision


def _safe_max_rows(x):
    m = jnp.max(x, axis=-1, keepdims=True)
    return jnp.where(jnp.isfinite(m), m, 0.0)


def _exp_rows(x):
    """(exp(x - rowmax), rowmax) with all-(-inf) rows mapping to zeros."""
    c = _safe_max_rows(x)
    return jnp.exp(x - c), c


def _rescale(row):
    """Renormalize an exp-domain row to max 1; returns (row', log max)."""
    m = jnp.max(row, axis=1, keepdims=True)
    m_s = jnp.where(m > 0, m, 1.0)
    return row * (1.0 / m_s), jnp.log(m_s)


def _dual_kernel(
    li_ref, c_ref, pa0_ref, offa0_ref, ia_ref, ib_ref, e_ref,
    alpha_ref, beta_ref,
    pa_c, pb_c, offa_c, offb_c, cib_c, acc_a, acc_b, xa_c, xb_c,
    *, t_total, num_labels, gp, prec,
):
    st = pl.program_id(0)
    p = pl.program_id(1)
    np_ = pl.num_programs(1)
    li = li_ref[:]  # (B, 1) int32
    c = c_ref[0, 0]
    dt = pa_c.dtype
    dot_dt = xa_c.dtype
    n_pad = pa_c.shape[1]

    lane_n = lax.broadcasted_iota(jnp.int32, pa_c.shape, 1)
    seed_row = (lane_n < num_labels).astype(dt)  # beta seed: 1 on real labels

    @pl.when((st == 0) & (p == 0))
    def _():
        pa_c[:] = pa0_ref[:]
        offa_c[:] = offa0_ref[:]
        # beta seed at t = T-1 for batches with L_in == T (exp domain).
        pb_c[:] = jnp.where(li == t_total, seed_row, 0.0)
        offb_c[:] = jnp.zeros_like(offb_c)

    @pl.when(p == 0)
    def _():
        # Per-step contributions, built once per paired step:
        #   alpha consumes exp(alpha_{t-1} - offa) = pa as-is;
        #   beta consumes exp(I_{t+1} + beta_{t+1} - offsets) = pb * eib.
        eib, cib = _exp_rows(ib_ref[0])
        xa_c[:] = pa_c[:].astype(dot_dt)
        xb_c[:] = (pb_c[:] * eib).astype(dot_dt)
        cib_c[:] = cib
        acc_b[:] = jnp.zeros_like(acc_b)

    stripe = e_ref[:]  # (gp, n_pad) rows = from-labels j, cols = to-labels i
    # beta_t[i] = sum_j e[j, i] xb[j]: stripe rows are a j-block.
    acc_b[:] += lax.dot_general(
        xb_c[:, pl.ds(p * gp, gp)], stripe, (((1,), (0,)), ((), ())),
        preferred_element_type=dt, precision=prec,
    )
    # alpha_t[i] = sum_j e[i, j] xa[j]: stripe rows are an i-block, so the
    # contraction runs over stripe COLUMNS — same resident tile, no copy.
    acc_a[:, pl.ds(p * gp, gp)] = lax.dot_general(
        xa_c[:], stripe, (((1,), (1,)), ((), ())),
        preferred_element_type=dt, precision=prec,
    )

    @pl.when(p == np_ - 1)
    def _():
        # ---- alpha row t = st + 1: emission applied after the contraction
        eia, cia = _exp_rows(ia_ref[0])
        pa_new, logma = _rescale(acc_a[:] * eia)
        offa_new = offa_c[:] + cia + logma + c
        alpha_ref[0] = jnp.log(pa_new) + offa_new
        pa_c[:] = pa_new
        offa_c[:] = offa_new

        # ---- beta row t = t_total - 2 - st, with the per-batch re-seed
        t_b = t_total - 2 - st
        seed_b = li - 1 == t_b  # (B, 1)
        pb_raw, logmb = _rescale(acc_b[:])
        pb_new = jnp.where(seed_b, seed_row, pb_raw)
        offb_new = jnp.where(
            seed_b, 0.0, offb_c[:] + cib_c[:] + logmb + c
        )
        beta_ref[0] = jnp.log(pb_new) + offb_new
        pb_c[:] = pb_new
        offb_c[:] = offb_new


def fcc_dual_streams(
    transition: jnp.ndarray,
    inputs_m: jnp.ndarray,
    input_lengths: jnp.ndarray,
):
    """(alpha, beta) log-domain streams, each (T, B, N), one matrix pass.

    Drop-in replacement for the matmul tier's two lax.scans
    (ops/fcc.py::_alpha_scan_mm / _beta_scan_mm); ``inputs_m`` must be
    length-masked emissions (mask_emissions), exactly as the scans take.
    """
    t_total, num_batches, num_labels = inputs_m.shape
    dt = kernel_dtype(inputs_m)
    prec = chain_precision()
    # bf16 stripes iff one-pass precision on a compiled TPU kernel — the
    # same election XLA makes for the scan tier under DEFAULT precision.
    two_byte = (not use_interpret()) and prec == lax.Precision.DEFAULT
    dot_dt = jnp.bfloat16 if two_byte else dt
    # Stripe rows: 128 keeps the whole double-buffered working set ~10 MB
    # at N ~ 10k bf16 (gp=256 measured 17.66 MB scoped VMEM — over the
    # 16 MB limit); lane-dim dynamic slices require gp % 128 == 0.
    gp = 128
    n_pad = round_up(max(num_labels, LANE), gp)
    b_pad = round_up(max(num_batches, SUBLANE), SUBLANE)

    ip = pad_axis(
        pad_axis(inputs_m.astype(dt), b_pad, 1, NEG_INF), n_pad, 2, NEG_INF
    )
    li_col = pad_axis(input_lengths.astype(jnp.int32), b_pad, 0, 1)[:, None]

    cmax = jnp.max(transition)
    cmax = jnp.where(jnp.isfinite(cmax), cmax, 0.0).astype(dt)
    trans_p = pad_axis(
        pad_axis(transition.astype(dt), n_pad, 0, NEG_INF), n_pad, 1, NEG_INF
    )
    e = jnp.exp(trans_p - cmax).astype(dot_dt)

    # Chain boundary rows, computed in XLA (one (B, N) row each):
    # alpha_0 = I_0; beta_{T-1} = 0 where L_in == T else -inf.
    pa0, offa0 = _exp_rows(ip[0])
    b_last = jnp.where(
        (input_lengths == t_total)[:, None],
        jnp.zeros((num_batches, num_labels), inputs_m.dtype),
        NEG_INF,
    )
    nsteps = t_total - 1
    if nsteps == 0:
        # T = 1: alpha_0 = I_0, beta_0 = the seed row; no chain to run.
        return inputs_m, b_last[None].astype(inputs_m.dtype)

    kern = functools.partial(
        _dual_kernel, t_total=t_total, num_labels=num_labels, gp=gp,
        prec=prec,
    )
    const = lambda shape: pl.BlockSpec(
        shape, lambda st, p: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    row = jax.ShapeDtypeStruct((nsteps, b_pad, n_pad), dt)
    out_a, out_b = pl.pallas_call(
        kern,
        grid=(nsteps, n_pad // gp),
        in_specs=[
            const((b_pad, 1)),
            const((1, 1)),
            const((b_pad, n_pad)),
            const((b_pad, 1)),
            pl.BlockSpec(
                (1, b_pad, n_pad), lambda st, p: (st + 1, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, b_pad, n_pad), lambda st, p: (t_total - 1 - st, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (gp, n_pad), lambda st, p: (p, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, b_pad, n_pad), lambda st, p: (st, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, b_pad, n_pad),
                lambda st, p, _n=nsteps: (_n - 1 - st, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[row, row],
        scratch_shapes=[
            pltpu.VMEM((b_pad, n_pad), dt),
            pltpu.VMEM((b_pad, n_pad), dt),
            pltpu.VMEM((b_pad, 1), dt),
            pltpu.VMEM((b_pad, 1), dt),
            pltpu.VMEM((b_pad, 1), dt),
            pltpu.VMEM((b_pad, n_pad), dt),
            pltpu.VMEM((b_pad, n_pad), dt),
            pltpu.VMEM((b_pad, n_pad), dot_dt),
            pltpu.VMEM((b_pad, n_pad), dot_dt),
        ],
        interpret=use_interpret(),
    )(li_col, cmax[None, None], pa0, offa0, ip, ip, e)

    out_a = out_a[:, :num_batches, :num_labels].astype(inputs_m.dtype)
    out_b = out_b[:, :num_batches, :num_labels].astype(inputs_m.dtype)
    alpha = jnp.concatenate([inputs_m[:1], out_a], axis=0)
    beta = jnp.concatenate([out_b, b_last[None]], axis=0)
    return alpha, beta
