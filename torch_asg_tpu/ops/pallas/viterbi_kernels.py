"""Pallas TPU kernel for 1-best Viterbi decoding (tropical semiring).

The XLA decoder (ops/viterbi.py) materializes a (B, N, N) max-plus
candidate tensor per step; max-plus has no MXU form, so the per-step cost
is pure VPU work plus XLA's scan staging (~1 us/step at the benchmark
shape).  This kernel replaces the candidate tensor with the ROTATION
TRICK: for destination labels i (on lanes) the k-th candidate is

    cand_k[b, i] = d[b, (i + k) mod N] + T[i, (i + k) mod N]

so one static lane-roll of the carry + one add + one max per k —
N_real small vector ops per step on VMEM-resident vregs, no (B, N, N)
materialization and no per-step HBM round-trip of the carry.  The carry
is stored DUPLICATED across 2N lanes (dup[i] = dup[i + N] = d[i mod N])
so the mod-N wraparound falls out of a plain lane roll.  Backpointers
stream out at raw label width; the backtrace is the same XLA scan the
one-shot decoder uses (O(T B) gathers, not on the critical path).

Tie-breaking matches jnp.argmax (lowest source label j wins) via an
explicit (cand == best) & (j < bidx) select, so results are bit-identical
to the XLA decoder including exact ties.

Reference basis: the tropical-semiring generalization of the reference's
tech report (zh217/torch-asg ``doc/tech_report.tex:84-88``) — the decoder
itself is a roadmap item the reference never shipped (``README.md:33``).
VERDICT r2 next-round item 2: measured go/no-go vs the XLA decoder.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import (LANE, NEG_INF, SUBLANE, kernel_dtype, pad_axis,
                     round_up, use_interpret)
from .asg_kernels import ASG_TIME_BLOCK, _const, _asc, _desc, _lane_pad

# The rotation loop is statically unrolled N_real times per frame (x kb
# frames per block); past this label count compile time and VMEM for the
# rotated-transition table stop paying — the chunked XLA path takes over.
# Measured adjudication (scripts/exp_r4_vit_wide.py, real TPU, B=32
# T=500): speedup 1.96x at N=128, 0.84x at N=256 (40 s kernel compile),
# and at N=512 the kernel fails scoped-VMEM allocation outright (42.5 MB
# rotated table + dup carry vs the 16 MB limit).  128 is the crossover.
VITERBI_KERNEL_MAX_LABELS = 128


def _roll_lanes(x, shift):
    """Static lane roll (jnp.roll semantics along axis 1)."""
    if shift == 0:
        return x
    if use_interpret():
        return jnp.roll(x, shift, axis=1)
    return pltpu.roll(x, shift, axis=1)


def _vit_kernel(
    li_ref, trot_ref, jidx_ref, ip_ref, bp_ref, dend_ref, d_c, dend_c,
    *, kb, num_labels, dup_pad,
):
    k_blk = pl.program_id(0)

    @pl.when(k_blk == 0)
    def _():
        d_c[:] = jnp.full_like(d_c, NEG_INF)
        dend_c[:] = jnp.full_like(dend_c, NEG_INF)

    li = li_ref[:]  # (b_pad, 1) int32
    d = d_c[:]
    dend = dend_c[:]
    bp_rows = []
    base_t = k_blk * kb
    for r in range(kb):
        i_t = _lane_pad(ip_ref[r], dup_pad, NEG_INF)  # (b_pad, dup_pad)
        # k = 0 seeds best/bidx; each further k is roll+add+cmp+2 selects
        best = d + trot_ref[pl.ds(0, 1), :]
        bidx = jnp.broadcast_to(jidx_ref[pl.ds(0, 1), :], best.shape)
        for k in range(1, num_labels):
            cand = (
                _roll_lanes(d, (dup_pad - k) % dup_pad)
                + trot_ref[pl.ds(k, 1), :]
            )
            jrow = jidx_ref[pl.ds(k, 1), :]
            upd = (cand > best) | ((cand == best) & (jrow < bidx))
            best = jnp.where(upd, cand, best)
            bidx = jnp.where(upd, jrow, bidx)
        t = base_t + r  # traced via program_id; only r is static
        if r == 0:
            # frame 0 (block 0 only) seeds d = I_0 with identity backptrs
            first = k_blk == 0
            ident = jnp.broadcast_to(jidx_ref[pl.ds(0, 1), :], bidx.shape)
            d_new = jnp.where(first, i_t, i_t + best)
            bp_rows.append(jnp.where(first, ident, bidx))
        else:
            d_new = i_t + best
            bp_rows.append(bidx)
        # re-duplicate across lanes [N, 2N): d_new is -inf past lane N, so
        # max with the +N roll writes the copy without a select
        d = jnp.maximum(d_new, _roll_lanes(d_new, num_labels))
        # capture the end row at each element's true last frame
        dend = jnp.where(li - 1 == t, d, dend)
    d_c[:] = d
    dend_c[:] = dend
    n_raw = bp_ref.shape[2]
    bp_ref[:] = jnp.stack([row[:, :n_raw] for row in bp_rows], axis=0)

    @pl.when(k_blk == pl.num_programs(0) - 1)
    def _():
        dend_ref[:] = dend


def viterbi_forward_pallas(transition, inputs, input_lengths):
    """(d_end (B, N), backptr (T, B, N) int32) — kernel-side forward pass.

    backptr[t] maps the label AT frame t to the label at frame t-1
    (frame 0 carries the identity row, never read by the backtrace).
    """
    t_total, num_batches, num_labels = inputs.shape
    dt = kernel_dtype(inputs)
    inputs = inputs.astype(dt)
    transition = transition.astype(dt)

    kb = ASG_TIME_BLOCK
    b_pad = round_up(max(num_batches, SUBLANE), SUBLANE)
    t_pad = round_up(t_total, kb)
    dup_pad = round_up(max(2 * num_labels, LANE), LANE)
    k_pad = round_up(max(num_labels, SUBLANE), SUBLANE)
    nb = t_pad // kb

    from ..semiring import NEG_INF as _NI
    from ...utils.lengths import mask_emissions

    inputs_m = mask_emissions(inputs, input_lengths)
    ip = pad_axis(pad_axis(inputs_m, b_pad, 1, _NI), t_pad, 0, _NI)

    i_idx = jnp.arange(dup_pad)[None, :]  # destination lanes
    k_idx = jnp.arange(k_pad)[:, None]  # rotation index
    j_idx = (i_idx + k_idx) % num_labels  # source label per (k, i)
    valid = (i_idx < num_labels) & (k_idx < num_labels)
    # trot[k, i] = T[i, (i+k) mod N]: the k-th circulant diagonal of
    # [T|T], all N of them extracted at once by the classic pad-and-
    # reshape trick (flatten (N, 2N), pad N, view as (N, 2N+1): column k
    # walks diagonal k) — no advanced-indexing gather (serializes on
    # TPU; repo convention, see CLAUDE.md)
    tdup = jnp.concatenate([transition, transition], axis=1).reshape(-1)
    tdup = jnp.concatenate([tdup, jnp.zeros((num_labels,), tdup.dtype)])
    diags = tdup.reshape(num_labels, 2 * num_labels + 1).T[:num_labels]
    trot = jnp.where(valid, pad_axis(
        pad_axis(diags.astype(dt), k_pad, 0, 0.0), dup_pad, 1, 0.0
    ), _NI)
    jidx = jnp.where(valid, j_idx, 0).astype(jnp.int32)
    li_col = pad_axis(input_lengths.astype(jnp.int32), b_pad, 0, 1)[:, None]

    kern = functools.partial(
        _vit_kernel, kb=kb, num_labels=num_labels, dup_pad=dup_pad
    )
    bp, dend = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            _const((b_pad, 1)),
            _const((k_pad, dup_pad)),
            _const((k_pad, dup_pad)),
            _asc(kb, b_pad, num_labels),
        ],
        out_specs=[
            _asc(kb, b_pad, num_labels),
            _const((b_pad, dup_pad)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, b_pad, num_labels), jnp.int32),
            jax.ShapeDtypeStruct((b_pad, dup_pad), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((b_pad, dup_pad), dt),
            pltpu.VMEM((b_pad, dup_pad), dt),
        ],
        interpret=use_interpret(),
    )(li_col, trot, jidx, ip)
    return (
        dend[:num_batches, :num_labels],
        bp[:t_total, :num_batches, :],
    )


def _alignf_kernel(
    li_ref, st_ref, nt_ref, ap_ref, adv_ref, dend_ref, d_c, dend_c,
    *, kb, s_pad,
):
    """Forced-alignment forward (aligned/FAC lattice, tropical semiring).

    Two-edge recursion per frame — stay (self-loop) vs advance from slot
    s-1 (a single +1 lane shift, no rotation loop) — with a one-BIT
    backpointer per (b, s): advanced = move > stay, exactly the XLA
    oracle's tie-breaking (tie -> stay).  The end row d[t = L_in-1] is
    captured online; no (T, B, S) delta is ever materialized.
    """
    k_blk = pl.program_id(0)

    @pl.when(k_blk == 0)
    def _():
        d_c[:] = jnp.full_like(d_c, NEG_INF)
        dend_c[:] = jnp.full_like(dend_c, NEG_INF)

    li = li_ref[:]  # (b_pad, 1) int32
    st = st_ref[:]  # (b_pad, s_pad) self-loop transition, 0 at padding
    nt = nt_ref[:]  # (b_pad, s_pad) advance transition, 0 at padding
    d = d_c[:]
    dend = dend_c[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, s_pad), 1)
    adv_rows = []
    base_t = k_blk * kb
    first = k_blk == 0
    for r in range(kb):
        i_t = _lane_pad(ap_ref[r], s_pad, NEG_INF)  # (b_pad, s_pad)
        stay = d + st
        move = _roll_lanes(d + nt, 1)
        move = jnp.where(lane == 0, NEG_INF, move)
        d_new = i_t + jnp.maximum(stay, move)
        advb = (move > stay).astype(jnp.int32)
        if r == 0:
            # frame 0 (block 0 only): d seeds at slot 0; bit row 0 is a
            # dummy (the backtrace never reads the step into frame 0)
            d_new = jnp.where(first, jnp.where(lane == 0, i_t, NEG_INF), d_new)
            advb = jnp.where(first, 0, advb)
        adv_rows.append(advb)
        d = d_new
        t = base_t + r
        dend = jnp.where(li - 1 == t, d, dend)
    d_c[:] = d
    dend_c[:] = dend
    s_raw = adv_ref.shape[2]
    adv_ref[:] = jnp.stack([row[:, :s_raw] for row in adv_rows], axis=0)

    @pl.when(k_blk == pl.num_programs(0) - 1)
    def _():
        dend_ref[:] = dend


def align_forward_pallas(lat, input_lengths):
    """(d_end (B, S), adv (T, B, S) int32) from an ``AlignedLattice``.

    adv[t][b, s] == 1 iff the best path into frame t at slot s advanced
    from slot s-1 (row 0 is a dummy).  Kernel twin of the ``fstep`` scan
    in ``ops.viterbi.viterbi_align`` — bit-identical bits and end row.
    """
    t_total, num_batches, s_total = lat.inputs.shape
    dt = kernel_dtype(lat.inputs)

    kb = ASG_TIME_BLOCK
    b_pad = round_up(max(num_batches, SUBLANE), SUBLANE)
    t_pad = round_up(t_total, kb)
    s_pad = round_up(max(s_total, LANE), LANE)
    nb = t_pad // kb

    from ..semiring import NEG_INF as _NI

    ap = pad_axis(
        pad_axis(lat.inputs.astype(dt), b_pad, 1, _NI), t_pad, 0, _NI
    )
    st = pad_axis(pad_axis(lat.self_trans.astype(dt), b_pad, 0, 0.0),
                  s_pad, 1, 0.0)
    nt = pad_axis(pad_axis(lat.next_trans.astype(dt), b_pad, 0, 0.0),
                  s_pad, 1, 0.0)
    li_col = pad_axis(input_lengths.astype(jnp.int32), b_pad, 0, 1)[:, None]

    kern = functools.partial(_alignf_kernel, kb=kb, s_pad=s_pad)
    adv, dend = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            _const((b_pad, 1)),
            _const((b_pad, s_pad)),
            _const((b_pad, s_pad)),
            _asc(kb, b_pad, s_total),
        ],
        out_specs=[
            _asc(kb, b_pad, s_total),
            _const((b_pad, s_pad)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, b_pad, s_total), jnp.int32),
            jax.ShapeDtypeStruct((b_pad, s_pad), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((b_pad, s_pad), dt),
            pltpu.VMEM((b_pad, s_pad), dt),
        ],
        interpret=use_interpret(),
    )(li_col, st, nt, ap)
    return (
        dend[:num_batches, :s_total],
        adv[:t_total, :num_batches, :],
    )


def _albt_kernel(li_ref, es_ref, advs_ref, pos_ref, pos_c, *, kb):
    """Alignment backtrace: walk the advance bits tail-to-head.

    advs_ref holds the SHIFTED bits (frame t's block row is adv[t + 1],
    the step from frame t to t + 1); frames t >= L_b - 1 never read it.
    The position decrements by the selected bit — the select is the same
    one-hot lane reduce as the decode backtrace.
    """
    k_blk = pl.program_id(0)

    @pl.when(k_blk == 0)
    def _():
        pos_c[:] = jnp.zeros_like(pos_c)

    li = li_ref[:]  # (b_pad, 1)
    es = es_ref[:]  # (b_pad, 1) end slot = L_out - 1
    pos = pos_c[:]
    s_raw = advs_ref.shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, s_raw), 1)
    rows = []
    base_t = (pl.num_programs(0) - 1 - k_blk) * kb
    for r in range(kb - 1, -1, -1):  # descending within the block
        t = base_t + r
        hit = lane == jnp.maximum(pos, 0)
        took = jnp.sum(jnp.where(hit, advs_ref[r], 0), axis=1, keepdims=True)
        prev = jnp.maximum(pos, 0) - took
        pos = jnp.where(li - 1 == t, es, jnp.where(t < li - 1, prev, -1))
        rows.append(pos)
    pos_c[:] = pos
    pos_ref[:] = jnp.stack(rows[::-1], axis=0)  # back to ascending


def align_backtrace_pallas(end_s, adv, input_lengths):
    """(T, B) int32 target positions from the advance-bit stream —
    bit-identical to the ``bstep`` scan in ``ops.viterbi.viterbi_align``."""
    t_total, num_batches, s_raw = adv.shape
    kb = ASG_TIME_BLOCK
    b_pad = round_up(max(num_batches, SUBLANE), SUBLANE)
    t_pad = round_up(t_total, kb)
    nb = t_pad // kb

    # shift so block row r of frame t holds adv[t + 1] (the step t -> t+1);
    # the shifted-in tail row is never read (t >= L - 1 is reset/padding)
    advs = jnp.concatenate([adv[1:], adv[-1:]], axis=0)
    advs = pad_axis(pad_axis(advs, b_pad, 1, 0), t_pad, 0, 0)
    es_col = pad_axis(end_s.astype(jnp.int32), b_pad, 0, 0)[:, None]
    li_col = pad_axis(input_lengths.astype(jnp.int32), b_pad, 0, 1)[:, None]

    kern = functools.partial(_albt_kernel, kb=kb)
    pos = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            _const((b_pad, 1)),
            _const((b_pad, 1)),
            _desc(kb, b_pad, s_raw, nb),
        ],
        out_specs=_desc(kb, b_pad, 1, nb),
        out_shape=jax.ShapeDtypeStruct((t_pad, b_pad, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((b_pad, 1), jnp.int32)],
        interpret=use_interpret(),
    )(li_col, es_col, advs)
    return pos[:t_total, :num_batches, 0]


def _bt_kernel(li_ref, fin_ref, bps_ref, path_ref, lab_c, *, kb, t_pad):
    """Backtrace: walk the backpointers tail-to-head.

    bps_ref holds the SHIFTED backpointers (frame t's block row is
    bp[t + 1], the map from the label at t+1 to the label at t); frames
    t >= L_b - 1 never read it (reset / padding), so the garbage row
    shifted in at t = T - 1 is dead by construction.
    """
    k_blk = pl.program_id(0)

    @pl.when(k_blk == 0)
    def _():
        lab_c[:] = jnp.zeros_like(lab_c)

    li = li_ref[:]  # (b_pad, 1)
    fin = fin_ref[:]  # (b_pad, 1)
    lab = lab_c[:]
    n_raw = bps_ref.shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n_raw), 1)
    rows = []
    base_t = (pl.num_programs(0) - 1 - k_blk) * kb
    for r in range(kb - 1, -1, -1):  # descending within the block
        t = base_t + r
        # prev = bp[t + 1][b, lab]: lane-select + sum (gathers serialize
        # on TPU; the one-hot reduce is the vectorized form)
        hit = lane == jnp.maximum(lab, 0)
        prev = jnp.sum(jnp.where(hit, bps_ref[r], 0), axis=1, keepdims=True)
        lab = jnp.where(
            li - 1 == t, fin, jnp.where(t < li - 1, prev, -1)
        )
        rows.append(lab)
    lab_c[:] = lab
    path_ref[:] = jnp.stack(rows[::-1], axis=0)  # back to ascending


def viterbi_backtrace_pallas(final_labels, backptr, input_lengths):
    """(T, B) int32 path from (T, B, N) backpointers — kernel-side twin of
    ops.viterbi._backtrace_1best's scan (bit-identical outputs).

    backptr[t] maps the label at frame t to the label at frame t-1
    (the forward kernel's convention; frame 0 is identity, unused).
    """
    t_total, num_batches, n_raw = backptr.shape
    kb = ASG_TIME_BLOCK
    b_pad = round_up(max(num_batches, SUBLANE), SUBLANE)
    t_pad = round_up(t_total, kb)
    nb = t_pad // kb

    # shift so block row r of frame t holds bp[t + 1]; the shifted-in tail
    # rows are never read (t >= L - 1 is reset or padding)
    bps = jnp.concatenate([backptr[1:], backptr[-1:]], axis=0)
    bps = pad_axis(pad_axis(bps, b_pad, 1, 0), t_pad, 0, 0)
    fin_col = pad_axis(final_labels.astype(jnp.int32), b_pad, 0, 0)[:, None]
    li_col = pad_axis(input_lengths.astype(jnp.int32), b_pad, 0, 1)[:, None]

    kern = functools.partial(_bt_kernel, kb=kb, t_pad=t_pad)
    paths = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            _const((b_pad, 1)),
            _const((b_pad, 1)),
            _desc(kb, b_pad, n_raw, nb),
        ],
        out_specs=_desc(kb, b_pad, 1, nb),
        out_shape=jax.ShapeDtypeStruct((t_pad, b_pad, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((b_pad, 1), jnp.int32)],
        interpret=use_interpret(),
    )(li_col, fin_col, bps)
    return paths[:t_total, :num_batches, 0]
