"""Viterbi decoding and forced alignment in the tropical (max) semiring.

The reference leaves "Viterbi decoder" as an unchecked roadmap item
(zh217/torch-asg ``README.md:33``); its tech report sketches the math as
the B -> inf limit of the generalized log semiring
(``doc/tech_report.tex:78-88``).  Both decoders here reuse the ASG lattice
recursions with max instead of logsumexp, plus an argmax backtrace:

  * ``viterbi_decode``: best unconstrained label path through the
    fully-connected lattice (the decoding counterpart of fcc_score).
  * ``viterbi_align``: best monotonic alignment of the target sequence to
    the frames (the segmentation that gives ASG its name; counterpart of
    fac_score).
  * ``viterbi_nbest``: the k best distinct paths (LM rescoring).
  * ``beam_decode``: beam-pruned approximate decode for wordpiece-scale
    vocabularies — O(T B N K) instead of O(T B N^2), exact at K >= N.

Ragged lengths are masked exactly like the loss kernels; emitted paths use
-1 at padding frames.

Implementation tiers (selected by ``impl='auto'``, measured on one TPU
chip — docs/PERF_R3.md §2):

  * N <= 128: the rotation-trick Pallas kernel pair
    (ops/pallas/viterbi_kernels.py) — a lane-rolled max-plus forward
    plus a one-hot lane-select backtrace kernel.  Full decode (scores
    AND paths) runs 3.3x the XLA scan at the benchmark shape
    (B=64, T=1000, N=30: 0.93 ms vs 3.1 ms) and up to 10.6x at
    letters-long shapes, bit-identical including tie-breaking.  The
    dominant XLA cost it removes is not the max-plus step but the
    backtrace's per-step row select, which XLA lowers to a serialized
    gather (~1.7 us/step).
  * wider vocabularies: XLA ``lax.scan`` with the (B, N, N) candidate
    step, destination-chunked past ``_CHUNK_MIN_LABELS`` so only
    (B, chunk, N) is live; the backtrace uses the same one-hot
    ``_select_rows`` trick in XLA form (gather-free, exact).

The decoders share the loss path's DP structure: the same masking
(mask_emissions), the same aligned-lattice gather (make_aligned), and the
recursions with (max, argmax) substituted for logsumexp.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .fac import make_aligned, _shift_right_s
from .semiring import NEG_INF
from ..utils.lengths import mask_emissions


# Beyond this many labels, the decoder's per-step (B, N, N) max-plus
# tensor is computed in destination chunks to bound live memory.
_CHUNK_MIN_LABELS = 1024
_CHUNK_SIZE = 512

# ``lax.top_k`` over very wide axes is pathological on TPU: at width
# 40,000 (N=10k, k=4) its sort-based lowering hangs the remote compiler
# for 15+ minutes and a compiled instance crashes the TPU worker process
# outright (round-3 serving sweep).  Past this width we extract the k
# maxima iteratively — k (max, argmax, mask) reduction sweeps, broadcast
# compares only, no sort and no gather — which matches lax.top_k
# exactly, including ascending-index order among ties.
_TOPK_SORT_MAX_WIDTH = 4096


def _topk(x: jnp.ndarray, k: int):
    """``lax.top_k`` with a reduction-based fallback for wide axes."""
    if k > x.shape[-1]:
        # lax.top_k raises here; the fallback would otherwise silently
        # emit the out-of-range index ``width`` once all entries are
        # taken.  Keep both branches on the same contract.
        raise ValueError(
            f"_topk: k={k} exceeds last-axis width {x.shape[-1]}")
    if x.shape[-1] <= _TOPK_SORT_MAX_WIDTH:
        vals, idx = lax.top_k(x, k)
        return vals, idx.astype(jnp.int32)
    iota = lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    # A 'taken' mask rather than overwriting with NEG_INF: on a row whose
    # remaining entries are already -inf (nbest's unseeded rank slots),
    # overwriting is a no-op and argmax would re-pick index 0 forever,
    # while lax.top_k emits ascending DISTINCT indices.  The candidate
    # set 'equal to the max AND not yet taken' with a min-iota pick
    # reproduces top_k exactly for every input, -inf ties included.
    taken = jnp.zeros(x.shape, bool)
    width = x.shape[-1]
    vs, ids = [], []
    for _ in range(k):
        masked = jnp.where(taken, NEG_INF, x)
        v = jnp.max(masked, axis=-1)
        cand = (masked == v[..., None]) & ~taken
        i = jnp.min(jnp.where(cand, iota, width), axis=-1).astype(jnp.int32)
        vs.append(v)
        ids.append(i)
        taken = taken | (iota == i[..., None])
    return jnp.stack(vs, axis=-1), jnp.stack(ids, axis=-1)


def _select_rows(vals: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``vals[b, idx[b, r]]`` as (B, k) — the backtrace's per-step row
    pick — WITHOUT a serialized TPU gather.

    ``take_along_axis`` lowers to a gather, which XLA serializes on TPU;
    inside the T-step backtrace scans that cost ~1.7 us/step at the
    benchmark shape (73% of the whole XLA decode, docs/PERF_R3.md §2).
    The one-hot compare + masked sum is pure VPU work — the same trick
    the Pallas backtrace kernel uses in VMEM — and is exact: ``idx`` is
    clipped to [0, M), so exactly one mask element is true per (b, r)
    and the sum reproduces the selected value bit-for-bit (ints and
    floats alike; non-selected lanes contribute a literal 0).
    """
    m = vals.shape[1]
    mask = lax.broadcasted_iota(jnp.int32, (1, m, 1), 1) == idx[:, None, :]
    # dtype pinned: jnp.sum would promote int32 -> int64 under x64 mode
    return jnp.sum(jnp.where(mask, vals[:, :, None], 0), axis=1,
                   dtype=vals.dtype)


def _select_row(vals: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``vals[b, idx[b]]`` as (B,) — the k=1 form of ``_select_rows``."""
    return _select_rows(vals, idx[:, None])[:, 0]


class ViterbiResult(NamedTuple):
    scores: jnp.ndarray  # (B,) best-path scores
    paths: jnp.ndarray  # (T, B) int32 labels, -1 at padding frames


def _maxplus_argmax(transition, d_prev):
    """(best, argmax) over j of ``transition[i, j] + d_prev[b, j]``.

    The (B, N, N) candidate tensor is materialized whole at letter scale;
    past ``_CHUNK_MIN_LABELS`` destination rows are processed in chunks so
    only (B, chunk, N) is live (max-plus has no matmul form, so the work
    is unavoidable — the memory is not).  Shared by the one-shot decoder
    and the streaming decoder so tie-breaking is identical.
    """
    num_labels = transition.shape[0]
    num_batches = d_prev.shape[0]
    if num_labels <= _CHUNK_MIN_LABELS:
        cand = transition[None, :, :] + d_prev[:, None, :]  # (B, to, from)
        return jnp.max(cand, axis=2), jnp.argmax(cand, axis=2).astype(jnp.int32)

    ck = _CHUNK_SIZE
    n_pad = -(-num_labels // ck) * ck
    trans_p = jnp.pad(
        transition, ((0, n_pad - num_labels), (0, 0)), constant_values=NEG_INF
    ).reshape(n_pad // ck, ck, num_labels)

    def chunk(rows):  # (ck, N) transition rows
        cand = rows[None] + d_prev[:, None, :]  # (B, ck, N)
        return jnp.max(cand, axis=2), jnp.argmax(cand, axis=2)

    maxs, args = lax.map(chunk, trans_p)  # (nc, B, ck) each
    best = jnp.transpose(maxs, (1, 0, 2)).reshape(num_batches, n_pad)
    bp = jnp.transpose(args, (1, 0, 2)).reshape(num_batches, n_pad)
    return best[:, :num_labels], bp[:, :num_labels].astype(jnp.int32)


class AlignmentResult(NamedTuple):
    scores: jnp.ndarray  # (B,) best-alignment scores
    positions: jnp.ndarray  # (T, B) int32 target positions s_t, -1 at padding
    labels: jnp.ndarray  # (T, B) int32 aligned labels targets[b, s_t], -1 at padding


def _backtrace_1best(d_end, backptr, input_lengths, t_total) -> ViterbiResult:
    """Shared backtrace: d_end (B, N) end rows, backptr (T-1, B, N) where
    backptr[t-1] maps the label at frame t to the label at frame t-1."""
    num_batches = d_end.shape[0]
    scores = jnp.max(d_end, axis=1)
    final_labels = jnp.argmax(d_end, axis=1).astype(jnp.int32)

    # Backtrace with per-batch end masking: at t == L-1 reset to the final
    # argmax; before it follow the backpointers; at padding emit -1.
    pad = jnp.full((num_batches,), -1, jnp.int32)
    lab_last = jnp.where(input_lengths - 1 == t_total - 1, final_labels, pad)

    def bstep(lab_next, xs):
        t, bp_t = xs  # bp_t maps label at t+1 -> label at t
        prev = _select_row(bp_t, jnp.clip(lab_next, 0))
        lab_t = jnp.where(
            input_lengths - 1 == t,
            final_labels,
            jnp.where(t < input_lengths - 1, prev, pad),
        )
        return lab_t, lab_t

    ts = jnp.arange(t_total - 2, -1, -1)
    _, labs = lax.scan(bstep, lab_last, (ts, backptr[::-1]))
    paths = jnp.concatenate([labs[::-1], lab_last[None]], axis=0)
    return ViterbiResult(scores, paths)


def viterbi_decode(
    transition: jnp.ndarray,
    inputs: jnp.ndarray,
    input_lengths: Optional[jnp.ndarray] = None,
    *,
    impl: str = "auto",
) -> ViterbiResult:
    """Best label path per batch element.

    transition: (N, N) [i, j] = score j -> i; inputs: (T, B, N).
    impl: 'pallas' (rotation-trick max-plus kernel; letter-scale
    vocabularies), 'xla' (lax.scan with the (B, N, N) candidate step;
    chunked past _CHUNK_MIN_LABELS), or 'auto' (pallas up to the kernel's
    width budget, xla beyond).  Identical results including exact-tie
    backpointers (pinned by tests/test_viterbi.py).
    """
    t_total, num_batches, num_labels = inputs.shape
    if input_lengths is None:
        input_lengths = jnp.full((num_batches,), t_total, dtype=jnp.int32)
    # same boundary upcast as the loss path (asg._prep): path scores
    # accumulate over T steps, too long for half-precision mantissas
    if inputs.dtype in (jnp.bfloat16, jnp.float16):
        inputs = inputs.astype(jnp.float32)
    transition = transition.astype(inputs.dtype)

    from .pallas.common import use_interpret
    from .pallas.viterbi_kernels import VITERBI_KERNEL_MAX_LABELS

    if impl == "auto":
        # the kernel wins on the real TPU (measured, scripts/exp_r3_vit.py);
        # off-TPU interpret mode would only slow the oracle path down
        impl = (
            "pallas"
            if num_labels <= VITERBI_KERNEL_MAX_LABELS and not use_interpret()
            else "xla"
        )
    if impl == "pallas":
        if num_labels > VITERBI_KERNEL_MAX_LABELS:
            raise ValueError(
                f"impl='pallas' unrolls the rotation loop num_labels times "
                f"per frame and supports num_labels <= "
                f"{VITERBI_KERNEL_MAX_LABELS}; got {num_labels}.  Use "
                f"impl='xla' (chunked candidate tensor) for wordpiece-scale "
                f"vocabularies."
            )
        from .pallas.viterbi_kernels import (
            viterbi_backtrace_pallas, viterbi_forward_pallas,
        )

        d_end, bp = viterbi_forward_pallas(transition, inputs, input_lengths)
        scores = jnp.max(d_end, axis=1)
        final_labels = jnp.argmax(d_end, axis=1).astype(jnp.int32)
        # kernel backtrace: the XLA T-step gather scan costs ~1.7 ms at the
        # benchmark shape (73% of decode, scripts/exp_r3_vit.py) — the
        # one-hot lane-select walk in VMEM replaces it
        paths = viterbi_backtrace_pallas(final_labels, bp, input_lengths)
        return ViterbiResult(scores, paths)
    if impl != "xla":
        raise ValueError(
            f"unknown impl {impl!r}; expected 'auto', 'pallas', or 'xla'"
        )
    inputs_m = mask_emissions(inputs, input_lengths)

    def fstep(carry, xs):
        d_prev, d_end = carry
        t, i_t = xs
        best, bp = _maxplus_argmax(transition, d_prev)
        d = i_t + best
        # online readout at each utterance's true end (no stored delta)
        d_end = jnp.where((input_lengths - 1 == t)[:, None], d, d_end)
        return (d, d_end), bp

    d0 = inputs_m[0]
    ts_f = jnp.arange(1, t_total, dtype=input_lengths.dtype)
    (_, d_end), backptr = lax.scan(fstep, (d0, d0), (ts_f, inputs_m[1:]))
    return _backtrace_1best(d_end, backptr, input_lengths, t_total)


class SegmentsResult(NamedTuple):
    starts: jnp.ndarray  # (B, S) int32 first frame of slot s, -1 if unused
    ends: jnp.ndarray  # (B, S) int32 last frame (inclusive), -1 if unused


def alignment_segments(
    alignment: AlignmentResult, s_total: int
) -> SegmentsResult:
    """Frame spans per target slot from a ``viterbi_align`` result.

    The segmentation that gives ASG its name, in timestamp form: slot s
    of batch element b occupies frames ``starts[b, s] .. ends[b, s]``
    (inclusive; multiply by the frontend's frame stride for seconds).
    ``s_total`` is the (static) padded target width S.  Slots past
    ``target_lengths[b]`` are (-1, -1).  Spans partition each utterance:
    starts[b, 0] == 0 and consecutive spans abut (monotone alignment,
    one slot per frame).
    """
    positions = alignment.positions  # (T, B) int32, -1 at padding
    t_total, num_batches = positions.shape
    slot = jnp.arange(s_total, dtype=jnp.int32)[None, None, :]  # (1,1,S)
    hit = positions[:, :, None] == slot  # (T, B, S)
    ts = jnp.arange(t_total, dtype=jnp.int32)[:, None, None]
    starts = jnp.min(jnp.where(hit, ts, t_total), axis=0)
    ends = jnp.max(jnp.where(hit, ts, -1), axis=0)
    used = ends >= 0
    starts = jnp.where(used, starts, -1).astype(jnp.int32)
    ends = ends.astype(jnp.int32)
    return SegmentsResult(starts, ends)


class NBestResult(NamedTuple):
    scores: jnp.ndarray  # (B, K) best-path scores, descending per batch
    paths: jnp.ndarray  # (T, B, K) int32 labels, -1 at padding frames


def _maxplus_topk(transition, d_prev, k):
    """(vals, flat_idx) of the top-k over j,r of
    ``transition[i, j] + d_prev[b, j, r]``; flat index = j*k + r.

    Destination rows are chunked past ``_CHUNK_MIN_LABELS`` (chunk size
    scaled down by k) so only (B, chunk, N*k) is live.
    """
    num_labels = transition.shape[0]
    num_batches = d_prev.shape[0]
    cand_of = lambda rows: (
        rows[None, :, :, None] + d_prev[:, None, :, :]
    ).reshape(num_batches, rows.shape[0], num_labels * k)
    # the unchunked tensor is (B, N, N*k) — k times the 1-best envelope —
    # so the chunk threshold scales down with k
    if num_labels <= max(1, _CHUNK_MIN_LABELS // k):
        return _topk(cand_of(transition), k)  # (B, N, k)

    ck = max(1, _CHUNK_SIZE // k)
    n_pad = -(-num_labels // ck) * ck
    trans_p = jnp.pad(
        transition, ((0, n_pad - num_labels), (0, 0)), constant_values=NEG_INF
    ).reshape(n_pad // ck, ck, num_labels)
    vals, idx = lax.map(lambda rows: _topk(cand_of(rows), k), trans_p)
    vals = jnp.transpose(vals, (1, 0, 2, 3)).reshape(num_batches, n_pad, k)
    idx = jnp.transpose(idx, (1, 0, 2, 3)).reshape(num_batches, n_pad, k)
    return vals[:, :num_labels], idx[:, :num_labels].astype(jnp.int32)


def viterbi_nbest(
    transition: jnp.ndarray,
    inputs: jnp.ndarray,
    k: int,
    input_lengths: Optional[jnp.ndarray] = None,
) -> NBestResult:
    """The k best label paths per batch element (for LM rescoring etc.).

    Standard n-best Viterbi: the lattice state is (label, rank); each
    (i, r) slot holds the score of the r-th best path ending in label i,
    so the k slots per label are k DISTINCT paths by construction and the
    final top-k over all (i, r) is exactly the k best paths overall.
    ``k=1`` coincides with ``viterbi_decode`` (pinned by tests).  If
    fewer than k paths exist (k > N at T=1), the tail ranks carry -inf
    scores and arbitrary labels.  Work is O(T B N^2 k); memory is
    chunked past ``_CHUNK_MIN_LABELS`` labels like the 1-best decoder.
    """
    t_total, num_batches, num_labels = inputs.shape
    if input_lengths is None:
        input_lengths = jnp.full((num_batches,), t_total, dtype=jnp.int32)
    if inputs.dtype in (jnp.bfloat16, jnp.float16):
        inputs = inputs.astype(jnp.float32)
    transition = transition.astype(inputs.dtype)
    inputs_m = mask_emissions(inputs, input_lengths)

    d0 = jnp.full((num_batches, num_labels, k), NEG_INF, inputs.dtype)
    d0 = d0.at[:, :, 0].set(inputs_m[0])

    def fstep(carry, xs):
        d_prev, d_end = carry
        t, i_t = xs
        vals, idx = _maxplus_topk(transition, d_prev, k)
        d = i_t[:, :, None] + vals
        d_end = jnp.where((input_lengths - 1 == t)[:, None, None], d, d_end)
        return (d, d_end), idx

    ts_f = jnp.arange(1, t_total, dtype=input_lengths.dtype)
    (_, d_end), backptr = lax.scan(fstep, (d0, d0), (ts_f, inputs_m[1:]))

    flat_end = d_end.reshape(num_batches, num_labels * k)
    scores, flat_fin = _topk(flat_end, k)  # (B, k) each

    # Backtrace in flat (label*k + rank) coordinates, same end masking as
    # the 1-best decoder; -1 marks padding frames.
    pad = jnp.full((num_batches, k), -1, jnp.int32)
    flat_last = jnp.where(
        (input_lengths - 1 == t_total - 1)[:, None], flat_fin, pad
    )

    def bstep(flat_next, xs):
        t, bp_t = xs  # (B, N, k): (label, rank) at t+1 -> flat at t
        prev = _select_rows(
            bp_t.reshape(num_batches, num_labels * k), jnp.clip(flat_next, 0)
        )
        flat_t = jnp.where(
            (input_lengths - 1 == t)[:, None],
            flat_fin,
            jnp.where((t < input_lengths - 1)[:, None], prev, pad),
        )
        return flat_t, flat_t

    ts = jnp.arange(t_total - 2, -1, -1)
    _, flats = lax.scan(bstep, flat_last, (ts, backptr[::-1]))
    flat_all = jnp.concatenate([flats[::-1], flat_last[None]], axis=0)
    paths = jnp.where(flat_all >= 0, flat_all // k, -1).astype(jnp.int32)
    return NBestResult(scores, paths)


def _labels_from_positions(positions, lat_targets):
    """targets[b, positions[t, b]] with -1 at padding, via the same
    gather-free one-hot select (a (T*B)-row gather also serializes)."""
    s_total = lat_targets.shape[1]
    slot = jnp.arange(s_total, dtype=jnp.int32)[None, None, :]
    hit = jnp.clip(positions, 0)[:, :, None] == slot  # (T, B, S)
    picked = jnp.sum(jnp.where(hit, lat_targets[None], 0), axis=2)
    return jnp.where(positions >= 0, picked, -1).astype(jnp.int32)


def beam_decode(
    transition: jnp.ndarray,
    inputs: jnp.ndarray,
    input_lengths: Optional[jnp.ndarray] = None,
    *,
    beam_size: int = 16,
) -> ViterbiResult:
    """Beam-pruned Viterbi decode: the top-``beam_size`` labels survive
    each frame.

    The exact decoders pay O(T B N^2) in the (to, from) candidate tensor
    — unavoidable for exactness, and the dominant serving cost at
    wordpiece scale (N ~ 10k).  Production decoders prune: with K
    surviving labels per frame the step is O(B N K) — one (B, K, N) row
    fetch of the live labels' outgoing transition rows, a max over K,
    and a top-K over N — an N/K work reduction (625x at N=10k, K=16).

    The price is approximation: ``scores`` lower-bounds the exact
    Viterbi score, with equality whenever the true best path's label at
    every frame is inside that frame's beam.  Scores are monotonically
    non-decreasing in ``beam_size`` (beam sets are pointwise dominated),
    and ``beam_size >= N`` reproduces ``viterbi_decode``'s SCORES
    exactly — both pinned by tests/test_viterbi.py.  Paths match up to
    tie-breaking: ties are resolved over score-ranked beam slots (the
    lowest slot wins), not over the lowest source label as in the exact
    decoder, so on exact score ties an equally-scoring path may differ.

    The per-step transition fetch is an embedding-style CONTIGUOUS-ROW
    gather from the transposed (from, to) table — whole (N,)-row DMA,
    the one gather shape TPUs handle well.  The repo's one-hot-matmul
    rule (CLAUDE.md) targets element-level gathers whose matmul form
    costs the same; here the matmul form is O(B N^2 K) and would defeat
    the pruning.

    transition: (N, N) [i, j] = score j -> i; inputs: (T, B, N); returns
    ``ViterbiResult`` like ``viterbi_decode`` (reference tech-report
    basis ``doc/tech_report.tex:84-88``; the reference ships no decoder).
    """
    d_end, labs, bps, input_lengths = _beam_forward(
        transition, inputs, input_lengths, beam_size
    )
    scores = d_end[:, 0]  # _topk slot 0 holds the max
    start = jnp.zeros((inputs.shape[1],), jnp.int32)
    paths = _beam_backtrace(labs, bps, input_lengths, start)
    return ViterbiResult(scores, paths)


def _beam_forward(transition, inputs, input_lengths, beam_size):
    """Shared beam-pruned forward pass (beam_decode / beam_nbest).

    Returns ``(d_end, labs, bps, input_lengths)``: d_end (B, K) the
    final-frame beam scores (descending per batch), labs (T, B, K) the
    beam label ids AT each frame, bps (T, B, K) slot-at-t -> slot-at-t-1
    backpointers (frame-0 rows are identity and never followed)."""
    t_total, num_batches, num_labels = inputs.shape
    if beam_size < 1:
        raise ValueError(f"beam_size must be >= 1, got {beam_size}")
    k = min(beam_size, num_labels)
    if input_lengths is None:
        input_lengths = jnp.full((num_batches,), t_total, dtype=jnp.int32)
    if inputs.dtype in (jnp.bfloat16, jnp.float16):
        inputs = inputs.astype(jnp.float32)
    transition = transition.astype(inputs.dtype)
    inputs_m = mask_emissions(inputs, input_lengths)
    trans_t = transition.T  # (from, to): row j = outgoing scores of j

    d0, lab0 = _topk(inputs_m[0], k)  # (B, K) each

    def fstep(carry, xs):
        d_prev, lab_prev, d_end = carry
        t, i_t = xs
        rows = jnp.take(trans_t, lab_prev, axis=0)  # (B, K, N)
        cand = rows + d_prev[:, :, None]
        best = jnp.max(cand, axis=1)  # (B, N)
        from_slot = jnp.argmax(cand, axis=1).astype(jnp.int32)
        d, lab = _topk(i_t + best, k)  # (B, K)
        bp = _select_rows(from_slot, lab)  # new slot -> previous slot
        # only the end-row SCORES are carried; the backtrace re-derives
        # the final label from labs at each utterance's last frame
        d_end = jnp.where((input_lengths - 1 == t)[:, None], d, d_end)
        return (d, lab, d_end), (lab, bp)

    ts_f = jnp.arange(1, t_total, dtype=input_lengths.dtype)
    (_, _, d_end), (labs, bps) = lax.scan(
        fstep, (d0, lab0, d0), (ts_f, inputs_m[1:])
    )
    # labs[t] (B, K): beam labels AT frame t; bps[t]: slot at frame t ->
    # slot at frame t-1.  Frame 0 rows are prepended (identity bp, never
    # followed) so both index directly by t.
    labs = jnp.concatenate([lab0[None], labs], axis=0)
    bps = jnp.concatenate(
        [jnp.zeros((1, num_batches, k), jnp.int32), bps], axis=0
    )
    return d_end, labs, bps, input_lengths


def _beam_backtrace(labs, bps, input_lengths, start):
    """(T, B) path starting from beam slot ``start[b]`` at each
    utterance's last frame; -1 at padding frames.  Same end masking as
    the exact decoder."""
    t_total, num_batches, _ = labs.shape
    pad = jnp.full((num_batches,), -1, jnp.int32)
    lab_last = jnp.where(
        input_lengths - 1 == t_total - 1, _select_row(labs[-1], start), pad
    )

    def bstep(slot_next, xs):
        t, lab_t, bp_t1 = xs  # (B, K) beams at t; bp of frame t+1
        prev_slot = _select_row(bp_t1, slot_next)
        slot_t = jnp.where(input_lengths - 1 == t, start, prev_slot)
        emit = jnp.where(
            t < input_lengths, _select_row(lab_t, slot_t), pad
        )
        return slot_t, emit

    ts_b = jnp.arange(t_total - 2, -1, -1)
    _, emits = lax.scan(
        bstep,
        start,
        (ts_b, labs[-2::-1], bps[:0:-1]),
    )
    return jnp.concatenate([emits[::-1], lab_last[None]], axis=0)


def beam_nbest(
    transition: jnp.ndarray,
    inputs: jnp.ndarray,
    n: int,
    input_lengths: Optional[jnp.ndarray] = None,
    *,
    beam_size: int = 16,
) -> NBestResult:
    """The n best FINAL-LABEL hypotheses from one beam-pruned pass.

    ``viterbi_nbest`` is exact but pays O(T B N^2 k) — 7.6 s at N=10k on
    one chip (SWEEP_r3) where ``beam_decode`` runs in 4.9 ms.  This is
    the production-scale alternative: one beam forward (identical to
    ``beam_decode``'s, O(T B N K)), then a backtrace from each of the n
    best final beam slots instead of only slot 0.

    Contract (weaker than ``viterbi_nbest``'s, stated precisely): the n
    returned paths are the best SURVIVING path ending in each of the n
    highest-scoring final-frame beam labels — distinct final labels by
    construction, each path's score exact for that path (re-scoring
    consistency), scores descending, rank 0 == ``beam_decode`` exactly.
    It is NOT the global n-best: hypotheses 2..n of the true n-best that
    share rank 1's final label are not representable (that needs the
    (label, rank) lattice — use ``viterbi_nbest`` below wordpiece
    scale).  With ``beam_size >= N`` the result is exactly "for each of
    the n best final labels, the best path ending there" (pinned by
    brute force in tests).  For LM rescoring this is the standard
    lattice-lite n-best list; raise ``beam_size`` to widen diversity.

    Requires ``n <= beam_size`` (and n <= N).  Returns ``NBestResult``
    (scores (B, n) descending, paths (T, B, n), -1 past each length).
    """
    num_labels = inputs.shape[2]
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if n > beam_size:
        raise ValueError(
            f"n={n} exceeds beam_size={beam_size}; the beam only carries "
            f"beam_size final hypotheses"
        )
    if n > num_labels:
        raise ValueError(
            f"n={n} exceeds num_labels={num_labels}; final labels are "
            f"distinct by construction so at most N hypotheses exist"
        )
    d_end, labs, bps, input_lengths = _beam_forward(
        transition, inputs, input_lengths, beam_size
    )
    num_batches = inputs.shape[1]
    scores = d_end[:, :n]  # (B, n), descending (slot order)
    paths = jax.vmap(
        lambda r: _beam_backtrace(
            labs, bps, input_lengths,
            jnp.full((num_batches,), r, jnp.int32),
        )
    )(jnp.arange(n, dtype=jnp.int32))  # (n, T, B)
    return NBestResult(scores, jnp.transpose(paths, (1, 2, 0)))


# The alignment kernel's carry is one (B, S_pad) row; unlike the decoder
# there is no rotation table, so the only width cost is VMEM.  Capped at
# the fused loss kernels' width budget for the same reason they are.
ALIGN_KERNEL_MAX_WIDTH = 512


def viterbi_align(
    transition: jnp.ndarray,
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    input_lengths: Optional[jnp.ndarray] = None,
    target_lengths: Optional[jnp.ndarray] = None,
    *,
    impl: str = "auto",
) -> AlignmentResult:
    """Best monotonic target-to-frame alignment (segmentation) per batch.

    impl: 'pallas' (two-edge max-plus kernel pair with a one-bit advance
    backpointer stream, ops/pallas/viterbi_kernels.py), 'xla' (lax.scan),
    or 'auto' (pallas on TPU up to S <= 512, xla beyond/off-TPU).
    Bit-identical results across impls (pinned by tests/test_viterbi.py).
    """
    t_total, num_batches, _ = inputs.shape
    s_total = targets.shape[1]
    if target_lengths is None:
        target_lengths = jnp.full((num_batches,), s_total, dtype=jnp.int32)
    if input_lengths is None:
        input_lengths = jnp.full((num_batches,), t_total, dtype=jnp.int32)
    if inputs.dtype in (jnp.bfloat16, jnp.float16):
        inputs = inputs.astype(jnp.float32)
    transition = transition.astype(inputs.dtype)
    lat = make_aligned(transition, inputs, targets, input_lengths, target_lengths)

    from .pallas.common import use_interpret

    if impl == "auto":
        impl = (
            "pallas"
            if s_total <= ALIGN_KERNEL_MAX_WIDTH and not use_interpret()
            else "xla"
        )
    if impl == "pallas":
        if s_total > ALIGN_KERNEL_MAX_WIDTH:
            raise ValueError(
                f"impl='pallas' holds the (B, S) alignment carry in VMEM "
                f"and supports S <= {ALIGN_KERNEL_MAX_WIDTH}; got "
                f"{s_total}.  Use impl='xla' for longer targets."
            )
        from .pallas.viterbi_kernels import (
            align_backtrace_pallas, align_forward_pallas,
        )

        end_s = (target_lengths - 1).astype(jnp.int32)
        d_end, adv = align_forward_pallas(lat, input_lengths)
        scores = _select_row(d_end, end_s)
        positions = align_backtrace_pallas(end_s, adv, input_lengths)
        labels = _labels_from_positions(positions, lat.targets)
        return AlignmentResult(scores, positions, labels)
    if impl != "xla":
        raise ValueError(
            f"unknown impl {impl!r}; expected 'auto', 'pallas', or 'xla'"
        )

    d0 = jnp.full((num_batches, s_total), NEG_INF, lat.inputs.dtype)
    d0 = d0.at[:, 0].set(lat.inputs[0, :, 0])

    def fstep(d_prev, i_t):
        stay = d_prev + lat.self_trans
        move = _shift_right_s(d_prev + lat.next_trans)
        d = i_t + jnp.maximum(stay, move)
        advanced = move > stay  # True: came from s-1
        return d, (d, advanced)

    _, (d_rest, adv) = lax.scan(fstep, d0, lat.inputs[1:])
    delta = jnp.concatenate([d0[None], d_rest], axis=0)

    end_t = (input_lengths - 1).astype(jnp.int32)
    end_s = (target_lengths - 1).astype(jnp.int32)
    d_end = jnp.take_along_axis(delta, end_t[None, :, None], axis=0)[0]
    scores = jnp.take_along_axis(d_end, end_s[:, None], axis=1)[:, 0]

    pad = jnp.full((num_batches,), -1, jnp.int32)
    pos_last = jnp.where(end_t == t_total - 1, end_s, pad)

    def bstep(pos_next, xs):
        t, adv_t = xs  # adv_t: (B, S) advance bit for the step into t+1
        took = _select_row(adv_t.astype(jnp.int32), jnp.clip(pos_next, 0))
        prev = jnp.clip(pos_next, 0) - took
        pos_t = jnp.where(
            end_t == t, end_s, jnp.where(t < end_t, prev, pad)
        )
        return pos_t, pos_t

    ts = jnp.arange(t_total - 2, -1, -1)
    _, poss = lax.scan(bstep, pos_last, (ts, adv[::-1]))
    positions = jnp.concatenate([poss[::-1], pos_last[None]], axis=0)

    labels = _labels_from_positions(positions, lat.targets)
    return AlignmentResult(scores, positions, labels)
