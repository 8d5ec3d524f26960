"""Streaming / chunked online scoring and decoding.

The lattice recursions are left-to-right, so everything here computes
incrementally: feed emission chunks as they arrive, carry a tiny state
between chunks, and read out exact results at any prefix length.  The
reference processes whole utterances only (its recursions take the full
(T, B, N) tensor); this module is the online counterpart for streaming
recognizers.  Four surfaces, all pinned to their one-shot twins by
tests/test_streaming.py:

  * ``streaming_*``          ASG scores (FCC alpha (B, N) + FAC alpha
                             (B, S) carries); ``full - aligned`` is a
                             streaming prefix loss.  ``streaming_targets``
                             precomputes the chunk-invariant target-side
                             gathers + the FCC exp-transition so a jitted
                             update pays only the per-chunk emission
                             gather.
  * ``streaming_viterbi_*``  best path ((B, N) delta carry + per-chunk
                             backpointers, backtrace at any prefix).
  * ``streaming_nbest_*``    k best distinct paths ((B, N, k) carry).
  * ``streaming_align_*``    forced alignment ((B, S) tropical carry +
                             per-chunk advance bits; live segmentation
                             of a known transcript at any prefix).
  * ``streaming_wfsa_*``     generic-acceptor acceptance scores
                             ((B, num_states) carry).

Per-batch ``chunk_lengths`` make ragged chunk boundaries compose, so
batch elements advance at different rates.  Everything is a pytree of
(B, ...)-leading arrays: init/update/readout all jit, shard over a data
mesh with shard_map, and chunks of any static length compose (recompile
per distinct chunk length, as usual under jit).  Half-precision inputs
upcast at the boundary like the one-shot APIs (scores accumulate over
the whole stream).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .fac import gather_aligned_emissions, make_aligned, _shift_right_s
from .fcc import _exp_mats, _lse_mm
from .semiring import NEG_INF, logaddexp, logsumexp
from .viterbi import (NBestResult, ViterbiResult, _maxplus_argmax,
                      _maxplus_topk, _select_row, _select_rows, _topk)
from ..utils.lengths import label_mask, time_mask


class StreamingState(NamedTuple):
    """Carry between chunks; a pytree (jit/vmap/pjit friendly)."""

    alpha_full: jnp.ndarray  # (B, N) log-domain FCC alpha
    alpha_aligned: jnp.ndarray  # (B, S) log-domain FAC alpha
    frames_seen: jnp.ndarray  # (B,) int32


def _accumulation_dtype(dtype):
    """Scores accumulate over the whole stream — half precision would
    drift; mirror the one-shot scorers' boundary upcast."""
    return jnp.float32 if dtype in (jnp.bfloat16, jnp.float16) else dtype


def streaming_init(
    num_batches: int,
    num_labels: int,
    s_total: int,
    dtype=jnp.float32,
) -> StreamingState:
    """Fresh state: no frames consumed yet."""
    dtype = _accumulation_dtype(dtype)
    return StreamingState(
        alpha_full=jnp.full((num_batches, num_labels), NEG_INF, dtype),
        alpha_aligned=jnp.full((num_batches, s_total), NEG_INF, dtype),
        frames_seen=jnp.zeros((num_batches,), jnp.int32),
    )


class StreamTargets(NamedTuple):
    """Chunk-invariant target-side gathers, precomputed once per stream.

    ``streaming_update`` called with raw ``targets`` rebuilds these every
    chunk (the one-hot + transition einsums of ``make_aligned``); for a
    long-running online loop, build this once with ``streaming_targets``
    and pass it instead — each update then pays only the per-chunk
    emission gather.
    """

    tgt: jnp.ndarray  # (B, S) clipped targets
    onehot: Optional[jnp.ndarray]  # (B, S, N) masked one-hot, or None
    self_trans: jnp.ndarray  # (B, S)
    next_trans: jnp.ndarray  # (B, S)
    smask: jnp.ndarray  # (B, S) bool, s < target_lengths[b]
    e_t: Optional[jnp.ndarray] = None  # (N, N) exp(T - c).T for the FCC step
    c: Optional[jnp.ndarray] = None  # scalar offset of e_t


def streaming_targets(
    transition: jnp.ndarray,
    targets: jnp.ndarray,
    num_labels: int,
    target_lengths: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
) -> StreamTargets:
    """Precompute the fixed target-side lattice rows (and the FCC step's
    exp-transition matrix) for a stream.

    The precompute dtype is promoted with the transition's own dtype so a
    float64 stream keeps parity with the one-shot scorer even when the
    caller forgets to pass ``dtype`` (the accumulation dtype of the state
    built by ``streaming_init`` follows the same promotion rule there).
    """
    num_batches, s_total = targets.shape
    dtype = jnp.promote_types(transition.dtype, _accumulation_dtype(dtype))
    if target_lengths is None:
        target_lengths = jnp.full((num_batches,), s_total, jnp.int32)
    dummy = jnp.zeros((1, num_batches, num_labels), dtype)
    lat = make_aligned(
        transition, dummy, targets,
        jnp.ones((num_batches,), jnp.int32), target_lengths,
    )
    e, c = _exp_mats(transition, dtype)
    return StreamTargets(
        lat.targets, lat.onehot, lat.self_trans, lat.next_trans,
        label_mask(s_total, target_lengths), e.T, c,
    )


def streaming_update(
    transition: jnp.ndarray,
    state: StreamingState,
    chunk: jnp.ndarray,
    targets: Optional[jnp.ndarray] = None,
    chunk_lengths: Optional[jnp.ndarray] = None,
    target_lengths: Optional[jnp.ndarray] = None,
    stream_targets: Optional[StreamTargets] = None,
) -> StreamingState:
    """Consume a (T_c, B, N) emission chunk.

    chunk_lengths (B,) masks ragged chunk tails (frames with
    t >= chunk_lengths[b] are ignored); batch elements may therefore
    advance at different rates across calls.  targets/target_lengths
    must be identical across calls (the aligned lattice is fixed);
    passing a precomputed ``stream_targets`` instead of ``targets``
    skips rebuilding the chunk-invariant target gathers every call.
    """
    t_c, num_batches, num_labels = chunk.shape
    if chunk.dtype in (jnp.bfloat16, jnp.float16):
        # same boundary upcast as the one-shot scorers: scores accumulate
        # over the whole stream, too long for half-precision mantissas
        chunk = chunk.astype(jnp.float32)
    chunk = chunk.astype(state.alpha_full.dtype)
    transition = transition.astype(chunk.dtype)
    if chunk_lengths is None:
        chunk_lengths = jnp.full((num_batches,), t_c, jnp.int32)
    aligned_inputs, self_trans, next_trans, _ = _aligned_chunk(
        transition, chunk, targets, chunk_lengths, target_lengths,
        stream_targets,
    )
    s_total = aligned_inputs.shape[2]
    if stream_targets is not None and stream_targets.e_t is not None:
        if jnp.promote_types(stream_targets.e_t.dtype, chunk.dtype) != (
            stream_targets.e_t.dtype
        ):
            raise ValueError(
                f"stream_targets was precomputed at "
                f"{stream_targets.e_t.dtype} but the streaming state "
                f"accumulates at {chunk.dtype}; rebuild with "
                f"streaming_targets(..., dtype={chunk.dtype}) or the "
                f"already-rounded exp-transition silently loses parity "
                f"with the one-shot scorer"
            )
        e_t = stream_targets.e_t.astype(chunk.dtype)
        c = stream_targets.c.astype(chunk.dtype)
    else:
        e, c = _exp_mats(transition, chunk.dtype)
        e_t = e.T

    def step(carry, xs):
        af, aa, seen = carry
        t, i_t, ai_t = xs
        valid = (t < chunk_lengths)[:, None]
        first = (seen == 0)[:, None] & valid

        # FCC: alpha_t = I_t + lse_j(T + alpha_{t-1}); first frame = I_t
        af_new = i_t + _lse_mm(af, e_t, c)
        af_new = jnp.where(first, i_t, af_new)
        af = jnp.where(valid, af_new, af)

        # FAC: 2-way band step; first frame seeds at s = 0 only
        hori = aa + self_trans
        diag = _shift_right_s(aa + next_trans)
        # semiring.logaddexp, not jnp.logaddexp: dead band rows (alpha
        # entries beyond the consumed prefix) are -inf on BOTH sides, and
        # jnp.logaddexp's VJP emits NaN there — the prefix loss
        # full - aligned is a differentiable surface (distillation /
        # online fine-tuning), so grads must stay finite.
        aa_new = ai_t + logaddexp(hori, diag)
        seed = jnp.where(
            jnp.arange(s_total)[None, :] == 0, ai_t, NEG_INF
        )
        aa_new = jnp.where(first, seed, aa_new)
        aa = jnp.where(valid, aa_new, aa)

        seen = seen + valid[:, 0].astype(jnp.int32)
        return (af, aa, seen), None

    ts = jnp.arange(t_c)
    (af, aa, seen), _ = lax.scan(
        step,
        (state.alpha_full, state.alpha_aligned, state.frames_seen),
        (ts, chunk, aligned_inputs),
    )
    return StreamingState(af, aa, seen)


def streaming_scores(
    state: StreamingState,
    target_lengths: Optional[jnp.ndarray] = None,
) -> tuple:
    """(full, aligned) scores of everything consumed so far, shape (B,).

    ``full`` matches ``fcc_score`` at input_lengths == frames_seen;
    ``aligned`` matches ``fac_score`` (it reads the alpha entry at
    s = L_out - 1; -inf while the prefix cannot yet cover the target).
    """
    full = logsumexp(state.alpha_full, axis=1)
    if target_lengths is None:
        aligned = state.alpha_aligned[:, -1]
    else:
        s_total = state.alpha_aligned.shape[1]
        onehot = (
            jnp.arange(s_total)[None, :] == (target_lengths - 1)[:, None]
        )
        picked = jnp.where(onehot, state.alpha_aligned, NEG_INF)
        aligned = jnp.max(picked, axis=1)
    return full, aligned


# ---------------------------------------------------------------------------
# Streaming Viterbi decoding (tropical semiring)
# ---------------------------------------------------------------------------
#
# Same left-to-right structure as the scores above, max instead of
# logsumexp.  The carried state is just the (B, N) best-path row; each
# update also emits the chunk's backpointers + per-frame validity, which
# the caller accumulates (same O(T B N) int32 footprint as the one-shot
# decoder's scan output) and hands to ``streaming_viterbi_backtrace`` for
# the exact best path over everything consumed so far.  Partial decodes
# are cheap: backtrace is O(T B) gathers, so calling it every chunk gives
# online (non-committed) hypotheses; the final call equals the one-shot
# ``viterbi_decode`` on the concatenated prefix (pinned by
# tests/test_streaming.py, identical tie-breaking via the shared
# ``_maxplus_argmax`` step).


class StreamingViterbiState(NamedTuple):
    """Carry between chunks; a pytree (jit/vmap/pjit friendly)."""

    delta: jnp.ndarray  # (B, N) best-path score ending at each label
    frames_seen: jnp.ndarray  # (B,) int32


def streaming_viterbi_init(
    num_batches: int, num_labels: int, dtype=jnp.float32
) -> StreamingViterbiState:
    dtype = _accumulation_dtype(dtype)
    return StreamingViterbiState(
        delta=jnp.full((num_batches, num_labels), NEG_INF, dtype),
        frames_seen=jnp.zeros((num_batches,), jnp.int32),
    )


def streaming_viterbi_update(
    transition: jnp.ndarray,
    state: StreamingViterbiState,
    chunk: jnp.ndarray,
    chunk_lengths: Optional[jnp.ndarray] = None,
) -> tuple:
    """Consume a (T_c, B, N) emission chunk.

    Returns ``(state, (backptr, valid))`` with backptr (T_c, B, N) int32
    and valid (T_c, B) bool.  Backptr frame t maps the label AT that
    frame to the label at the element's previous consumed frame; identity
    at first/invalid frames, so concatenated blocks compose under
    ``streaming_viterbi_backtrace`` even when batch elements advance at
    different rates (ragged ``chunk_lengths``).
    """
    t_c, num_batches, num_labels = chunk.shape
    # same dtype boundary as viterbi_decode: path scores accumulate over
    # the whole stream (half precision drifts), and the carry dtype is
    # pinned by the state
    chunk = chunk.astype(state.delta.dtype)
    transition = transition.astype(state.delta.dtype)
    if chunk_lengths is None:
        chunk_lengths = jnp.full((num_batches,), t_c, jnp.int32)
    ident = jnp.broadcast_to(
        jnp.arange(num_labels, dtype=jnp.int32)[None, :],
        (num_batches, num_labels),
    )

    def step(carry, xs):
        d, seen = carry
        t, i_t = xs
        valid = (t < chunk_lengths)[:, None]
        first = (seen == 0)[:, None] & valid
        best, bp = _maxplus_argmax(transition, d)
        d_new = jnp.where(first, i_t, i_t + best)
        d = jnp.where(valid, d_new, d)
        bp = jnp.where(valid & ~first, bp, ident)
        seen = seen + valid[:, 0].astype(jnp.int32)
        return (d, seen), (bp, valid[:, 0])

    ts = jnp.arange(t_c)
    (d, seen), (backptr, valid) = lax.scan(
        step, (state.delta, state.frames_seen), (ts, chunk)
    )
    return StreamingViterbiState(d, seen), (backptr, valid)


def streaming_viterbi_backtrace(
    state: StreamingViterbiState,
    backptr: jnp.ndarray,
    valid: jnp.ndarray,
) -> ViterbiResult:
    """Best path over all frames consumed so far.

    backptr (T, B, N) / valid (T, B): the per-chunk outputs of
    ``streaming_viterbi_update`` concatenated along the time axis.
    Emits -1 at frames an element did not consume; elements with no
    frames yet score -inf with an all -1 path.
    """
    scores = jnp.max(state.delta, axis=1)
    lab0 = jnp.argmax(state.delta, axis=1).astype(jnp.int32)

    def bstep(lab, xs):
        bp_t, v_t = xs
        emit = jnp.where(v_t, lab, -1)
        prev = _select_row(bp_t, jnp.clip(lab, 0))
        lab = jnp.where(v_t, prev, lab)
        return lab, emit

    _, emits = lax.scan(bstep, lab0, (backptr[::-1], valid[::-1]))
    return ViterbiResult(scores, emits[::-1])


# ---------------------------------------------------------------------------
# Streaming beam-pruned decoding (wordpiece-scale vocabularies)
# ---------------------------------------------------------------------------
#
# Online counterpart of ``ops.viterbi.beam_decode``: the carry is the
# (B, K) pruned beam (scores + label ids) instead of the full (B, N)
# delta row, so the per-chunk update is O(T_c B N K) — the N/K work
# reduction that makes online decoding at N ~ 10k practical.  Emitted
# per chunk: the beam labels and slot backpointers per frame; the
# backtrace walks slots exactly like the one-shot decoder.  Identity
# slot backpointers at first/invalid frames make concatenated blocks
# compose under ragged chunk_lengths, same as streaming Viterbi.
# Exact parity with one-shot ``beam_decode`` on the consumed prefix
# (shared ``_topk`` + identical candidate ordering -> identical
# tie-breaking) is pinned by tests/test_streaming.py.


class StreamingBeamState(NamedTuple):
    delta: jnp.ndarray  # (B, K) pruned best-path scores, descending
    labels: jnp.ndarray  # (B, K) int32 label ids of the beam slots
    frames_seen: jnp.ndarray  # (B,) int32


def streaming_beam_init(
    num_batches: int, beam_size: int, dtype=jnp.float32
) -> StreamingBeamState:
    if beam_size < 1:
        raise ValueError(f"beam_size must be >= 1, got {beam_size}")
    dtype = _accumulation_dtype(dtype)
    return StreamingBeamState(
        delta=jnp.full((num_batches, beam_size), NEG_INF, dtype),
        labels=jnp.zeros((num_batches, beam_size), jnp.int32),
        frames_seen=jnp.zeros((num_batches,), jnp.int32),
    )


def streaming_beam_update(
    transition: jnp.ndarray,
    state: StreamingBeamState,
    chunk: jnp.ndarray,
    chunk_lengths: Optional[jnp.ndarray] = None,
) -> tuple:
    """Consume a (T_c, B, N) emission chunk.

    Returns ``(state, (labels, backptr, valid))`` with labels/backptr
    (T_c, B, K) int32 and valid (T_c, B) bool: labels[t] are the frame's
    beam label ids, backptr[t] maps each beam slot to the slot at the
    element's previous consumed frame (identity at first/invalid
    frames).  ``beam_size`` is fixed by the state; if it exceeds N the
    tail slots simply carry -inf and never win.
    """
    t_c, num_batches, num_labels = chunk.shape
    k = state.delta.shape[1]
    # beam wider than the vocabulary: compute the top-k at the clamped
    # width and pad the tail slots with -inf / label 0 / identity bp —
    # they never win and the backtrace (which starts at slot 0 and
    # follows argmax-over-finite backpointers) never reaches them
    k_eff = min(k, num_labels)
    chunk = chunk.astype(state.delta.dtype)
    transition = transition.astype(state.delta.dtype)
    trans_t = transition.T  # (from, to)
    if chunk_lengths is None:
        chunk_lengths = jnp.full((num_batches,), t_c, jnp.int32)
    ident = jnp.broadcast_to(
        jnp.arange(k, dtype=jnp.int32)[None, :], (num_batches, k)
    )

    def step(carry, xs):
        d, lab, seen = carry
        t, i_t = xs
        valid = (t < chunk_lengths)[:, None]
        first = (seen == 0)[:, None] & valid
        rows = jnp.take(trans_t, lab, axis=0)  # (B, K, N) outgoing rows
        cand = rows + d[:, :, None]
        best = jnp.max(cand, axis=1)  # (B, N)
        from_slot = jnp.argmax(cand, axis=1).astype(jnp.int32)
        # first consumed frame seeds from the bare emissions; merging
        # BEFORE the top-k keeps one top-k per frame (the dominant
        # per-frame cost at wordpiece scale) and is bit-identical to a
        # separate seed top-k — the same values reach the same _topk
        merged = jnp.where(first, i_t, i_t + best)
        d_new, lab_new = _topk(merged, k_eff)
        if k_eff < k:
            pad = ((0, 0), (0, k - k_eff))
            d_new = jnp.pad(d_new, pad, constant_values=NEG_INF)
            lab_new = jnp.pad(lab_new, pad)
        bp = jnp.where(
            valid & ~first, _select_rows(from_slot, lab_new), ident
        )
        d = jnp.where(valid, d_new, d)
        lab = jnp.where(valid, lab_new, lab)
        seen = seen + valid[:, 0].astype(jnp.int32)
        return (d, lab, seen), (lab, bp, valid[:, 0])

    ts = jnp.arange(t_c)
    (d, lab, seen), (labs, bps, valid) = lax.scan(
        step, (state.delta, state.labels, state.frames_seen), (ts, chunk)
    )
    return StreamingBeamState(d, lab, seen), (labs, bps, valid)


def streaming_beam_backtrace(
    state: StreamingBeamState,
    labels: jnp.ndarray,
    backptr: jnp.ndarray,
    valid: jnp.ndarray,
) -> ViterbiResult:
    """Best surviving path over all frames consumed so far.

    labels/backptr (T, B, K) / valid (T, B): the per-chunk outputs of
    ``streaming_beam_update`` concatenated along the time axis.  Emits
    -1 at frames an element did not consume; elements with no frames yet
    score -inf with an all -1 path.
    """
    scores = state.delta[:, 0]  # slot 0 holds the max (descending order)
    num_batches = scores.shape[0]

    paths = _streaming_beam_backtrace_from(
        labels, backptr, valid, jnp.zeros((num_batches,), jnp.int32)
    )
    return ViterbiResult(scores, paths)


def _streaming_beam_backtrace_from(labels, backptr, valid, start):
    """(T, B) path starting the backtrace at beam slot ``start[b]``."""

    def bstep(slot, xs):
        lab_t, bp_t, v_t = xs
        emit = jnp.where(v_t, _select_row(lab_t, slot), -1)
        prev = _select_row(bp_t, slot)
        slot = jnp.where(v_t, prev, slot)
        return slot, emit

    _, emits = lax.scan(
        bstep, start, (labels[::-1], backptr[::-1], valid[::-1])
    )
    return emits[::-1]


def streaming_beam_nbest_backtrace(
    state: StreamingBeamState,
    labels: jnp.ndarray,
    backptr: jnp.ndarray,
    valid: jnp.ndarray,
    n: int,
) -> NBestResult:
    """The n best final-label hypotheses of the consumed prefix.

    The streaming form of ``beam_nbest`` (one-shot parity pinned):
    backtraces each of the n best beam slots of ``state`` through the
    accumulated per-chunk outputs instead of only slot 0.  Same contract
    as ``beam_nbest`` — distinct final labels, per-path scores exact,
    rank 0 == ``streaming_beam_backtrace``; requires n <= beam_size.
    Returns ``NBestResult`` (scores (B, n) descending, paths (T, B, n)).
    """
    k = state.delta.shape[1]
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if n > k:
        raise ValueError(f"n={n} exceeds the state's beam_size={k}")
    num_batches = state.delta.shape[0]
    scores = state.delta[:, :n]
    paths = jax.vmap(
        lambda r: _streaming_beam_backtrace_from(
            labels, backptr, valid,
            jnp.full((num_batches,), r, jnp.int32),
        )
    )(jnp.arange(n, dtype=jnp.int32))  # (n, T, B)
    return NBestResult(scores, jnp.transpose(paths, (1, 2, 0)))


# ---------------------------------------------------------------------------
# Streaming n-best decoding
# ---------------------------------------------------------------------------
#
# Same shape as streaming Viterbi with the (label, rank) lattice of
# ``viterbi_nbest``: carry (B, N, k) rank-resolved best scores, emit
# (T_c, B, N, k) flat backpointers (j*k + r) per chunk, backtrace the k
# best distinct paths of the consumed prefix at any point.  Shares
# ``_maxplus_topk`` with the one-shot decoder (identical tie-breaking).


class StreamingNBestState(NamedTuple):
    delta: jnp.ndarray  # (B, N, k)
    frames_seen: jnp.ndarray  # (B,) int32


def streaming_nbest_init(
    num_batches: int, num_labels: int, k: int, dtype=jnp.float32
) -> StreamingNBestState:
    dtype = _accumulation_dtype(dtype)
    return StreamingNBestState(
        delta=jnp.full((num_batches, num_labels, k), NEG_INF, dtype),
        frames_seen=jnp.zeros((num_batches,), jnp.int32),
    )


def streaming_nbest_update(
    transition: jnp.ndarray,
    state: StreamingNBestState,
    chunk: jnp.ndarray,
    chunk_lengths: Optional[jnp.ndarray] = None,
) -> tuple:
    """Consume a (T_c, B, N) chunk; returns (state, (backptr, valid)) with
    backptr (T_c, B, N, k) int32 flat (label*k + rank) indices."""
    t_c, num_batches, num_labels = chunk.shape
    k = state.delta.shape[2]
    chunk = chunk.astype(state.delta.dtype)
    transition = transition.astype(state.delta.dtype)
    if chunk_lengths is None:
        chunk_lengths = jnp.full((num_batches,), t_c, jnp.int32)
    # identity backptr: slot (i, r) points at flat i*k + r
    ident = jnp.broadcast_to(
        (jnp.arange(num_labels, dtype=jnp.int32)[:, None] * k
         + jnp.arange(k, dtype=jnp.int32)[None, :])[None],
        (num_batches, num_labels, k),
    )

    def step(carry, xs):
        d, seen = carry
        t, i_t = xs
        valid = (t < chunk_lengths)[:, None, None]
        first = (seen == 0)[:, None, None] & valid
        vals, bp = _maxplus_topk(transition, d, k)
        d_new = i_t[:, :, None] + vals
        seed = jnp.where(
            jnp.arange(k)[None, None, :] == 0, i_t[:, :, None], NEG_INF
        )
        d_new = jnp.where(first, seed, d_new)
        d = jnp.where(valid, d_new, d)
        bp = jnp.where(valid & ~first, bp, ident)
        seen = seen + valid[:, 0, 0].astype(jnp.int32)
        return (d, seen), (bp, valid[:, 0, 0])

    ts = jnp.arange(t_c)
    (d, seen), (backptr, valid) = lax.scan(
        step, (state.delta, state.frames_seen), (ts, chunk)
    )
    return StreamingNBestState(d, seen), (backptr, valid)


def streaming_nbest_backtrace(
    state: StreamingNBestState,
    backptr: jnp.ndarray,
    valid: jnp.ndarray,
) -> NBestResult:
    """k best distinct paths over all frames consumed so far; emits -1 at
    frames an element did not consume (same conventions as
    ``viterbi_nbest`` on the concatenated prefix)."""
    num_batches, num_labels, k = state.delta.shape
    flat_end = state.delta.reshape(num_batches, num_labels * k)
    scores, flat0 = _topk(flat_end, k)  # (B, k) each

    def bstep(flat, xs):
        bp_t, v_t = xs  # (B, N, k), (B,)
        emit = jnp.where(v_t[:, None], flat, -1)
        prev = _select_rows(
            bp_t.reshape(num_batches, num_labels * k), jnp.clip(flat, 0)
        )
        flat = jnp.where(v_t[:, None], prev, flat)
        return flat, emit

    _, emits = lax.scan(bstep, flat0, (backptr[::-1], valid[::-1]))
    flats = emits[::-1]
    paths = jnp.where(flats >= 0, flats // k, -1).astype(jnp.int32)
    return NBestResult(scores, paths)


# ---------------------------------------------------------------------------
# Streaming forced alignment
# ---------------------------------------------------------------------------
#
# The aligned (FAC) lattice in the tropical semiring: carry the (B, S)
# best-segmentation scores, emit one ADVANCE BIT per (b, s) per frame
# (did the best path into this slot come from slot s-1?), backtrace the
# consumed prefix's segmentation at any point.  Online counterpart of
# ``viterbi_align`` (live caption alignment while the transcript is
# known); same target-side precompute (``streaming_targets``) as the
# streaming scorer.


class StreamingAlignState(NamedTuple):
    delta: jnp.ndarray  # (B, S) best-alignment score ending at each slot
    frames_seen: jnp.ndarray  # (B,) int32


def streaming_align_init(
    num_batches: int, s_total: int, dtype=jnp.float32
) -> StreamingAlignState:
    dtype = _accumulation_dtype(dtype)
    return StreamingAlignState(
        delta=jnp.full((num_batches, s_total), NEG_INF, dtype),
        frames_seen=jnp.zeros((num_batches,), jnp.int32),
    )


def _aligned_chunk(transition, chunk, targets, chunk_lengths,
                   target_lengths, stream_targets):
    """Target-side lattice rows + aligned chunk emissions (the shared
    either/or handling of ``streaming_update``)."""
    t_c, num_batches, _ = chunk.shape
    if stream_targets is not None:
        if targets is not None or target_lengths is not None:
            raise ValueError(
                "pass either stream_targets OR targets/target_lengths, "
                "not both (stream_targets already bakes them in; a "
                "conflicting pair would be silently ignored)"
            )
        st_dt = stream_targets.self_trans.dtype
        if jnp.promote_types(st_dt, chunk.dtype) != st_dt:
            # precompute at LOWER precision than the state: rounded
            # lattice rows would silently lose parity with one-shot
            raise ValueError(
                f"stream_targets was precomputed at {st_dt} but the "
                f"streaming state accumulates at {chunk.dtype}; rebuild "
                f"with streaming_targets(..., dtype={chunk.dtype})"
            )
        # precompute at HIGHER precision (e.g. f64 transition feeding an
        # f32 stream): cast down to the state dtype so the scan carry
        # dtype is stable — the state dtype is authoritative
        dt = chunk.dtype
        onehot = (None if stream_targets.onehot is None
                  else stream_targets.onehot.astype(dt))
        tmask = time_mask(t_c, chunk_lengths)
        aligned_inputs = gather_aligned_emissions(
            chunk, stream_targets.tgt, onehot, tmask,
            stream_targets.smask,
        )
        return (aligned_inputs.astype(dt),
                stream_targets.self_trans.astype(dt),
                stream_targets.next_trans.astype(dt), stream_targets.tgt)
    if targets is None:
        raise ValueError("pass either targets or stream_targets")
    if target_lengths is None:
        target_lengths = jnp.full(
            (num_batches,), targets.shape[1], jnp.int32
        )
    lat = make_aligned(
        transition, chunk, targets, chunk_lengths, target_lengths
    )
    return lat.inputs, lat.self_trans, lat.next_trans, lat.targets


def streaming_align_update(
    transition: jnp.ndarray,
    state: StreamingAlignState,
    chunk: jnp.ndarray,
    targets: Optional[jnp.ndarray] = None,
    chunk_lengths: Optional[jnp.ndarray] = None,
    target_lengths: Optional[jnp.ndarray] = None,
    stream_targets: Optional[StreamTargets] = None,
) -> tuple:
    """Consume a (T_c, B, N) emission chunk.

    Returns ``(state, (adv, valid))`` with adv (T_c, B, S) int32 advance
    bits (1 iff the best path into slot s at that frame advanced from
    slot s-1; 0 at first/invalid frames) and valid (T_c, B) bool.
    Concatenated blocks compose under ``streaming_align_backtrace`` even
    when batch elements advance at different rates.  targets /
    target_lengths (or the ``stream_targets`` precompute) must be
    identical across calls — the aligned lattice is fixed per stream.
    """
    t_c, num_batches, num_labels = chunk.shape
    if chunk.dtype in (jnp.bfloat16, jnp.float16):
        chunk = chunk.astype(jnp.float32)
    chunk = chunk.astype(state.delta.dtype)
    transition = transition.astype(chunk.dtype)
    if chunk_lengths is None:
        chunk_lengths = jnp.full((num_batches,), t_c, jnp.int32)
    aligned_inputs, self_trans, next_trans, _ = _aligned_chunk(
        transition, chunk, targets, chunk_lengths, target_lengths,
        stream_targets,
    )
    s_total = aligned_inputs.shape[2]

    def step(carry, xs):
        d, seen = carry
        t, ai_t = xs
        valid = (t < chunk_lengths)[:, None]
        first = (seen == 0)[:, None] & valid
        stay = d + self_trans
        move = _shift_right_s(d + next_trans)
        d_new = ai_t + jnp.maximum(stay, move)
        seed = jnp.where(jnp.arange(s_total)[None, :] == 0, ai_t, NEG_INF)
        d_new = jnp.where(first, seed, d_new)
        d = jnp.where(valid, d_new, d)
        adv = jnp.where(valid & ~first, move > stay, False)
        seen = seen + valid[:, 0].astype(jnp.int32)
        return (d, seen), (adv.astype(jnp.int32), valid[:, 0])

    ts = jnp.arange(t_c)
    (d, seen), (adv, valid) = lax.scan(
        step, (state.delta, state.frames_seen), (ts, aligned_inputs)
    )
    return StreamingAlignState(d, seen), (adv, valid)


def streaming_align_backtrace(
    state: StreamingAlignState,
    adv: jnp.ndarray,
    valid: jnp.ndarray,
    targets: Optional[jnp.ndarray] = None,
    target_lengths: Optional[jnp.ndarray] = None,
    stream_targets: Optional[StreamTargets] = None,
) -> "AlignmentResult":
    """Best monotonic alignment over all frames consumed so far.

    adv (T, B, S) / valid (T, B): the per-chunk outputs of
    ``streaming_align_update`` concatenated along the time axis.  Emits
    -1 at frames an element did not consume; elements with no frames yet
    score -inf with an all -1 alignment.  ``targets`` (or the stream's
    ``stream_targets``, whose clipped view matches the one-shot API's
    label output exactly) supplies the emitted labels.
    """
    from .viterbi import AlignmentResult, _labels_from_positions

    num_batches, s_total = state.delta.shape
    if stream_targets is not None:
        if targets is not None:
            raise ValueError(
                "pass either stream_targets OR targets, not both"
            )
        tgt = stream_targets.tgt
        if target_lengths is None:
            # the precompute baked the ragged lengths into smask;
            # defaulting to full S here would anchor the backtrace at
            # slot S-1 and walk back from the wrong final slot
            target_lengths = jnp.sum(
                stream_targets.smask, axis=1
            ).astype(jnp.int32)
    else:
        if targets is None:
            raise ValueError("pass either targets or stream_targets")
        tgt = targets
    if target_lengths is None:
        target_lengths = jnp.full((num_batches,), s_total, jnp.int32)
    end_s = (target_lengths - 1).astype(jnp.int32)
    any_frames = state.frames_seen > 0
    scores = jnp.where(
        any_frames,
        _select_row(state.delta, end_s),
        jnp.full((num_batches,), NEG_INF, state.delta.dtype),
    )

    def bstep(pos, xs):
        adv_t, v_t = xs  # (B, S), (B,)
        emit = jnp.where(v_t, pos, -1)
        took = _select_row(adv_t, jnp.clip(pos, 0))
        pos = jnp.where(v_t, jnp.clip(pos, 0) - took, pos)
        return pos, emit

    _, emits = lax.scan(bstep, end_s, (adv[::-1], valid[::-1]))
    positions = emits[::-1]
    labels = _labels_from_positions(positions, tgt)
    return AlignmentResult(scores, positions, labels)


# ---------------------------------------------------------------------------
# Streaming generic-WFSA scoring
# ---------------------------------------------------------------------------
#
# The acceptor recursion (ops/wfsa.py) is also left-to-right — one arc per
# frame — so it streams with a (B, num_states) alpha carry and NO
# first-frame special case (the carry starts at the automaton's start
# weights).  Prefix readouts are exact against the one-shot ``wfsa_score``
# (pinned by tests/test_streaming.py); at zero consumed frames the
# readout is the empty-path acceptance score lse(start + final).


class StreamingWFSAState(NamedTuple):
    """Carry between chunks; a pytree (jit/vmap/pjit friendly)."""

    alpha: jnp.ndarray  # (B, num_states) log-domain forward weights
    frames_seen: jnp.ndarray  # (B,) int32


def streaming_wfsa_init(
    fsa, num_batches: int, dtype=jnp.float32
) -> StreamingWFSAState:
    dtype = _accumulation_dtype(dtype)
    return StreamingWFSAState(
        alpha=jnp.broadcast_to(
            fsa.start.astype(dtype), (num_batches, fsa.num_states)
        ),
        frames_seen=jnp.zeros((num_batches,), jnp.int32),
    )


def streaming_wfsa_update(
    fsa,
    state: StreamingWFSAState,
    chunk: jnp.ndarray,
    chunk_lengths: Optional[jnp.ndarray] = None,
) -> StreamingWFSAState:
    """Consume a (T_c, B, N) emission chunk through the acceptor."""
    from .wfsa import _arc_emissions, _segment_lse

    t_c, num_batches, _ = chunk.shape
    if chunk_lengths is None:
        chunk_lengths = jnp.full((num_batches,), t_c, jnp.int32)
    chunk = chunk.astype(state.alpha.dtype)  # carry dtype is pinned
    dt = chunk.dtype
    w = fsa.weight.astype(dt)[None, :]

    def step(carry, xs):
        alpha, seen = carry
        t, i_t = xs
        arc = (
            jnp.take(alpha, fsa.src, axis=1) + w
            + _arc_emissions(i_t, fsa.ilabel)
        )
        alpha_new = _segment_lse(arc, fsa.dst, fsa.num_states)
        valid = (t < chunk_lengths)[:, None]
        alpha = jnp.where(valid, alpha_new, alpha)
        seen = seen + valid[:, 0].astype(jnp.int32)
        return (alpha, seen), None

    ts = jnp.arange(t_c)
    (alpha, seen), _ = lax.scan(
        step, (state.alpha, state.frames_seen), (ts, chunk)
    )
    return StreamingWFSAState(alpha, seen)


class StreamingWFSAViterbiState(NamedTuple):
    """Carry for the online WFSA best-path decoder."""

    delta: jnp.ndarray  # (B, num_states) best-path score into each state
    frames_seen: jnp.ndarray  # (B,) int32


def streaming_wfsa_viterbi_init(
    fsa, num_batches: int, dtype=jnp.float32
) -> StreamingWFSAViterbiState:
    dtype = _accumulation_dtype(dtype)
    return StreamingWFSAViterbiState(
        delta=jnp.broadcast_to(
            fsa.start.astype(dtype), (num_batches, fsa.num_states)
        ),
        frames_seen=jnp.zeros((num_batches,), jnp.int32),
    )


def streaming_wfsa_viterbi_update(
    fsa,
    state: StreamingWFSAViterbiState,
    chunk: jnp.ndarray,
    chunk_lengths: Optional[jnp.ndarray] = None,
) -> tuple:
    """Consume a (T_c, B, N) emission chunk; tropical semiring.

    Returns ``(state, (backs, valid))`` with backs (T_c, B, num_states)
    int32 best-incoming-arc ids (``fsa.num_arcs`` sentinel at invalid
    frames / unreachable states) and valid (T_c, B) bool.  Concatenated
    blocks compose under ``streaming_wfsa_viterbi_backtrace`` (the
    sentinel rows are skipped there), ragged rates included.  No
    first-frame special case: the carry starts at the automaton's start
    weights, exactly like the one-shot decoder's alpha0.
    """
    from .wfsa import _viterbi_arc_step

    t_c, num_batches, _ = chunk.shape
    if chunk_lengths is None:
        chunk_lengths = jnp.full((num_batches,), t_c, jnp.int32)
    chunk = chunk.astype(state.delta.dtype)  # carry dtype is pinned
    big = jnp.asarray(fsa.num_arcs, jnp.int32)

    def step(carry, xs):
        d, seen = carry
        t, i_t = xs
        best, back = _viterbi_arc_step(fsa, d, i_t)
        valid = (t < chunk_lengths)[:, None]
        d = jnp.where(valid, best, d)
        back = jnp.where(valid, back, big)
        seen = seen + valid[:, 0].astype(jnp.int32)
        return (d, seen), (back, valid[:, 0])

    ts = jnp.arange(t_c)
    (d, seen), (backs, valid) = lax.scan(
        step, (state.delta, state.frames_seen), (ts, chunk)
    )
    return StreamingWFSAViterbiState(d, seen), (backs, valid)


def streaming_wfsa_viterbi_backtrace(
    fsa,
    state: StreamingWFSAViterbiState,
    backs: jnp.ndarray,
    valid: jnp.ndarray,
):
    """Best accepted path over all frames consumed so far.

    backs (T, B, num_states) / valid (T, B): the per-chunk outputs of
    ``streaming_wfsa_viterbi_update`` concatenated along time.  Equals
    the one-shot ``wfsa_viterbi`` on the consumed prefix (shared arc
    step and walker, identical lowest-arc-id ties); frames an element
    did not consume emit -1.  An element with zero consumed frames
    scores the best empty-path acceptance max(start + final) with an
    all -1 path (mirroring ``streaming_wfsa_scores``' length-0
    semantics; the one-shot decoder has no length-0 form).
    """
    from .wfsa import WFSAPath, _wfsa_walk

    final_tot = state.delta + fsa.final.astype(state.delta.dtype)[None, :]
    scores = jnp.max(final_tot, axis=1)
    end_state = jnp.argmax(final_tot, axis=1).astype(jnp.int32)
    states, labels = _wfsa_walk(fsa, end_state, backs, valid)
    return WFSAPath(scores, states, labels)


def streaming_wfsa_scores(fsa, state: StreamingWFSAState) -> jnp.ndarray:
    """(B,) acceptance score of everything consumed so far; equals the
    one-shot ``wfsa_score`` at input_lengths == frames_seen >= 1.  At
    ZERO consumed frames this returns the empty-path acceptance score
    lse(start + final) — finite when some state is both initial and
    final — whereas the one-shot scorer returns -inf for length 0 (its
    readout snapshots at the last consumed frame, which doesn't exist)."""
    return logsumexp(
        state.alpha + fsa.final.astype(state.alpha.dtype)[None, :], axis=1
    )
