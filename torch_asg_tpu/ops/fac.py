"""Force-aligned (numerator) lattice: aligned-path score and gradients.

Computes the log semiring sum over all monotonic alignments of the target
sequence ``targets[b, :target_lengths[b]]`` to the frames
``0..input_lengths[b]-1``: at each frame the path either stays on the
current target position (self-loop, score ``transition[y_s, y_s]``) or
advances to the next one (score ``transition[y_{s+1}, y_s]``), emitting
``inputs[t, b, y_s]``.

Parity target (behavior, not code): zh217/torch-asg
``native/force_aligned_lattice.cpp`` (gathers :15-82, alpha :84-111,
beta :113-154, derivative :156-183, scatters :204-264, forward :266-319,
backward :321-356) and its CUDA twins in ``force_aligned_lattice_kernel.cu``.

TPU-first design decisions
  * The CPU/CUDA gather kernels (make_aligned_inputs/transition) become a
    one-hot batched matmul on the MXU (indexed gathers serialize on TPU);
    the big scatter kernel (collect_input_grad, which needs atomicAdd on
    GPU) is the transposed matmul, and the small transition scatter is an
    XLA ``.at[].add`` — all deterministic for free.
  * Ragged input/target lengths are masked, never rolled: the beta seed
    lives at ``(t, s) = (L_in[b]-1, L_out[b]-1)`` via jnp.where.
  * The reference's cumsum vectorization of the bottom alpha row / last
    beta row (``force_aligned_lattice.cpp:99-101,129-139``) is an artifact
    of its T-outer vectorized loop; in a fused scan the s=0 row is just the
    2-way logsumexp with the diagonal edge at -inf, which is identical.
  * The (T, 2, B, S) path_contrib tensor is never materialized; the
    backward recomputes the 2-way edge softmax from alpha:
      hori[t,b,s] = exp(alpha[t-1,b,s]   + selfT[b,s]   + I~[t,b,s] - alpha[t,b,s])
      diag[t,b,s] = exp(alpha[t-1,b,s-1] + nextT[b,s-1] + I~[t,b,s] - alpha[t,b,s])
    (exponents <= 0 by construction).
  * The primal computes only beta (forward-only scoring); alpha is built in
    custom_vjp's fwd, so ``jax.grad`` pays for it but plain calls do not.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .semiring import NEG_INF, logaddexp, masked_softmax
from ..utils.lengths import label_mask, time_mask


# Widest vocabulary for which the (B, S, N) one-hot matmul forms of the
# gathers/scatters are used; beyond it, true gathers/scatter-adds (slower
# per element, but not O(N) memory per target slot).
_ONEHOT_MAX_LABELS = 512


class AlignedLattice(NamedTuple):
    """Gathered, aligned-domain views of the emissions and transitions."""

    inputs: jnp.ndarray  # (T, B, S); -inf outside t < L_in[b] and s < L_out[b]
    self_trans: jnp.ndarray  # (B, S); T[y_s, y_s], 0 where s >= L_out[b]
    next_trans: jnp.ndarray  # (B, S); T[y_{s+1}, y_s], 0 where s >= L_out[b]-1
    targets: jnp.ndarray  # (B, S) clipped into [0, N)
    onehot: jnp.ndarray = None  # (B, S, N) one-hot of targets (0 where s invalid)


def gather_aligned_emissions(inputs, tgt, onehot, tmask, smask,
                             layout="tbs"):
    """(T, B, S) aligned emission gather ``I~[t,b,s] = I[t,b,tgt[b,s]]``,
    -inf outside ``tmask & smask``.  ``onehot`` is the smask-masked
    (B, S, N) indicator (the MXU path) or None for the true-gather path
    (wordpiece-scale N).  Factored out of ``make_aligned`` so chunk-wise
    callers (ops/streaming.py) can redo ONLY this per chunk while the
    transition gathers stay precomputed.

    ``layout='bts'`` returns the SAME values shaped (B, T, S) — the
    batched dot's native output order, which XLA lays out row-major with
    no relayout copy; the fused kernels consume it as (B, kb, S) blocks
    (scripts/exp_r3_bts.py, PERF_R3 §3's open lead)."""
    if onehot is None:
        if layout == "bts":
            out = gather_aligned_emissions(inputs, tgt, None, tmask, smask)
            return jnp.transpose(out, (1, 0, 2))
        t_total = inputs.shape[0]
        idx = jnp.broadcast_to(tgt[None], (t_total,) + tgt.shape)
        aligned = jnp.take_along_axis(inputs, idx, axis=2)
        valid = tmask[:, :, None] & smask[None, :, :]
        return jnp.where(valid, aligned, NEG_INF).astype(inputs.dtype)
    # -inf emissions (legal log-semiring values) would make 0 * -inf = NaN
    # in the matmul; substitute a sentinel and threshold it back.  Exact:
    # each masked one-hot row has exactly ONE nonzero, so the einsum
    # result IS the gathered value — a sentinel survives undisturbed.
    # (Real emissions are log-scores; nothing sane approaches -1e30.)
    sentinel = jnp.asarray(-1e30, inputs.dtype)
    safe_inputs = jnp.where(jnp.isfinite(inputs), inputs, sentinel)
    if layout == "bts":
        aligned = jnp.einsum(
            "tbi,bsi->bts", safe_inputs, onehot,
            precision=jax.lax.Precision.HIGHEST,
        )
        valid = (jnp.transpose(tmask)[:, :, None] & smask[:, None, :]
                 & (aligned > 0.5 * sentinel))
        return jnp.where(valid, aligned, NEG_INF)
    # onehot-as-lhs orientation: XLA's layout assignment then feeds the
    # kernels' (t, b, s) operand with S kept minor — a contiguous row
    # permutation instead of the ~460 GB/s minor-dim transpose copy.
    # Measured GO at the bench shape (round-4 adjudication of the
    # ASG_EINSUM_SWAP knob, docs/PERF_R4.md §2: ~15 µs off the fused
    # step); the mirrored "tbi,bsi->tbs" form was deleted with the knob.
    aligned = jnp.einsum(
        "bsi,tbi->tbs", onehot, safe_inputs,
        precision=jax.lax.Precision.HIGHEST,
    )
    valid = tmask[:, :, None] & smask[None, :, :] & (aligned > 0.5 * sentinel)
    return jnp.where(valid, aligned, NEG_INF)


def make_aligned(
    transition: jnp.ndarray,
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    input_lengths: jnp.ndarray,
    target_lengths: jnp.ndarray,
    layout: str = "tbs",
) -> AlignedLattice:
    """Vectorized equivalent of the reference's gather kernels (C10a/C10b).

    The emission gather I~[t,b,s] = I[t,b,y_s] runs as a one-hot batched
    matmul (MXU) rather than an indexed gather: TPU gathers with
    per-element index vectors serialize and are ~10x slower than the whole
    lattice recursion at the benchmark shape.  -inf emissions (legal in
    the log semiring, e.g. log-prob one-hots) are sanitized before the
    matmul (-inf x 0 = NaN) and restored via an indicator matmul.

    Above ``_ONEHOT_MAX_LABELS`` the (B, S, N) one-hot itself becomes the
    memory problem (12.8 GB at N=10k, B=64, S=50), so a true gather takes
    over — slower per element but O(T B S) total, and -inf flows through
    a gather natively.
    """
    t_total, num_batches, num_labels = inputs.shape
    s_total = targets.shape[1]
    tgt = jnp.clip(targets, 0, num_labels - 1)

    tmask = time_mask(t_total, input_lengths)  # (T, B)
    smask = label_mask(s_total, target_lengths)  # (B, S)

    if num_labels > _ONEHOT_MAX_LABELS:
        aligned = gather_aligned_emissions(inputs, tgt, None, tmask, smask,
                                           layout=layout)
        self_trans = jnp.where(smask, transition[tgt, tgt], 0.0)
        next_pairs = transition[tgt[:, 1:], tgt[:, :-1]]
        smask_next = (
            jnp.arange(s_total, dtype=target_lengths.dtype)[None, :]
            < (target_lengths - 1)[:, None]
        )
        next_trans = jnp.concatenate(
            [next_pairs, jnp.zeros((num_batches, 1), next_pairs.dtype)], axis=1
        )
        next_trans = jnp.where(smask_next, next_trans, 0.0)
        return AlignedLattice(
            aligned.astype(inputs.dtype), self_trans.astype(inputs.dtype),
            next_trans.astype(inputs.dtype), tgt, None,
        )

    onehot = jax.nn.one_hot(tgt, num_labels, dtype=inputs.dtype)  # (B, S, N)
    onehot = onehot * smask[:, :, None].astype(inputs.dtype)
    aligned = gather_aligned_emissions(inputs, tgt, onehot, tmask, smask,
                                       layout=layout)

    # Transition gathers T[y_s, y_s] / T[y_{s+1}, y_s] as one-hot matmuls
    # too: advanced-indexing gathers serialize on TPU and cost more than
    # the whole lattice recursion (C10b equivalent, MXU-native).  The
    # masked one-hot makes invalid slots exact zeros with no extra wheres.
    # -inf transitions (forbidden bigrams — legal log-semiring values) are
    # sanitized before the matmul (0 * -inf = NaN) and restored via an
    # indicator matmul, exactly like the emission gather above.
    tfinite = jnp.isfinite(transition)
    tsafe = jnp.where(tfinite, transition, 0.0).astype(inputs.dtype)
    tt = jnp.einsum(
        "bsj,ij->bsi", onehot, tsafe, precision=jax.lax.Precision.HIGHEST,
    )  # tt[b, s, i] = T[i, y_s] sanitized, 0 where s invalid
    tbad = jnp.einsum(
        "bsj,ij->bsi", onehot, (~tfinite).astype(inputs.dtype),
        precision=jax.lax.Precision.HIGHEST,
    )
    self_trans = jnp.einsum("bsi,bsi->bs", tt, onehot)
    self_bad = jnp.einsum("bsi,bsi->bs", tbad, onehot)
    self_trans = jnp.where(self_bad > 0.5, NEG_INF, self_trans)
    next_pairs = jnp.einsum("bsi,bsi->bs", tt[:, :-1], onehot[:, 1:])
    next_bad = jnp.einsum("bsi,bsi->bs", tbad[:, :-1], onehot[:, 1:])
    next_pairs = jnp.where(next_bad > 0.5, NEG_INF, next_pairs)
    next_trans = jnp.concatenate(
        [next_pairs, jnp.zeros((num_batches, 1), next_pairs.dtype)], axis=1
    )
    return AlignedLattice(aligned, self_trans, next_trans, tgt, onehot)


def _shift_right_s(x: jnp.ndarray, fill: float = NEG_INF) -> jnp.ndarray:
    """Shift along the last (s) axis so slot s holds the old slot s-1."""
    pad = jnp.full(x.shape[:-1] + (1,), fill, x.dtype)
    return jnp.concatenate([pad, x[..., :-1]], axis=-1)


def _shift_left_s(x: jnp.ndarray, fill: float = NEG_INF) -> jnp.ndarray:
    pad = jnp.full(x.shape[:-1] + (1,), fill, x.dtype)
    return jnp.concatenate([x[..., 1:], pad], axis=-1)


def _alpha_scan(lat: AlignedLattice) -> jnp.ndarray:
    """alpha: (T, B, S).  alpha[0] is seeded at s=0 only
    (``force_aligned_lattice.cpp:294``: all other states start inaccessible)."""
    t_total, num_batches, s_total = lat.inputs.shape
    a0 = jnp.full((num_batches, s_total), NEG_INF, lat.inputs.dtype)
    a0 = a0.at[:, 0].set(lat.inputs[0, :, 0])

    def step(a_prev, i_t):
        hori = a_prev + lat.self_trans
        diag = _shift_right_s(a_prev + lat.next_trans)
        a = i_t + logaddexp(hori, diag)  # grad-safe: posteriors autodiff here
        return a, a

    _, rest = lax.scan(step, a0, lat.inputs[1:])
    return jnp.concatenate([a0[None], rest], axis=0)


def _beta_scan(
    lat: AlignedLattice, input_lengths: jnp.ndarray, target_lengths: jnp.ndarray
) -> jnp.ndarray:
    """beta: (T, B, S), seeded 0 at (L_in[b]-1, L_out[b]-1); no emissions at
    the seed frame (beta excludes its own frame's emission)."""
    t_total, num_batches, s_total = lat.inputs.shape
    seed_row = (
        jnp.arange(s_total, dtype=target_lengths.dtype)[None, :]
        == (target_lengths - 1)[:, None]
    )
    seed = jnp.where(seed_row, 0.0, NEG_INF).astype(lat.inputs.dtype)
    b_last = jnp.where((input_lengths == t_total)[:, None], seed, NEG_INF)

    def step(b_next, xs):
        t, i_next = xs
        hori = lat.self_trans + i_next + b_next
        diag = lat.next_trans + _shift_left_s(i_next + b_next)
        raw = logaddexp(hori, diag)  # grad-safe: posteriors autodiff here
        b_t = jnp.where((input_lengths - 1 == t)[:, None], seed, raw)
        return b_t, b_t

    ts = jnp.arange(t_total - 2, -1, -1)
    _, rest = lax.scan(step, b_last, (ts, lat.inputs[1:][::-1]))
    return jnp.concatenate([rest[::-1], b_last[None]], axis=0)


def _score(beta0: jnp.ndarray, aligned0: jnp.ndarray) -> jnp.ndarray:
    # All aligned paths start at (t=0, s=0): score = beta[0,:,0] + I~[0,:,0]
    # (``force_aligned_lattice.cpp:316``).
    return beta0[:, 0] + aligned0[:, 0]


@jax.custom_vjp
def fac_score(
    transition: jnp.ndarray,
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    input_lengths: jnp.ndarray,
    target_lengths: jnp.ndarray,
) -> jnp.ndarray:
    """Force-aligned (numerator) scores, shape (B,)."""
    lat = make_aligned(transition, inputs, targets, input_lengths, target_lengths)
    beta = _beta_scan(lat, input_lengths, target_lengths)
    return _score(beta[0], lat.inputs[0])


def _fac_fwd(transition, inputs, targets, input_lengths, target_lengths):
    lat = make_aligned(transition, inputs, targets, input_lengths, target_lengths)
    alpha = _alpha_scan(lat)
    beta = _beta_scan(lat, input_lengths, target_lengths)
    score = _score(beta[0], lat.inputs[0])
    shapes = (inputs.shape[0], inputs.shape[2])
    return score, (lat, alpha, beta, target_lengths, shapes)


def aligned_domain_grads(lat: AlignedLattice, alpha, beta, g):
    """(g_aligned, g_self_trans, g_next_trans) in the aligned domain.

    Recomputed 2-way edge softmax (see module docstring).  ``sub`` guards
    the -inf - -inf = NaN case: alpha finite implies aligned input finite.
    """
    g_aligned = masked_softmax(alpha + beta, axis=2) * g[None, :, None]  # (T, B, S)

    sub = jnp.where(jnp.isfinite(alpha), lat.inputs - alpha, NEG_INF)
    hori = jnp.exp(alpha[:-1] + lat.self_trans[None] + sub[1:])
    diag = jnp.exp(
        _shift_right_s(alpha[:-1] + lat.next_trans[None]) + sub[1:]
    )

    gi_tail = g_aligned[1:]  # contributions for t >= 1
    # s = 0 has only the self-loop in-edge, factor 1
    # (``force_aligned_lattice.cpp:175``).
    edge_self = jnp.concatenate(
        [jnp.ones_like(hori[:, :, :1]), hori[:, :, 1:]], axis=2
    )
    g_self_trans = jnp.sum(gi_tail * edge_self, axis=0)  # (B, S)
    # next_trans[b, s] feeds state s+1; shift the diagonal mass down by one.
    g_next_trans = _shift_left_s(jnp.sum(gi_tail * diag, axis=0), fill=0.0)
    return g_aligned, g_self_trans, g_next_trans


def scatter_to_full(
    lat: AlignedLattice,
    g_aligned: jnp.ndarray,
    g_self_trans: jnp.ndarray,
    g_next_trans: jnp.ndarray,
    num_labels: int,
):
    """Scatter aligned-domain grads to (T,B,N) / (N,N) — the C10c/C10d
    equivalents.  Masked-out cells already carry exact zeros so the
    scatters are unconditional; everything is deterministic (the
    reference's CUDA twin needs atomicAdd,
    ``force_aligned_lattice_kernel.cu:291,297,418``).  ALL scatters run as
    transposed one-hot matmuls (MXU): TPU scatter ops serialize and cost
    more than the whole lattice recursion, both for the big (T,B,S) ->
    (T,B,N) emission grads and for the (N,N) transition grads.  For
    vocabularies past the one-hot budget (lat.onehot is None) the XLA
    scatter-add takes over — deterministic either way."""
    if lat.onehot is None:
        t_total, num_batches, s_total = g_aligned.shape
        grad_inputs = jnp.zeros(
            (t_total, num_batches, num_labels), g_aligned.dtype
        ).at[:, jnp.arange(num_batches)[:, None], lat.targets].add(g_aligned)
        grad_transition = jnp.zeros((num_labels, num_labels), g_aligned.dtype)
        grad_transition = grad_transition.at[lat.targets, lat.targets].add(
            g_self_trans
        )
        grad_transition = grad_transition.at[
            lat.targets[:, 1:], lat.targets[:, :-1]
        ].add(g_next_trans[:, :-1])
        return grad_transition, grad_inputs

    # onehot-as-lhs orientation, like the gather (round-4 GO memo,
    # docs/PERF_R4.md §2): keeps the scatter's operand/result layouts
    # aligned with the kernels' streams and measured faster than the
    # mirrored "tbs,bsi->tbi" form.
    grad_inputs = jnp.einsum(
        "bsi,tbs->tbi", lat.onehot, g_aligned,
        precision=jax.lax.Precision.HIGHEST,
    )

    # dT[i,j] += sum_{b,s} 1[y_s = i] g_self[b,s] 1[y_s = j]
    #          + sum_{b,s} 1[y_{s+1} = i] g_next[b,s] 1[y_s = j]
    hp = jax.lax.Precision.HIGHEST
    gt_self = jnp.einsum(
        "bsi,bs,bsj->ij", lat.onehot, g_self_trans, lat.onehot, precision=hp
    )
    gt_next = jnp.einsum(
        "bsi,bs,bsj->ij",
        lat.onehot[:, 1:], g_next_trans[:, :-1], lat.onehot[:, :-1],
        precision=hp,
    )
    return gt_self + gt_next, grad_inputs


def _fac_bwd(res, g):
    lat, alpha, beta, target_lengths, (t_total, num_labels) = res
    g_aligned, g_self_trans, g_next_trans = aligned_domain_grads(lat, alpha, beta, g)
    grad_transition, grad_inputs = scatter_to_full(
        lat, g_aligned, g_self_trans, g_next_trans, num_labels
    )
    return grad_transition, grad_inputs, None, None, None


fac_score.defvjp(_fac_fwd, _fac_bwd)
