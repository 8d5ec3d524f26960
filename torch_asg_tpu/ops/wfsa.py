"""Generic weighted-FSA scoring over emission lattices.

The reference's last unchecked roadmap item is "generalization to better
integrate with general WFSTs decoders" (zh217/torch-asg ``README.md:34``).
This module is that generalization at the criterion level: score ANY
epsilon-free weighted finite-state acceptor against a (T, B, N) emission
lattice in the log or tropical semiring.  The ASG lattices are the two
extreme special cases (pinned by tests):

  * the fully-connected denominator = the N-state complete automaton
    (``fcc_score``);
  * the force-aligned numerator = the linear chain automaton over the
    target sequence (``fac_score``).

Anything between — lexicons, n-gram grammars, pronunciation graphs,
decoding graphs composed offline — scores through the same entry point,
so an external WFST toolkit only needs to EXPORT its composed graph as
arc arrays.

TPU-first design
  * The graph is static per compilation (arc arrays are jit constants or
    donated args); recursions are ``lax.scan`` over T with static shapes.
  * Per step: arc scores (B, E) = alpha[:, src] + w + I[t, :, ilabel],
    reduced per destination state with a deterministic segment logsumexp
    (segment_max + segment_sum of exps) — XLA scatters are deterministic,
    unlike the reference's CUDA atomicAdd path.
  * Gradients flow by autodiff through the scan (the segment ops are
    differentiable); occupation marginals come from the standard
    alpha+beta identity like ops/posteriors.py.
  * The tropical variant returns the best path through the automaton
    (argmax backtrace over incoming arcs), generalizing viterbi_align.

Scale notes: work is O(T * B * E); states/arcs live in (B, S)/(B, E)
rows.  For letter-scale graphs (E up to a few thousand) this is XLA-scan
territory like ops/viterbi.py; the fused Pallas path stays specialized to
the two ASG lattices where the structure admits matmul/band forms.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .semiring import NEG_INF, logsumexp


class WFSA(NamedTuple):
    """Epsilon-free weighted acceptor (log-domain weights).

    States are 0..num_states-1.  Arc e accepts emission label
    ``ilabel[e]`` moving ``src[e] -> dst[e]`` with weight ``weight[e]``.
    ``start`` / ``final`` are (num_states,) log-weights (-inf = absent).
    Every path consumes exactly one emission frame per arc.
    """

    src: jnp.ndarray  # (E,) int32
    dst: jnp.ndarray  # (E,) int32
    ilabel: jnp.ndarray  # (E,) int32 emission labels
    weight: jnp.ndarray  # (E,) float
    start: jnp.ndarray  # (S,) float log start weights
    final: jnp.ndarray  # (S,) float log final weights

    @property
    def num_states(self) -> int:
        return self.start.shape[0]

    @property
    def num_arcs(self) -> int:
        return self.src.shape[0]


def chain_wfsa(
    labels: jnp.ndarray,
    self_weights: jnp.ndarray,
    next_weights: jnp.ndarray,
) -> WFSA:
    """The force-aligned linear chain for ONE target sequence: state s
    self-loops with ``self_weights[s]`` and advances s -> s+1 with
    ``next_weights[s]``, emitting ``labels[s]`` / ``labels[s+1]``.

    Paths consume one ARC per frame (acceptor semantics), so a
    super-initial state sigma feeds state 0 with a free arc emitting
    ``labels[0]`` — this reproduces the lattice convention where frame 0
    is emitted with no transition score (``force_aligned_lattice.cpp:294``
    seeds alpha_0 at s = 0 with the bare emission)."""
    n = labels.shape[0]
    dt = self_weights.dtype
    sigma = n  # super-initial state id
    src = jnp.concatenate(
        [jnp.asarray([sigma]), jnp.arange(n), jnp.arange(n - 1)]
    ).astype(jnp.int32)
    dst = jnp.concatenate(
        [jnp.asarray([0]), jnp.arange(n), jnp.arange(1, n)]
    ).astype(jnp.int32)
    ilab = jnp.concatenate([labels[:1], labels, labels[1:]]).astype(jnp.int32)
    w = jnp.concatenate(
        [jnp.zeros((1,), dt), self_weights, next_weights[: n - 1]]
    ).astype(dt)
    start = jnp.full((n + 1,), NEG_INF, dt).at[sigma].set(0.0)
    final = jnp.full((n + 1,), NEG_INF, dt).at[n - 1].set(0.0)
    return WFSA(src, dst, ilab, w, start, final)


def full_wfsa(transition: jnp.ndarray) -> WFSA:
    """The fully-connected automaton of the ASG denominator: state i
    emits label i; arc j -> i carries ``transition[i, j]``; a
    super-initial state feeds every label with weight 0 (frame 0 carries
    no transition score, matching ``fully_connected_lattice.cpp``'s
    alpha_0 = I_0)."""
    n = transition.shape[0]
    dt = transition.dtype
    sigma = n
    ii, jj = jnp.meshgrid(jnp.arange(n), jnp.arange(n), indexing="ij")
    src = jnp.concatenate(
        [jnp.full((n,), sigma), jj.reshape(-1)]
    ).astype(jnp.int32)
    dst = jnp.concatenate([jnp.arange(n), ii.reshape(-1)]).astype(jnp.int32)
    ilab = dst
    w = jnp.concatenate([jnp.zeros((n,), dt), transition.reshape(-1)]).astype(dt)
    start = jnp.full((n + 1,), NEG_INF, dt).at[sigma].set(0.0)
    final = jnp.zeros((n + 1,), dt).at[sigma].set(NEG_INF)
    return WFSA(src, dst, ilab, w, start, final)


def lexicon_wfsa(
    transition: jnp.ndarray,
    words,
    word_weights=None,
    loop: bool = False,
) -> WFSA:
    """Union-of-chains acceptor over a pronunciation lexicon.

    ``words`` is a list of 1-D int label sequences (ASG-encoded: repeat
    symbols already expanded by ``runtime.encode_targets``).  Each word
    becomes a linear chain — per-state self-loop ``T[y, y]``, advance
    ``T[y_{k+1}, y_k]`` gathered from the (N, N) ASG transition — and a
    shared super-initial state feeds every word's first state with
    ``word_weights[w]`` (e.g. log unigram probabilities; frame 0 emits
    with no transition score, the ASG lattice convention).  Accepting
    states are the word ends.

    ``loop=True`` additionally connects every word end to every word
    start (weight ``word_weights[w'] + T[first(w'), last(w)]``) for
    continuous multi-word recognition — score/decode/posterior the
    result with ``wfsa_score`` / ``wfsa_viterbi`` / ``wfsa_posteriors``.

    Graph construction is host-side numpy (static per compilation), like
    exporting a composed WFST; only scoring runs on device.
    """
    import numpy as np

    if not words:
        raise ValueError("lexicon_wfsa needs at least one word")
    words = [np.asarray(w, np.int32).reshape(-1) for w in words]
    if any(w.size == 0 for w in words):
        raise ValueError("empty word in lexicon")
    trans_np = np.asarray(transition)
    dt = trans_np.dtype
    if word_weights is None:
        word_weights = np.zeros((len(words),), dt)
    word_weights = np.asarray(word_weights, dt)

    offsets = np.cumsum([0] + [w.size for w in words])[:-1]
    num_states = int(sum(w.size for w in words)) + 1
    sigma = num_states - 1

    src, dst, ilab, wt = [], [], [], []
    for w, off, ww in zip(words, offsets, word_weights):
        ks = np.arange(w.size, dtype=np.int32) + off
        # entry from the super-initial state (no transition score)
        src.append([sigma]); dst.append([ks[0]]); ilab.append([w[0]])
        wt.append([ww])
        # self loops
        src.append(ks); dst.append(ks); ilab.append(w)
        wt.append(trans_np[w, w])
        # advances
        src.append(ks[:-1]); dst.append(ks[1:]); ilab.append(w[1:])
        wt.append(trans_np[w[1:], w[:-1]])
    if loop:
        lasts = [off + w.size - 1 for w, off in zip(words, offsets)]
        for w_from, last in zip(words, lasts):
            for w_to, off_to, ww in zip(words, offsets, word_weights):
                src.append([last]); dst.append([off_to])
                ilab.append([w_to[0]])
                wt.append([ww + trans_np[w_to[0], w_from[-1]]])

    start = np.full((num_states,), -np.inf, dt)
    start[sigma] = 0.0
    final = np.full((num_states,), -np.inf, dt)
    for w, off in zip(words, offsets):
        final[off + w.size - 1] = 0.0

    cat = lambda parts, t: jnp.asarray(np.concatenate(
        [np.asarray(p) for p in parts]).astype(t))
    return WFSA(
        cat(src, np.int32), cat(dst, np.int32), cat(ilab, np.int32),
        cat(wt, dt), jnp.asarray(start), jnp.asarray(final),
    )


def _arc_emissions(i_t: jnp.ndarray, ilabel: jnp.ndarray) -> jnp.ndarray:
    """(B, E) emission score of each arc at one frame: I[t, :, ilabel]."""
    return jnp.take(i_t, ilabel, axis=1)


def _segment_lse(scores: jnp.ndarray, dst: jnp.ndarray, num_states: int):
    """Log-semiring sum of (B, E) arc scores into (B, S) destinations."""
    m = jax.ops.segment_max(
        scores.T, dst, num_segments=num_states, indices_are_sorted=False
    )  # (S, B)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    s = jax.ops.segment_sum(
        jnp.exp(scores.T - m_safe[dst]), dst, num_segments=num_states
    )
    out = jnp.where(s > 0, jnp.log(jnp.where(s > 0, s, 1.0)) + m_safe, NEG_INF)
    return out.T  # (B, S)


def wfsa_score(
    fsa: WFSA,
    inputs: jnp.ndarray,
    input_lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Log-semiring total path score per batch element, shape (B,).

    score_b = lse over accepting paths (one ARC per frame, L_in[b] arcs):
      start[p_0] + sum_t (weight[e_t] + I[t, b, ilabel[e_t]]) + final[p_L].
    Ragged lengths are masked: alpha freezes past L_in[b] and the final
    combination is snapshotted at t == L_in[b] - 1.
    """
    t_total, num_batches, _ = inputs.shape
    if input_lengths is None:
        input_lengths = jnp.full((num_batches,), t_total, jnp.int32)
    dt = inputs.dtype
    alpha0 = jnp.broadcast_to(fsa.start.astype(dt), (num_batches, fsa.num_states))

    def step(carry, xs):
        alpha, score = carry
        t, i_t = xs
        arc = (
            jnp.take(alpha, fsa.src, axis=1)
            + fsa.weight.astype(dt)[None, :]
            + _arc_emissions(i_t, fsa.ilabel)
        )
        alpha_new = _segment_lse(arc, fsa.dst, fsa.num_states)
        active = (t < input_lengths)[:, None]
        alpha = jnp.where(active, alpha_new, alpha)
        # score snapshots at t == L_in - 1
        done = (t == input_lengths - 1)[:, None]
        fin = logsumexp(alpha + fsa.final.astype(dt)[None, :], axis=1)
        score = jnp.where(done[:, 0], fin, score)
        return (alpha, score), None

    ts = jnp.arange(t_total)
    (alpha, score), _ = lax.scan(
        step, (alpha0, jnp.full((num_batches,), NEG_INF, dt)), (ts, inputs)
    )
    return score


class WFSAPath(NamedTuple):
    scores: jnp.ndarray  # (B,) best-path scores
    states: jnp.ndarray  # (T, B) int32 state sequence (dst of each frame), -1 pad
    labels: jnp.ndarray  # (T, B) int32 emitted labels, -1 at padding


def _viterbi_arc_step(fsa: WFSA, alpha: jnp.ndarray, i_t: jnp.ndarray):
    """One tropical frame: (best (B, S), back (B, S) best incoming arc
    id, or E for unreachable states).  Shared by the one-shot and the
    streaming decoder so tie-breaking (lowest arc id) is identical."""
    dt = alpha.dtype
    arc = (
        jnp.take(alpha, fsa.src, axis=1)
        + fsa.weight.astype(dt)[None, :]
        + _arc_emissions(i_t.astype(dt), fsa.ilabel)
    )  # (B, E)
    best = jax.ops.segment_max(
        arc.T, fsa.dst, num_segments=fsa.num_states
    ).T  # (B, S)
    # arc index achieving the max per destination (deterministic:
    # lowest arc id wins ties via the min over matching arcs)
    is_best = arc >= jnp.take(best, fsa.dst, axis=1) - 0.0
    arc_ids = jnp.arange(fsa.num_arcs, dtype=jnp.int32)[None, :]
    big = jnp.asarray(fsa.num_arcs, jnp.int32)
    cand = jnp.where(is_best & jnp.isfinite(arc), arc_ids, big)
    back = jax.ops.segment_min(
        cand.T, fsa.dst, num_segments=fsa.num_states
    ).T  # (B, S)
    return best, back


def _wfsa_walk(fsa: WFSA, end_state: jnp.ndarray, backs: jnp.ndarray,
               inside: jnp.ndarray):
    """Arc backtrace from ``end_state`` through ``backs`` (T, B, S);
    ``inside`` (T, B) marks consumed frames.  Returns (states, labels),
    each (T, B) with -1 outside.  Shared one-shot/streaming."""
    num_batches = end_state.shape[0]
    src_ext = jnp.concatenate([fsa.src, jnp.zeros((1,), jnp.int32)])
    lab_ext = jnp.concatenate([fsa.ilabel, -jnp.ones((1,), jnp.int32)])

    def backtrack(state, xs):
        back_t, in_t = xs  # (B, S), (B,)
        arc = back_t[jnp.arange(num_batches), state]  # (B,)
        arc = jnp.where(in_t, arc, fsa.num_arcs)
        lab = jnp.take(lab_ext, arc)
        prev = jnp.where(in_t, jnp.take(src_ext, arc), state)
        out_state = jnp.where(in_t, state, -1)
        return prev, (out_state, lab)

    _, (states_rev, labels_rev) = lax.scan(
        backtrack, end_state, (backs[::-1], inside[::-1])
    )
    return states_rev[::-1], labels_rev[::-1]


def wfsa_viterbi(
    fsa: WFSA,
    inputs: jnp.ndarray,
    input_lengths: Optional[jnp.ndarray] = None,
) -> WFSAPath:
    """Tropical-semiring best path through the automaton (decode), with
    an arc backtrace — the WFST-decoder integration point."""
    t_total, num_batches, _ = inputs.shape
    if input_lengths is None:
        input_lengths = jnp.full((num_batches,), t_total, jnp.int32)
    dt = inputs.dtype
    alpha0 = jnp.broadcast_to(fsa.start.astype(dt), (num_batches, fsa.num_states))
    big = jnp.asarray(fsa.num_arcs, jnp.int32)

    def step(alpha, xs):
        t, i_t = xs
        best, back = _viterbi_arc_step(fsa, alpha, i_t)
        active = (t < input_lengths)[:, None]
        alpha_new = jnp.where(active, best, alpha)
        back = jnp.where(active, back, big)
        return alpha_new, back

    ts = jnp.arange(t_total)
    alpha_fin, backs = lax.scan(step, alpha0, (ts, inputs))  # backs (T, B, S)

    final_tot = alpha_fin + fsa.final.astype(dt)[None, :]
    scores = jnp.max(final_tot, axis=1)
    end_state = jnp.argmax(final_tot, axis=1).astype(jnp.int32)
    inside = (
        jnp.arange(t_total)[:, None] < input_lengths[None, :]
    )  # (T, B)
    states, labels = _wfsa_walk(fsa, end_state, backs, inside)
    return WFSAPath(scores, states, labels)


def wfsa_posteriors(
    fsa: WFSA,
    inputs: jnp.ndarray,
    input_lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-frame emission-label occupation marginals (T, B, N):
    d score / d inputs — soft alignments under the automaton."""
    if input_lengths is None:
        t_total, num_batches, _ = inputs.shape
        input_lengths = jnp.full((num_batches,), t_total, jnp.int32)
    return jax.grad(lambda i: wfsa_score(fsa, i, input_lengths).sum())(inputs)
