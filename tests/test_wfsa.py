"""Generic WFSA scoring (the reference's unchecked "generalization to
... general WFSTs decoders" roadmap item, zh217/torch-asg README.md:34).

Validation strategy: the two ASG lattices are the extreme special cases
of the automaton scorer, so fcc_score / fac_score (themselves pinned to
the reference binary elsewhere) pin wfsa_score from both ends; a custom
mid-sized automaton is checked against brute-force path enumeration.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_asg_tpu import (
    WFSA,
    chain_wfsa,
    fac_score,
    fcc_score,
    full_wfsa,
    viterbi_align,
    viterbi_decode,
    wfsa_posteriors,
    wfsa_score,
    wfsa_viterbi,
)
from torch_asg_tpu.ops.fac import make_aligned

NEG_INF = float("-inf")


def _case(rng, T=9, B=3, N=5, S=4):
    inputs = jnp.asarray(rng.normal(size=(T, B, N)))
    trans = jnp.asarray(rng.normal(size=(N, N)) * 0.7)
    targets = jnp.asarray(rng.integers(0, N, size=(B, S)), jnp.int32)
    li = jnp.asarray([T, T - 2, S], jnp.int32)
    lo = jnp.asarray([S, S - 1, S - 2], jnp.int32)
    return inputs, trans, targets, li, lo


def test_full_wfsa_matches_fcc(rng):
    inputs, trans, _, li, _ = _case(rng)
    ref = fcc_score(trans, inputs, li)
    got = wfsa_score(full_wfsa(trans), inputs, li)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-10)


def test_chain_wfsa_matches_fac(rng):
    inputs, trans, targets, li, lo = _case(rng)
    ref = fac_score(trans, inputs, targets, li, lo)
    lat = make_aligned(trans, inputs, targets, li, lo)
    for b in range(inputs.shape[1]):
        n_out = int(lo[b])
        labels = targets[b, :n_out]
        fsa = chain_wfsa(
            labels, lat.self_trans[b, :n_out], lat.next_trans[b, :n_out]
        )
        got = wfsa_score(fsa, inputs[:, b : b + 1, :], li[b : b + 1])
        np.testing.assert_allclose(
            float(got[0]), float(ref[b]), rtol=1e-10
        )


def test_wfsa_brute_force_small(rng):
    """A 3-state grammar automaton vs explicit path enumeration."""
    T, N = 4, 4
    inputs = jnp.asarray(rng.normal(size=(T, 1, N)))
    # states: 0 (start), 1, 2 (final); arcs with distinct labels/weights
    src = jnp.asarray([0, 0, 1, 1, 2, 2], jnp.int32)
    dst = jnp.asarray([0, 1, 1, 2, 2, 0], jnp.int32)
    ilab = jnp.asarray([0, 1, 2, 3, 1, 0], jnp.int32)
    w = jnp.asarray(rng.normal(size=(6,)))
    start = jnp.asarray([0.0, NEG_INF, NEG_INF])
    final = jnp.asarray([NEG_INF, -0.3, 0.7])
    fsa = WFSA(src, dst, ilab, w, start, final)

    got = float(wfsa_score(fsa, inputs)[0])
    vit = wfsa_viterbi(fsa, inputs)

    arcs = list(zip(src.tolist(), dst.tolist(), ilab.tolist(), w.tolist()))
    scores = []
    best = (-np.inf, None)
    for path in itertools.product(range(6), repeat=T):
        state = 0
        tot = 0.0
        ok = True
        for t, a in enumerate(path):
            s, d, l, wt = arcs[a]
            if s != state:
                ok = False
                break
            tot += wt + float(inputs[t, 0, l])
            state = d
        if not ok or not np.isfinite(float(final[state])):
            continue
        tot += float(final[state])
        scores.append(tot)
        if tot > best[0]:
            best = (tot, path)
    ref = float(jax.scipy.special.logsumexp(jnp.asarray(scores)))
    np.testing.assert_allclose(got, ref, rtol=1e-9)
    np.testing.assert_allclose(float(vit.scores[0]), best[0], rtol=1e-9)
    np.testing.assert_array_equal(
        np.asarray(vit.labels[:, 0]),
        np.asarray([arcs[a][2] for a in best[1]], np.int32),
    )


def test_wfsa_viterbi_matches_decoders(rng):
    inputs, trans, targets, li, lo = _case(rng)
    # full automaton best path == viterbi_decode
    ref = viterbi_decode(trans, inputs, li)
    got = wfsa_viterbi(full_wfsa(trans), inputs, li)
    np.testing.assert_allclose(
        np.asarray(got.scores), np.asarray(ref.scores), rtol=1e-10
    )
    np.testing.assert_array_equal(
        np.asarray(got.labels), np.asarray(ref.paths)
    )
    # chain automaton best path == viterbi_align positions
    refa = viterbi_align(trans, inputs, targets, li, lo)
    lat = make_aligned(trans, inputs, targets, li, lo)
    for b in range(inputs.shape[1]):
        n_out = int(lo[b])
        fsa = chain_wfsa(
            targets[b, :n_out],
            lat.self_trans[b, :n_out],
            lat.next_trans[b, :n_out],
        )
        gb = wfsa_viterbi(fsa, inputs[:, b : b + 1, :], li[b : b + 1])
        np.testing.assert_allclose(
            float(gb.scores[0]), float(refa.scores[b]), rtol=1e-10
        )
        np.testing.assert_array_equal(
            np.asarray(gb.states[:, 0]), np.asarray(refa.positions[:, b])
        )


def test_wfsa_posteriors_sum_to_one(rng):
    inputs, trans, _, li, _ = _case(rng)
    post = wfsa_posteriors(full_wfsa(trans), inputs, li)
    sums = np.asarray(post.sum(axis=2))
    tmask = (np.arange(inputs.shape[0])[:, None] < np.asarray(li)[None, :])
    np.testing.assert_allclose(sums[tmask], 1.0, atol=1e-8)
    np.testing.assert_allclose(sums[~tmask], 0.0, atol=1e-8)


def test_wfsa_grad_flows_to_weights(rng):
    inputs, trans, _, li, _ = _case(rng)

    def loss(w):
        fsa = full_wfsa(trans)
        fsa = fsa._replace(weight=w)
        return wfsa_score(fsa, inputs, li).sum()

    fsa = full_wfsa(trans)
    g = jax.grad(loss)(fsa.weight)
    assert np.isfinite(np.asarray(g)).all()
    assert np.any(np.asarray(g) != 0.0)
    # cross-check against the lattice-path transition gradient: the
    # derivative wrt arc (j -> i) equals d fcc / d T[i, j]
    gt = jax.grad(lambda tr: fcc_score(tr, inputs, li).sum())(trans)
    n = trans.shape[0]
    arc_part = np.asarray(g[n:]).reshape(n, n)  # skip super-initial arcs
    np.testing.assert_allclose(arc_part, np.asarray(gt), rtol=1e-8, atol=1e-10)


def test_lexicon_wfsa_union_matches_fac_logsumexp(rng):
    """Single-word acceptance: the union-of-chains automaton's total score
    is the logsumexp over words of that word's force-aligned score (each
    accepting path lives in exactly one chain, and each chain IS the FAC
    lattice of its word)."""
    from torch_asg_tpu import lexicon_wfsa

    T, N = 10, 6
    inputs = jnp.asarray(rng.normal(size=(T, 1, N)))
    trans = jnp.asarray(rng.normal(size=(N, N)) * 0.5)
    # no adjacent repeats inside a word: the run-collapse check below
    # would merge them (that collapse is exactly why ASG encodes repeats
    # with dedicated symbols)
    words = [np.asarray(w, np.int32) for w in ([1, 2, 3], [4, 0], [5, 4, 1, 2])]
    weights = jnp.asarray(rng.normal(size=(len(words),)))

    fsa = lexicon_wfsa(trans, words, weights)
    got = wfsa_score(fsa, inputs)

    per_word = []
    for w, ww in zip(words, np.asarray(weights)):
        s = fac_score(
            trans, inputs, jnp.asarray(w[None]),
            jnp.asarray([T], jnp.int32),
            jnp.asarray([len(w)], jnp.int32),
        )
        per_word.append(float(s[0]) + float(ww))
    ref = float(jax.scipy.special.logsumexp(jnp.asarray(per_word)))
    np.testing.assert_allclose(float(got[0]), ref, rtol=1e-10)

    # best word = the viterbi path's chain; its labels collapse to a word
    vit = wfsa_viterbi(fsa, inputs)
    labs = np.asarray(vit.labels[:, 0])
    dedup = [l for i, l in enumerate(labs) if i == 0 or l != labs[i - 1]]
    assert any(dedup == list(w) for w in words)


def test_lexicon_wfsa_loop_brute_force(rng):
    """Continuous recognition (loop=True) vs explicit path enumeration
    over word sequences on a tiny lexicon."""
    from torch_asg_tpu import lexicon_wfsa

    T, N = 5, 4
    inputs_np = rng.normal(size=(T, 1, N))
    inputs = jnp.asarray(inputs_np)
    trans_np = rng.normal(size=(N, N)) * 0.5
    words = [np.asarray([0, 1], np.int32), np.asarray([2], np.int32)]
    ww = np.asarray([0.3, -0.2])

    fsa = lexicon_wfsa(jnp.asarray(trans_np), words, jnp.asarray(ww), loop=True)
    got = float(wfsa_score(fsa, inputs)[0])

    # enumerate label paths that parse as word sequences with per-state
    # dwell times (every word state consumes >= 1 frame, in order)
    def parses(path):
        """All (word sequence, boundaries) consistent with the framewise
        label path under the chain semantics."""
        # dynamic check: walk the automaton states explicitly
        # state = (word idx, position); start options from each word
        results = 0.0
        scores = []

        def walk(t, wi, pos, acc):
            y = words[wi][pos]
            if path[t] != y:
                return
            a = acc + float(inputs_np[t, 0, y])
            if t == T - 1:
                if pos == len(words[wi]) - 1:
                    scores.append(a)
                return
            # stay
            walk(t + 1, wi, pos, a + float(trans_np[y, y]))
            # advance within word
            if pos + 1 < len(words[wi]):
                nxt = words[wi][pos + 1]
                walk(t + 1, wi, pos + 1, a + float(trans_np[nxt, y]))
            # word boundary
            if pos == len(words[wi]) - 1:
                for wj in range(len(words)):
                    nxt = words[wj][0]
                    walk(
                        t + 1, wj, 0,
                        a + float(ww[wj]) + float(trans_np[nxt, y]),
                    )

        for wi in range(len(words)):
            walk(0, wi, 0, float(ww[wi]))
        return scores

    all_scores = []
    for path in itertools.product(range(N), repeat=T):
        all_scores.extend(parses(path))
    ref = float(jax.scipy.special.logsumexp(jnp.asarray(all_scores)))
    np.testing.assert_allclose(got, ref, rtol=1e-9)
