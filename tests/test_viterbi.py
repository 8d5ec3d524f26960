"""Viterbi decoder / forced-alignment tests (tropical semiring).

The decoder closes the reference's open roadmap item (README.md:33); the
math is the max-semiring limit of the lattice recursions
(doc/tech_report.tex:78-88).  Checked against an independent torch oracle
and against brute-force path enumeration on tiny lattices.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from torch_asg_tpu import viterbi_align, viterbi_decode, viterbi_nbest

from oracle import viterbi_oracle


def _brute_force_decode(transition, inputs, L):
    """Enumerate all label paths of length L; return best score and path."""
    T, N = inputs.shape
    best, best_path = -np.inf, None
    for path in itertools.product(range(N), repeat=L):
        s = inputs[0, path[0]]
        for t in range(1, L):
            s += transition[path[t], path[t - 1]] + inputs[t, path[t]]
        if s > best:
            best, best_path = s, path
    return best, list(best_path)


@pytest.mark.parametrize("seed", range(3))
def test_viterbi_decode_matches_oracle(seed):
    r = np.random.default_rng(seed)
    T, B, N = 7, 3, 5
    inputs = r.normal(size=(T, B, N))
    trans = r.normal(size=(N, N))
    lengths = np.array([7, 4, 1])
    res = viterbi_decode(jnp.asarray(trans), jnp.asarray(inputs), jnp.asarray(lengths))
    want_scores, want_paths = viterbi_oracle(
        torch.tensor(trans), torch.tensor(inputs), lengths
    )
    np.testing.assert_allclose(
        np.asarray(res.scores), want_scores.numpy(), rtol=1e-12
    )
    paths = np.asarray(res.paths)
    for b in range(B):
        L = lengths[b]
        assert paths[:L, b].tolist() == want_paths[b]
        assert (paths[L:, b] == -1).all()


def test_viterbi_decode_brute_force():
    r = np.random.default_rng(42)
    T, N = 4, 3
    inputs = r.normal(size=(T, 1, N))
    trans = r.normal(size=(N, N))
    res = viterbi_decode(jnp.asarray(trans), jnp.asarray(inputs))
    want, want_path = _brute_force_decode(trans, inputs[:, 0], T)
    np.testing.assert_allclose(float(res.scores[0]), want, rtol=1e-12)
    assert np.asarray(res.paths)[:, 0].tolist() == want_path


def _brute_force_align(transition, inputs, y, L):
    """Enumerate monotonic alignments of targets y to L frames."""
    S = len(y)
    best, best_pos = -np.inf, None
    # positions: nondecreasing, step <= 1, start at 0, end at S-1
    def rec(t, s, score, pos):
        nonlocal best, best_pos
        score = score + inputs[t, y[s]]
        pos = pos + [s]
        if t == L - 1:
            if s == S - 1 and score > best:
                best, best_pos = score, pos
            return
        rec(t + 1, s, score + transition[y[s], y[s]], pos)
        if s + 1 < S:
            rec(t + 1, s + 1, score + transition[y[s + 1], y[s]], pos)

    rec(0, 0, 0.0, [])
    return best, best_pos


def _align_path_score(transition, inputs, y, pos):
    """Score of a given monotonic alignment path (for optimality checks)."""
    s = inputs[0, y[pos[0]]]
    for t in range(1, len(pos)):
        cur, prev = pos[t], pos[t - 1]
        s += transition[y[cur], y[prev]] + inputs[t, y[cur]]
    return s


@pytest.mark.parametrize("seed", range(3))
def test_viterbi_align_brute_force(seed):
    # Repeated labels in the targets make distinct alignments exactly
    # tied, so check the returned path is *an* optimal valid alignment
    # (same score as brute force) rather than one specific tie-break.
    r = np.random.default_rng(seed)
    T, N, S = 6, 4, 3
    inputs = r.normal(size=(T, 1, N))
    trans = r.normal(size=(N, N))
    y = r.integers(0, N, size=(S,))
    res = viterbi_align(
        jnp.asarray(trans), jnp.asarray(inputs), jnp.asarray(y[None, :])
    )
    want, _ = _brute_force_align(trans, inputs[:, 0], y.tolist(), T)
    np.testing.assert_allclose(float(res.scores[0]), want, rtol=1e-12)
    pos = np.asarray(res.positions)[:, 0].tolist()
    assert pos[0] == 0 and pos[-1] == S - 1
    assert all(step in (0, 1) for step in np.diff(pos))
    np.testing.assert_allclose(
        _align_path_score(trans, inputs[:, 0], y.tolist(), pos), want, rtol=1e-12
    )
    assert np.asarray(res.labels)[:, 0].tolist() == [y[s] for s in pos]


def test_viterbi_align_ragged():
    r = np.random.default_rng(11)
    T, B, N, S = 6, 2, 4, 3
    inputs = r.normal(size=(T, B, N))
    trans = r.normal(size=(N, N))
    targets = r.integers(0, N, size=(B, S))
    li = np.array([6, 4])
    lo = np.array([3, 2])
    res = viterbi_align(
        jnp.asarray(trans),
        jnp.asarray(inputs),
        jnp.asarray(targets),
        jnp.asarray(li),
        jnp.asarray(lo),
    )
    for b in range(B):
        y = targets[b, : lo[b]].tolist()
        want, _ = _brute_force_align(trans, inputs[:, b], y, li[b])
        np.testing.assert_allclose(float(res.scores[b]), want, rtol=1e-12)
        pos = np.asarray(res.positions)[:, b]
        valid = pos[: li[b]].tolist()
        assert valid[0] == 0 and valid[-1] == lo[b] - 1
        assert all(step in (0, 1) for step in np.diff(valid))
        np.testing.assert_allclose(
            _align_path_score(trans, inputs[:, b], y, valid), want, rtol=1e-12
        )
        assert (pos[li[b]:] == -1).all()
    # alignment score is <= log-semiring aligned score (max <= logsumexp)
    from torch_asg_tpu import fac_score

    lse = fac_score(
        jnp.asarray(trans), jnp.asarray(inputs), jnp.asarray(targets),
        jnp.asarray(li), jnp.asarray(lo),
    )
    assert np.all(np.asarray(res.scores) <= np.asarray(lse) + 1e-9)


def _brute_force_nbest(transition, inputs, L, k):
    """All length-L paths scored and sorted descending; top k."""
    T, N = inputs.shape
    scored = []
    for path in itertools.product(range(N), repeat=L):
        s = inputs[0, path[0]]
        for t in range(1, L):
            s += transition[path[t], path[t - 1]] + inputs[t, path[t]]
        scored.append((s, list(path)))
    scored.sort(key=lambda x: -x[0])
    return scored[:k]


@pytest.mark.parametrize("k", [1, 3, 5])
def test_viterbi_nbest_brute_force(k):
    r = np.random.default_rng(7)
    T, N = 4, 3
    inputs = r.normal(size=(T, 1, N))
    trans = r.normal(size=(N, N))
    res = viterbi_nbest(jnp.asarray(trans), jnp.asarray(inputs), k)
    want = _brute_force_nbest(trans, inputs[:, 0], T, k)
    got_scores = np.asarray(res.scores)[0]
    got_paths = np.asarray(res.paths)[:, 0, :]
    for rank, (ws, wp) in enumerate(want):
        np.testing.assert_allclose(got_scores[rank], ws, rtol=1e-12)
        assert got_paths[:, rank].tolist() == wp


def test_viterbi_nbest_rank0_is_decode(rng):
    T, B, N = 9, 3, 5
    inputs = jnp.asarray(rng.normal(size=(T, B, N)))
    trans = jnp.asarray(rng.normal(size=(N, N)))
    li = jnp.asarray([9, 6, 2], jnp.int32)
    nb = viterbi_nbest(trans, inputs, 4, li)
    one = viterbi_decode(trans, inputs, li)
    np.testing.assert_allclose(nb.scores[:, 0], one.scores, rtol=1e-12)
    np.testing.assert_array_equal(
        np.asarray(nb.paths)[:, :, 0], np.asarray(one.paths)
    )
    # ranks strictly ordered, all k paths distinct per element
    s = np.asarray(nb.scores)
    assert np.all(np.diff(s, axis=1) <= 1e-12)
    paths = np.asarray(nb.paths)
    for b in range(B):
        cols = [tuple(paths[:, b, r]) for r in range(4)]
        assert len(set(cols)) == 4


def test_viterbi_nbest_ragged_brute_force():
    r = np.random.default_rng(11)
    T, B, N, k = 5, 2, 3, 4
    inputs = r.normal(size=(T, B, N))
    trans = r.normal(size=(N, N))
    lens = [5, 3]
    res = viterbi_nbest(
        jnp.asarray(trans), jnp.asarray(inputs), k, jnp.asarray(lens)
    )
    for b in range(B):
        want = _brute_force_nbest(trans, inputs[:, b], lens[b], k)
        for rank, (ws, wp) in enumerate(want):
            np.testing.assert_allclose(
                np.asarray(res.scores)[b, rank], ws, rtol=1e-12
            )
            col = np.asarray(res.paths)[:, b, rank]
            assert col[: lens[b]].tolist() == wp
            assert (col[lens[b]:] == -1).all()


def test_viterbi_nbest_chunked_matches(rng, monkeypatch):
    from torch_asg_tpu.ops import viterbi as vit_mod

    T, B, N, k = 8, 2, 9, 3
    inputs = jnp.asarray(rng.normal(size=(T, B, N)))
    trans = jnp.asarray(rng.normal(size=(N, N)) * 0.5)
    li = jnp.asarray([8, 5], jnp.int32)
    ref = viterbi_nbest(trans, inputs, k, li)
    monkeypatch.setattr(vit_mod, "_CHUNK_MIN_LABELS", 4)
    monkeypatch.setattr(vit_mod, "_CHUNK_SIZE", 4)
    got = viterbi_nbest(trans, inputs, k, li)
    np.testing.assert_allclose(got.scores, ref.scores)
    np.testing.assert_array_equal(np.asarray(got.paths), np.asarray(ref.paths))


def test_select_rows_matches_take_along_axis(rng):
    """The gather-free one-hot row select used by every backtrace scan
    (take_along_axis serializes on TPU) is exact — ints, floats, -inf,
    negative values, repeated indices."""
    from torch_asg_tpu.ops.viterbi import _select_row, _select_rows

    vals_f = rng.normal(size=(5, 17)).astype(np.float32)
    vals_f[0, 3] = -np.inf
    vals_f[2, 0] = -7.25
    vals_i = rng.integers(-40, 40, size=(5, 17)).astype(np.int32)
    idx = rng.integers(0, 17, size=(5, 4)).astype(np.int32)
    idx[1, 2] = idx[1, 1]  # repeated pick
    for vals in (vals_f, vals_i):
        ref = np.take_along_axis(np.asarray(vals), np.asarray(idx), axis=1)
        got = _select_rows(jnp.asarray(vals), jnp.asarray(idx))
        np.testing.assert_array_equal(np.asarray(got), ref)
        got1 = _select_row(jnp.asarray(vals), jnp.asarray(idx[:, 0]))
        np.testing.assert_array_equal(np.asarray(got1), ref[:, 0])


def test_topk_wide_fallback_matches_lax(rng, monkeypatch):
    """The iterative (max, argmax, mask) top-k used past
    _TOPK_SORT_MAX_WIDTH (lax.top_k hangs the TPU compiler and crashes
    the worker at width 40k) matches lax.top_k exactly — values AND
    indices, including ascending-index order among exact ties."""
    from torch_asg_tpu.ops import viterbi as vit_mod

    x = rng.normal(size=(3, 5, 200)).astype(np.float32)
    # manufacture exact ties, incl. a tie inside the top-k and at rank k
    x[0, 0, 17] = x[0, 0, 3] = 50.0
    x[1, 2, :] = 1.0
    x[2, 4, 10:14] = x[2, 4, 2]
    # -inf rows (nbest's unseeded rank slots): top_k yields ascending
    # DISTINCT indices even though every value is -inf
    x[0, 1, :] = -np.inf
    x[1, 3, 2:] = -np.inf  # only 2 finite entries < k=4
    for k in (1, 4):
        ref_v, ref_i = jax.lax.top_k(jnp.asarray(x), k)
        monkeypatch.setattr(vit_mod, "_TOPK_SORT_MAX_WIDTH", 8)
        got_v, got_i = vit_mod._topk(jnp.asarray(x), k)
        monkeypatch.undo()
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))


def test_viterbi_nbest_wide_topk_path_matches(rng, monkeypatch):
    """Full nbest through the wide-axis top-k fallback == the lax.top_k
    path (threshold forced down so the fallback runs at toy scale)."""
    from torch_asg_tpu.ops import viterbi as vit_mod

    T, B, N, k = 8, 2, 9, 3
    inputs = jnp.asarray(rng.normal(size=(T, B, N)))
    trans = jnp.asarray(rng.normal(size=(N, N)) * 0.5)
    li = jnp.asarray([8, 5], jnp.int32)
    ref = viterbi_nbest(trans, inputs, k, li)
    monkeypatch.setattr(vit_mod, "_TOPK_SORT_MAX_WIDTH", 4)
    got = viterbi_nbest(trans, inputs, k, li)
    np.testing.assert_allclose(got.scores, ref.scores)
    np.testing.assert_array_equal(np.asarray(got.paths), np.asarray(ref.paths))


def test_viterbi_decode_chunked_matches(rng, monkeypatch):
    """The large-vocabulary chunked max-plus path is exact vs the dense
    step (forced via the threshold; chunk > N exercises row padding)."""
    from torch_asg_tpu.ops import viterbi as vit_mod

    T, B, N = 12, 3, 9
    inputs = jnp.asarray(rng.normal(size=(T, B, N)))
    trans = jnp.asarray(rng.normal(size=(N, N)) * 0.5)
    li = jnp.asarray([12, 8, 10], jnp.int32)
    ref = viterbi_decode(trans, inputs, li)
    monkeypatch.setattr(vit_mod, "_CHUNK_MIN_LABELS", 4)
    monkeypatch.setattr(vit_mod, "_CHUNK_SIZE", 4)
    got = viterbi_decode(trans, inputs, li)
    np.testing.assert_allclose(got.scores, ref.scores)
    np.testing.assert_array_equal(np.asarray(got.paths), np.asarray(ref.paths))


def test_alignment_segments(rng):
    """Timestamps from the forced alignment: spans partition each
    utterance, abut consecutively, and agree with a brute-force pass over
    the positions array."""
    from torch_asg_tpu import alignment_segments

    T, B, N, S = 14, 3, 6, 4
    inputs = jnp.asarray(rng.normal(size=(T, B, N)))
    trans = jnp.asarray(rng.normal(size=(N, N)) * 0.5)
    targets = jnp.asarray(rng.integers(0, N, size=(B, S)), jnp.int32)
    li = jnp.asarray([14, 9, 5], jnp.int32)
    lo = jnp.asarray([4, 3, 2], jnp.int32)
    ali = viterbi_align(trans, inputs, targets, li, lo)
    seg = jax.jit(lambda a: alignment_segments(a, S))(ali)
    starts, ends = np.asarray(seg.starts), np.asarray(seg.ends)
    pos = np.asarray(ali.positions)
    for b in range(B):
        L, K = int(li[b]), int(lo[b])
        for s in range(S):
            frames = np.nonzero(pos[:, b] == s)[0]
            if s < K:
                assert starts[b, s] == frames.min()
                assert ends[b, s] == frames.max()
            else:
                assert starts[b, s] == -1 and ends[b, s] == -1
        # partition: slot 0 starts at 0, spans abut, last ends at L-1
        assert starts[b, 0] == 0
        for s in range(1, K):
            assert starts[b, s] == ends[b, s - 1] + 1
        assert ends[b, K - 1] == L - 1


def test_viterbi_pallas_kernel_matches_xla(rng):
    """The rotation-trick Pallas decoder is bit-identical to the XLA
    decoder — scores, paths, AND raw backpointers (the shared backtrace
    makes paths follow from backpointers, so pin the forward outputs
    directly too), on ragged lengths."""
    from torch_asg_tpu.ops.pallas.viterbi_kernels import (
        viterbi_forward_pallas,
    )

    t_total, num_batches, num_labels = 17, 5, 7
    inputs = jnp.asarray(
        rng.normal(size=(t_total, num_batches, num_labels)), jnp.float64
    )
    trans = jnp.asarray(
        rng.normal(size=(num_labels, num_labels)) * 0.5, jnp.float64
    )
    li = jnp.asarray([17, 12, 1, 9, 17], jnp.int32)

    want = viterbi_decode(trans, inputs, li, impl="xla")
    got = viterbi_decode(trans, inputs, li, impl="pallas")
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-12)
    np.testing.assert_array_equal(got.paths, want.paths)

    # forward outputs directly: end rows and the full backpointer tensor
    from torch_asg_tpu.ops.viterbi import _maxplus_argmax
    from torch_asg_tpu.utils.lengths import mask_emissions

    d_end, bp = viterbi_forward_pallas(trans, inputs, li)
    inputs_m = mask_emissions(inputs, li)
    d = inputs_m[0]
    d_end_ref = d
    for t in range(1, t_total):
        best, bp_ref = _maxplus_argmax(trans, d)
        d = inputs_m[t] + best
        d_end_ref = jnp.where((li - 1 == t)[:, None], d, d_end_ref)
        np.testing.assert_array_equal(np.asarray(bp[t]), np.asarray(bp_ref))
    np.testing.assert_allclose(
        np.asarray(d_end), np.asarray(d_end_ref), rtol=1e-12
    )


def test_viterbi_pallas_exact_tie_breaking(rng):
    """Exact ties resolve to the lowest source label in BOTH decoders
    (zero transitions + duplicated emissions manufacture ties)."""
    t_total, num_batches, num_labels = 9, 3, 5
    base = rng.normal(size=(t_total, num_batches, 1))
    inputs = jnp.asarray(
        np.tile(base, (1, 1, num_labels)), jnp.float64
    )  # every label ties at every frame
    trans = jnp.zeros((num_labels, num_labels), jnp.float64)
    want = viterbi_decode(trans, inputs, impl="xla")
    got = viterbi_decode(trans, inputs, impl="pallas")
    np.testing.assert_array_equal(got.paths, want.paths)
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-12)


def test_align_pallas_kernel_matches_xla(rng):
    """The two-edge alignment kernel pair is bit-identical to the XLA
    forced aligner — scores, positions, labels, AND the raw advance-bit
    stream / end row — on ragged lengths incl. a one-frame element."""
    from torch_asg_tpu.ops.fac import make_aligned
    from torch_asg_tpu.ops.pallas.viterbi_kernels import (
        align_forward_pallas,
    )

    t_total, num_batches, num_labels, s_total = 19, 5, 6, 4
    inputs = jnp.asarray(
        rng.normal(size=(t_total, num_batches, num_labels)), jnp.float64
    )
    trans = jnp.asarray(
        rng.normal(size=(num_labels, num_labels)) * 0.5, jnp.float64
    )
    targets = jnp.asarray(
        rng.integers(0, num_labels, size=(num_batches, s_total)), jnp.int32
    )
    li = jnp.asarray([19, 12, 1, 9, 19], jnp.int32)
    lo = jnp.asarray([4, 3, 1, 2, 4], jnp.int32)

    want = viterbi_align(trans, inputs, targets, li, lo, impl="xla")
    got = viterbi_align(trans, inputs, targets, li, lo, impl="pallas")
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-12)
    np.testing.assert_array_equal(got.positions, want.positions)
    np.testing.assert_array_equal(got.labels, want.labels)

    # forward outputs directly: advance bits + end row vs a python oracle
    from torch_asg_tpu.ops.fac import _shift_right_s

    lat = make_aligned(trans, inputs, targets, li, lo)
    d_end, adv = align_forward_pallas(lat, li)
    d = jnp.full((num_batches, s_total), -jnp.inf, lat.inputs.dtype)
    d = d.at[:, 0].set(lat.inputs[0, :, 0])
    d_end_ref = d
    for t in range(1, t_total):
        stay = d + lat.self_trans
        move = _shift_right_s(d + lat.next_trans)
        d = lat.inputs[t] + jnp.maximum(stay, move)
        np.testing.assert_array_equal(
            np.asarray(adv[t]), np.asarray(move > stay).astype(np.int32)
        )
        d_end_ref = jnp.where((li - 1 == t)[:, None], d, d_end_ref)
    np.testing.assert_allclose(
        np.asarray(d_end), np.asarray(d_end_ref), rtol=1e-12
    )


def test_align_pallas_tie_breaking(rng):
    """Exact stay/advance ties resolve to STAY in both impls (zero
    transitions + tiled emissions manufacture per-step ties)."""
    t_total, num_batches, num_labels, s_total = 11, 3, 4, 3
    base = rng.normal(size=(t_total, num_batches, 1))
    inputs = jnp.asarray(np.tile(base, (1, 1, num_labels)), jnp.float64)
    trans = jnp.zeros((num_labels, num_labels), jnp.float64)
    targets = jnp.asarray(
        rng.integers(0, num_labels, size=(num_batches, s_total)), jnp.int32
    )
    want = viterbi_align(trans, inputs, targets, impl="xla")
    got = viterbi_align(trans, inputs, targets, impl="pallas")
    np.testing.assert_array_equal(got.positions, want.positions)
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-12)


def test_align_pallas_width_budget_raises():
    from torch_asg_tpu.ops.viterbi import ALIGN_KERNEL_MAX_WIDTH

    s = ALIGN_KERNEL_MAX_WIDTH + 1
    inputs = jnp.zeros((4, 2, 8))
    trans = jnp.zeros((8, 8))
    targets = jnp.zeros((2, s), jnp.int32)
    with pytest.raises(ValueError, match="pallas"):
        viterbi_align(trans, inputs, targets, impl="pallas")


def test_viterbi_pallas_width_budget_raises(rng):
    from torch_asg_tpu.ops.pallas.viterbi_kernels import (
        VITERBI_KERNEL_MAX_LABELS,
    )

    n = VITERBI_KERNEL_MAX_LABELS + 1
    inputs = jnp.zeros((4, 2, n))
    trans = jnp.zeros((n, n))
    with pytest.raises(ValueError, match="pallas"):
        viterbi_decode(trans, inputs, impl="pallas")


# ---------------------------------------------------------------------------
# beam_decode (beam-pruned approximate decode)
# ---------------------------------------------------------------------------


def test_beam_decode_full_beam_is_exact(rng):
    """beam_size >= N covers every label, so scores equal the exact
    decoder's, and (generic inputs: ties have measure zero) so do the
    paths, ragged lengths included."""
    from torch_asg_tpu import beam_decode

    T, B, N = 9, 3, 6
    inputs = jnp.asarray(rng.normal(size=(T, B, N)))
    trans = jnp.asarray(rng.normal(size=(N, N)))
    lengths = jnp.asarray([9, 5, 1], jnp.int32)
    want = viterbi_decode(trans, inputs, lengths, impl="xla")
    got = beam_decode(trans, inputs, lengths, beam_size=N)
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-12)
    np.testing.assert_array_equal(got.paths, want.paths)
    # beam_size past N is clamped, not an error
    got_big = beam_decode(trans, inputs, lengths, beam_size=4 * N)
    np.testing.assert_array_equal(got_big.paths, want.paths)


def test_beam_decode_scores_monotone_in_beam(rng):
    """Pruned scores lower-bound the exact Viterbi score and are
    non-decreasing in beam_size (beam sets dominate pointwise)."""
    from torch_asg_tpu import beam_decode

    T, B, N = 12, 4, 10
    inputs = jnp.asarray(rng.normal(size=(T, B, N)))
    trans = jnp.asarray(rng.normal(size=(N, N)))
    exact = viterbi_decode(trans, inputs, impl="xla").scores
    prev = None
    for k in (1, 2, 4, 10):
        s = np.asarray(beam_decode(trans, inputs, beam_size=k).scores)
        assert (s <= np.asarray(exact) + 1e-9).all()
        if prev is not None:
            assert (s >= prev - 1e-9).all()
        prev = s
    np.testing.assert_allclose(prev, exact, rtol=1e-12)


def test_beam_decode_path_score_consistent(rng):
    """The emitted path re-scored against the lattice equals the
    reported beam score (the path is a real path, not an artifact)."""
    from torch_asg_tpu import beam_decode

    T, B, N = 8, 3, 7
    r_in = rng.normal(size=(T, B, N))
    r_tr = rng.normal(size=(N, N))
    inputs = jnp.asarray(r_in)
    trans = jnp.asarray(r_tr)
    lengths = np.array([8, 6, 2])
    res = beam_decode(trans, inputs, jnp.asarray(lengths), beam_size=3)
    paths = np.asarray(res.paths)
    for b in range(B):
        L = lengths[b]
        p = paths[:L, b]
        score = r_in[0, b, p[0]] + sum(
            r_tr[p[t], p[t - 1]] + r_in[t, b, p[t]] for t in range(1, L)
        )
        np.testing.assert_allclose(score, float(res.scores[b]), rtol=1e-9)
        assert (paths[L:, b] == -1).all()


def test_beam_decode_peaked_emissions_recover_exact(rng):
    """With strongly peaked emissions a narrow beam finds the exact
    path (the serving regime beam pruning is designed for)."""
    from torch_asg_tpu import beam_decode

    T, B, N = 15, 2, 20
    peaks = rng.integers(0, N, size=(T, B))
    base = rng.normal(size=(T, B, N)) * 0.1
    base[np.arange(T)[:, None], np.arange(B)[None, :], peaks] += 8.0
    inputs = jnp.asarray(base)
    trans = jnp.asarray(rng.normal(size=(N, N)) * 0.1)
    want = viterbi_decode(trans, inputs, impl="xla")
    got = beam_decode(trans, inputs, beam_size=2)
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-12)
    np.testing.assert_array_equal(got.paths, want.paths)


def test_beam_decode_validates_beam_size():
    from torch_asg_tpu import beam_decode

    with pytest.raises(ValueError, match="beam_size"):
        beam_decode(jnp.zeros((4, 4)), jnp.zeros((3, 2, 4)), beam_size=0)


def test_beam_decode_wide_vocab_topk_fallback(rng, monkeypatch):
    """beam_decode composed with the wide-axis top-k fallback (the
    N=10k serving regime) matches the sort-based path exactly."""
    import torch_asg_tpu.ops.viterbi as vit
    from torch_asg_tpu import beam_decode

    T, B, N = 4, 2, 64
    inputs = jnp.asarray(rng.normal(size=(T, B, N)))
    trans = jnp.asarray(rng.normal(size=(N, N)) * 0.2)
    want = beam_decode(trans, inputs, beam_size=3)
    monkeypatch.setattr(vit, "_TOPK_SORT_MAX_WIDTH", 8)
    got = beam_decode(trans, inputs, beam_size=3)
    np.testing.assert_array_equal(got.paths, want.paths)
    np.testing.assert_allclose(got.scores, want.scores, rtol=0)


def test_beam_decode_neg_inf_transitions(rng):
    """Forbidden (-inf) transitions flow through the pruned recursion
    like the exact one: full beam still matches viterbi_decode, and
    narrow beams stay finite whenever a legal path exists."""
    from torch_asg_tpu import beam_decode

    T, B, N = 10, 3, 8
    inputs = jnp.asarray(rng.normal(size=(T, B, N)))
    tr = rng.normal(size=(N, N))
    tr[rng.random(size=(N, N)) < 0.4] = -np.inf
    np.fill_diagonal(tr, 0.0)  # self-loops keep every label reachable
    trans = jnp.asarray(tr)
    want = viterbi_decode(trans, inputs, impl="xla")
    got = beam_decode(trans, inputs, beam_size=N)
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-12)
    np.testing.assert_array_equal(got.paths, want.paths)
    narrow = beam_decode(trans, inputs, beam_size=2)
    assert np.isfinite(np.asarray(narrow.scores)).all()
    assert not np.isnan(np.asarray(narrow.scores)).any()


# ---------------------------------------------------------------------------
# beam_nbest: n best final-label hypotheses from one beam pass
# ---------------------------------------------------------------------------


def _brute_force_final_label_nbest(transition, inputs, L, n):
    """Best path ending in each final label, top-n by score — the exact
    contract of beam_nbest at beam_size >= N."""
    T, N = inputs.shape
    best = {}
    for path in itertools.product(range(N), repeat=L):
        s = inputs[0, path[0]]
        for t in range(1, L):
            s += transition[path[t], path[t - 1]] + inputs[t, path[t]]
        fin = path[-1]
        if fin not in best or s > best[fin][0]:
            best[fin] = (s, list(path))
    ranked = sorted(best.values(), key=lambda sp: -sp[0])[:n]
    return [s for s, _ in ranked], [p for _, p in ranked]


def test_beam_nbest_rank0_is_beam_decode(rng):
    from torch_asg_tpu import beam_decode, beam_nbest

    T, B, N = 8, 3, 7
    inputs = jnp.asarray(rng.normal(size=(T, B, N)))
    trans = jnp.asarray(rng.normal(size=(N, N)))
    lengths = jnp.asarray([8, 5, 2], jnp.int32)
    for k in (2, 4, 7):
        nb = beam_nbest(trans, inputs, 2, lengths, beam_size=k)
        bd = beam_decode(trans, inputs, lengths, beam_size=k)
        np.testing.assert_allclose(nb.scores[:, 0], bd.scores, rtol=1e-12)
        np.testing.assert_array_equal(nb.paths[:, :, 0], bd.paths)
        # descending ranks
        assert (np.diff(np.asarray(nb.scores), axis=1) <= 1e-12).all()


def test_beam_nbest_full_beam_brute_force(rng):
    """beam_size >= N: exactly the best path per final label, top-n."""
    from torch_asg_tpu import beam_nbest

    T, N, n = 5, 4, 3
    r_in = rng.normal(size=(T, 2, N))
    r_tr = rng.normal(size=(N, N))
    lengths = np.asarray([5, 3])
    res = beam_nbest(jnp.asarray(r_tr), jnp.asarray(r_in), n,
                     jnp.asarray(lengths, jnp.int32), beam_size=N)
    for b in range(2):
        L = int(lengths[b])
        want_s, want_p = _brute_force_final_label_nbest(
            r_tr, r_in[:, b], L, n)
        np.testing.assert_allclose(np.asarray(res.scores[b]), want_s,
                                   rtol=1e-9)
        for r_ in range(n):
            got = np.asarray(res.paths[:, b, r_])
            assert got[:L].tolist() == want_p[r_], (b, r_)
            assert (got[L:] == -1).all()


def test_beam_nbest_paths_rescore_to_scores(rng):
    """Every rank's path re-scored on the lattice equals its reported
    score — each hypothesis is a real path."""
    from torch_asg_tpu import beam_nbest

    T, B, N, n = 9, 3, 8, 4
    r_in = rng.normal(size=(T, B, N))
    r_tr = rng.normal(size=(N, N))
    lengths = np.asarray([9, 6, 1])
    res = beam_nbest(jnp.asarray(r_tr), jnp.asarray(r_in), n,
                     jnp.asarray(lengths, jnp.int32), beam_size=4)
    paths = np.asarray(res.paths)
    for b in range(B):
        L = int(lengths[b])
        for r_ in range(n):
            p = paths[:L, b, r_]
            s = r_in[0, b, p[0]] + sum(
                r_tr[p[t], p[t - 1]] + r_in[t, b, p[t]]
                for t in range(1, L))
            np.testing.assert_allclose(s, float(res.scores[b, r_]),
                                       rtol=1e-9)
    # distinct final labels per batch element at each element's last frame
    for b in range(B):
        L = int(lengths[b])
        finals = paths[L - 1, b, :]
        assert len(set(finals.tolist())) == n, finals


def test_beam_nbest_validation(rng):
    import pytest

    from torch_asg_tpu import beam_nbest

    inputs = jnp.asarray(rng.normal(size=(4, 2, 5)))
    trans = jnp.asarray(rng.normal(size=(5, 5)))
    with pytest.raises(ValueError, match="beam_size"):
        beam_nbest(trans, inputs, 5, beam_size=4)
    with pytest.raises(ValueError, match="num_labels"):
        beam_nbest(trans, inputs, 6, beam_size=8)
    with pytest.raises(ValueError, match="n must be"):
        beam_nbest(trans, inputs, 0)
