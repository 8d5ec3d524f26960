"""Streaming (chunked/online) scoring vs one-shot oracles.

The streaming API must reproduce the one-shot ``fcc_score``/``fac_score``
exactly on the concatenation of the chunks fed so far — including ragged
chunk boundaries where batch elements advance at different rates.  The
reference has no streaming mode (its recursions consume the whole
(T, B, N) tensor, ``fully_connected_lattice.cpp`` /
``force_aligned_lattice.cpp``); this pins the online counterpart.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_asg_tpu.ops.fac import fac_score
from torch_asg_tpu.ops.fcc import fcc_score
from torch_asg_tpu.ops.streaming import (
    streaming_init,
    streaming_scores,
    streaming_targets,
    streaming_update,
    streaming_viterbi_backtrace,
    streaming_viterbi_init,
    streaming_viterbi_update,
)
from torch_asg_tpu.ops.streaming import (
    streaming_align_backtrace,
    streaming_align_init,
    streaming_align_update,
    streaming_nbest_backtrace,
    streaming_nbest_init,
    streaming_nbest_update,
    streaming_wfsa_init,
    streaming_wfsa_scores,
    streaming_wfsa_update,
)
from torch_asg_tpu.ops.viterbi import viterbi_align, viterbi_decode, viterbi_nbest
from torch_asg_tpu.ops.wfsa import chain_wfsa, full_wfsa, wfsa_score

B, N, S = 3, 6, 4


def _problem(rng, t_total=15):
    transition = jnp.asarray(rng.normal(size=(N, N)), jnp.float64)
    inputs = jnp.asarray(rng.normal(size=(t_total, B, N)), jnp.float64)
    targets = jnp.asarray(rng.integers(0, N, size=(B, S)), jnp.int32)
    target_lengths = jnp.asarray([S, S - 1, S - 2], jnp.int32)
    return transition, inputs, targets, target_lengths


@pytest.mark.parametrize("splits", [[15], [5, 5, 5], [1] * 15, [7, 8], [2, 13]])
def test_streaming_matches_oneshot(rng, splits):
    t_total = 15
    transition, inputs, targets, target_lengths = _problem(rng, t_total)
    input_lengths = jnp.full((B,), t_total, jnp.int32)

    st = streaming_init(B, N, S, dtype=jnp.float64)
    off = 0
    for t_c in splits:
        st = streaming_update(
            transition, st, inputs[off : off + t_c], targets,
            target_lengths=target_lengths,
        )
        off += t_c
    full, aligned = streaming_scores(st, target_lengths)

    want_full = fcc_score(transition, inputs, input_lengths)
    want_aligned = fac_score(
        transition, inputs, targets, input_lengths, target_lengths
    )
    np.testing.assert_allclose(full, want_full, rtol=1e-12)
    np.testing.assert_allclose(aligned, want_aligned, rtol=1e-12)
    np.testing.assert_array_equal(st.frames_seen, input_lengths)


def test_streaming_prefix_scores(rng):
    """After every chunk, the readout equals the one-shot score on the
    prefix consumed so far."""
    t_total = 12
    transition, inputs, targets, target_lengths = _problem(rng, t_total)

    st = streaming_init(B, N, S, dtype=jnp.float64)
    off = 0
    for t_c in [3, 4, 5]:
        st = streaming_update(
            transition, st, inputs[off : off + t_c], targets,
            target_lengths=target_lengths,
        )
        off += t_c
        pref = jnp.full((B,), off, jnp.int32)
        full, aligned = streaming_scores(st, target_lengths)
        want_full = fcc_score(transition, inputs[:off], pref)
        want_aligned = fac_score(
            transition, inputs[:off], targets, pref, target_lengths
        )
        np.testing.assert_allclose(full, want_full, rtol=1e-12)
        np.testing.assert_allclose(aligned, want_aligned, rtol=1e-12)


def test_streaming_ragged_chunks(rng):
    """Batch elements advancing at different rates across calls: the final
    state depends only on each element's own consumed prefix."""
    t_total = 10
    transition, inputs, targets, target_lengths = _problem(rng, t_total)
    # element 0 consumes 10 frames, element 1 consumes 7, element 2 consumes 4
    final_lengths = jnp.asarray([10, 7, 4], jnp.int32)

    st = streaming_init(B, N, S, dtype=jnp.float64)
    consumed = np.zeros(B, np.int64)
    for t_c in [4, 3, 3]:
        chunk_lengths = jnp.minimum(
            jnp.asarray(final_lengths) - consumed, t_c
        ).astype(jnp.int32)
        chunk_lengths = jnp.maximum(chunk_lengths, 0)
        # each element reads its own next frames: build the chunk per element
        chunk = np.full((t_c, B, N), 0.0)
        for b in range(B):
            for t in range(int(chunk_lengths[b])):
                chunk[t, b] = np.asarray(inputs[consumed[b] + t, b])
        st = streaming_update(
            transition, st, jnp.asarray(chunk, jnp.float64), targets,
            chunk_lengths=chunk_lengths, target_lengths=target_lengths,
        )
        consumed += np.asarray(chunk_lengths)

    full, aligned = streaming_scores(st, target_lengths)
    want_full = fcc_score(transition, inputs, final_lengths)
    want_aligned = fac_score(
        transition, inputs, targets, final_lengths, target_lengths
    )
    np.testing.assert_allclose(full, want_full, rtol=1e-12)
    np.testing.assert_allclose(aligned, want_aligned, rtol=1e-12)
    np.testing.assert_array_equal(st.frames_seen, final_lengths)


def test_streaming_precomputed_targets_match(rng):
    """The stream_targets fast path (chunk-invariant gathers hoisted out
    of the update) is bit-identical to the per-chunk make_aligned path."""
    t_total = 12
    transition, inputs, targets, target_lengths = _problem(rng, t_total)
    pre = streaming_targets(
        transition, targets, N, target_lengths, dtype=jnp.float64
    )
    st_a = streaming_init(B, N, S, dtype=jnp.float64)
    st_b = streaming_init(B, N, S, dtype=jnp.float64)
    for off in range(0, t_total, 4):
        chunk = inputs[off : off + 4]
        cl = jnp.asarray([4, 3, 2], jnp.int32)  # ragged tails too
        st_a = streaming_update(
            transition, st_a, chunk, targets,
            chunk_lengths=cl, target_lengths=target_lengths,
        )
        st_b = streaming_update(
            transition, st_b, chunk, chunk_lengths=cl, stream_targets=pre
        )
    np.testing.assert_array_equal(
        np.asarray(st_a.alpha_full), np.asarray(st_b.alpha_full)
    )
    np.testing.assert_array_equal(
        np.asarray(st_a.alpha_aligned), np.asarray(st_b.alpha_aligned)
    )
    np.testing.assert_array_equal(st_a.frames_seen, st_b.frames_seen)
    with pytest.raises(ValueError, match="targets"):
        streaming_update(transition, st_a, inputs[:2])


def test_streaming_conflicting_target_args_raise(rng):
    transition, inputs, targets, target_lengths = _problem(rng, 6)
    pre = streaming_targets(transition, targets, N, target_lengths,
                            dtype=jnp.float64)
    st = streaming_init(B, N, S, dtype=jnp.float64)
    with pytest.raises(ValueError, match="not both"):
        streaming_update(
            transition, st, inputs[:3], targets, stream_targets=pre
        )
    with pytest.raises(ValueError, match="not both"):
        streaming_update(
            transition, st, inputs[:3],
            target_lengths=target_lengths, stream_targets=pre,
        )


def test_streaming_bf16_chunks_upcast_to_oneshot_parity(rng):
    """bf16 emission chunks are upcast at the boundary (like the one-shot
    scorers/decoder): long streams must not accumulate in half precision,
    and the scan carry dtype stays pinned by the state."""
    t_total = 10
    transition, inputs, targets, target_lengths = _problem(rng, t_total)
    transition32 = transition.astype(jnp.float32)
    bf = inputs.astype(jnp.bfloat16)

    st = streaming_init(B, N, S, dtype=jnp.bfloat16)  # upcast inside init
    assert st.alpha_full.dtype == jnp.float32
    vst = streaming_viterbi_init(B, N, dtype=jnp.bfloat16)
    assert vst.delta.dtype == jnp.float32
    bps, vals = [], []
    for off in range(0, t_total, 5):
        st = streaming_update(
            transition32, st, bf[off : off + 5], targets,
            target_lengths=target_lengths,
        )
        vst, (bp, v) = streaming_viterbi_update(
            transition32, vst, bf[off : off + 5]
        )
        bps.append(bp)
        vals.append(v)
    full, _ = streaming_scores(st, target_lengths)
    f32 = bf.astype(jnp.float32)
    want = fcc_score(transition32, f32, jnp.full((B,), t_total, jnp.int32))
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(want), rtol=1e-5
    )
    got = streaming_viterbi_backtrace(
        vst, jnp.concatenate(bps), jnp.concatenate(vals)
    )
    want_v = viterbi_decode(transition32, f32)
    np.testing.assert_array_equal(
        np.asarray(got.paths), np.asarray(want_v.paths)
    )


def test_streaming_aligned_inf_until_coverable(rng):
    """The aligned score is -inf while the consumed prefix is shorter than
    the target (no monotone alignment exists yet)."""
    transition, inputs, targets, target_lengths = _problem(rng, 8)
    st = streaming_init(B, N, S, dtype=jnp.float64)
    st = streaming_update(
        transition, st, inputs[:2], targets, target_lengths=target_lengths
    )
    full, aligned = streaming_scores(st, target_lengths)
    # lengths are [4, 3, 2]: after 2 frames only element 2 (L_out=2) is coverable
    assert np.isneginf(np.asarray(aligned)[0])
    assert np.isneginf(np.asarray(aligned)[1])
    assert np.isfinite(np.asarray(aligned)[2])
    assert np.all(np.isfinite(np.asarray(full)))


@pytest.mark.parametrize("splits", [[12], [4, 4, 4], [1] * 12, [5, 7]])
def test_streaming_viterbi_matches_oneshot(rng, splits):
    t_total = 12
    transition, inputs, _, _ = _problem(rng, t_total)
    input_lengths = jnp.full((B,), t_total, jnp.int32)

    st = streaming_viterbi_init(B, N, dtype=jnp.float64)
    bps, vals = [], []
    off = 0
    for t_c in splits:
        st, (bp, v) = streaming_viterbi_update(
            transition, st, inputs[off : off + t_c]
        )
        bps.append(bp)
        vals.append(v)
        off += t_c
    got = streaming_viterbi_backtrace(
        st, jnp.concatenate(bps), jnp.concatenate(vals)
    )
    want = viterbi_decode(transition, inputs, input_lengths)
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-12)
    np.testing.assert_array_equal(got.paths, want.paths)


def test_streaming_viterbi_ragged(rng):
    """Elements advancing at different rates decode their own prefixes."""
    t_total = 9
    transition, inputs, _, _ = _problem(rng, t_total)
    final_lengths = np.asarray([9, 6, 3])

    st = streaming_viterbi_init(B, N, dtype=jnp.float64)
    bps, vals = [], []
    consumed = np.zeros(B, np.int64)
    for t_c in [4, 3, 2]:
        chunk_lengths = np.minimum(final_lengths - consumed, t_c).clip(0)
        chunk = np.zeros((t_c, B, N))
        for b in range(B):
            for t in range(int(chunk_lengths[b])):
                chunk[t, b] = np.asarray(inputs[consumed[b] + t, b])
        st, (bp, v) = streaming_viterbi_update(
            transition, st, jnp.asarray(chunk, jnp.float64),
            chunk_lengths=jnp.asarray(chunk_lengths, jnp.int32),
        )
        bps.append(bp)
        vals.append(v)
        consumed += chunk_lengths
    got = streaming_viterbi_backtrace(
        st, jnp.concatenate(bps), jnp.concatenate(vals)
    )
    want = viterbi_decode(
        transition, inputs, jnp.asarray(final_lengths, jnp.int32)
    )
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-12)
    # each element's emitted labels (in stream order, skipping -1 frames)
    # equal the one-shot path over its own prefix
    got_paths = np.asarray(got.paths)
    want_paths = np.asarray(want.paths)
    for b in range(B):
        mine = got_paths[:, b][got_paths[:, b] >= 0]
        ref = want_paths[:, b][want_paths[:, b] >= 0]
        np.testing.assert_array_equal(mine, ref)


def test_streaming_viterbi_partial_and_empty(rng):
    """Backtrace mid-stream gives the prefix decode; an element with no
    frames yet scores -inf with an all -1 path."""
    t_total = 8
    transition, inputs, _, _ = _problem(rng, t_total)
    st = streaming_viterbi_init(B, N, dtype=jnp.float64)
    # element 2 consumes nothing
    chunk_lengths = jnp.asarray([5, 3, 0], jnp.int32)
    st, (bp, v) = streaming_viterbi_update(
        transition, st, inputs[:5], chunk_lengths=chunk_lengths
    )
    got = streaming_viterbi_backtrace(st, bp, v)
    want = viterbi_decode(transition, inputs[:5], chunk_lengths)
    gp, wp = np.asarray(got.paths), np.asarray(want.paths)
    for b in range(2):
        np.testing.assert_allclose(got.scores[b], want.scores[b], rtol=1e-12)
        np.testing.assert_array_equal(gp[:, b][gp[:, b] >= 0],
                                      wp[:, b][wp[:, b] >= 0])
    assert np.isneginf(np.asarray(got.scores)[2])
    assert np.all(gp[:, 2] == -1)


@pytest.mark.parametrize("splits", [[12], [5, 4, 3], [1] * 12])
def test_streaming_nbest_matches_oneshot(rng, splits):
    """Streaming n-best == one-shot viterbi_nbest on the consumed prefix,
    ragged rates included (shared _maxplus_topk -> identical ties)."""
    t_total, k = 12, 3
    transition, inputs, _, _ = _problem(rng, t_total)
    lengths = jnp.asarray([12, 8, 5], jnp.int32)

    st = streaming_nbest_init(B, N, k, dtype=jnp.float64)
    bps, vals = [], []
    off = 0
    for t_c in splits:
        cl = jnp.clip(lengths - off, 0, t_c).astype(jnp.int32)
        st, (bp, v) = streaming_nbest_update(
            transition, st, inputs[off : off + t_c], chunk_lengths=cl
        )
        bps.append(bp)
        vals.append(v)
        off += t_c
    got = streaming_nbest_backtrace(
        st, jnp.concatenate(bps), jnp.concatenate(vals)
    )
    want = viterbi_nbest(transition, inputs, k, lengths)
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-12)
    gp, wp = np.asarray(got.paths), np.asarray(want.paths)
    for b in range(B):
        for r in range(k):
            np.testing.assert_array_equal(
                gp[:, b, r][gp[:, b, r] >= 0], wp[:, b, r][wp[:, b, r] >= 0]
            )


@pytest.mark.parametrize("splits", [[12], [4, 4, 4], [1] * 12, [5, 7]])
def test_streaming_align_matches_oneshot(rng, splits):
    """Streaming forced alignment == one-shot viterbi_align on the
    consumed prefix: scores, positions, AND labels (shared stay/advance
    tie convention), ragged rates included."""
    t_total = 12
    transition, inputs, targets, target_lengths = _problem(rng, t_total)
    lengths = jnp.asarray([12, 9, 6], jnp.int32)

    st = streaming_align_init(B, S, dtype=jnp.float64)
    advs, vals = [], []
    off = 0
    for t_c in splits:
        cl = jnp.clip(lengths - off, 0, t_c).astype(jnp.int32)
        st, (adv, v) = streaming_align_update(
            transition, st, inputs[off : off + t_c], targets,
            chunk_lengths=cl, target_lengths=target_lengths,
        )
        advs.append(adv)
        vals.append(v)
        off += t_c
    got = streaming_align_backtrace(
        st, jnp.concatenate(advs), jnp.concatenate(vals), targets,
        target_lengths=target_lengths,
    )
    want = viterbi_align(transition, inputs, targets, lengths, target_lengths)
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-12)
    np.testing.assert_array_equal(got.positions, want.positions)
    np.testing.assert_array_equal(got.labels, want.labels)


def test_streaming_align_stream_targets_precompute(rng):
    """The stream_targets fast path is exact vs raw-targets updates, and
    the backtrace accepts either target source (clipped tgt view)."""
    t_total = 10
    transition, inputs, targets, target_lengths = _problem(rng, t_total)
    pre = streaming_targets(
        transition, targets, N, target_lengths, dtype=jnp.float64
    )

    st_a = streaming_align_init(B, S, dtype=jnp.float64)
    st_b = streaming_align_init(B, S, dtype=jnp.float64)
    advs, vals = [], []
    for off in (0, 5):
        chunk = inputs[off : off + 5]
        st_a, (adv_a, v_a) = streaming_align_update(
            transition, st_a, chunk, stream_targets=pre
        )
        st_b, (adv_b, v_b) = streaming_align_update(
            transition, st_b, chunk, targets,
            target_lengths=target_lengths,
        )
        np.testing.assert_array_equal(np.asarray(adv_a), np.asarray(adv_b))
        advs.append(adv_a)
        vals.append(v_a)
    np.testing.assert_allclose(
        np.asarray(st_a.delta), np.asarray(st_b.delta), rtol=1e-12
    )
    got = streaming_align_backtrace(
        st_a, jnp.concatenate(advs), jnp.concatenate(vals),
        stream_targets=pre, target_lengths=target_lengths,
    )
    want = viterbi_align(
        transition, inputs, targets,
        jnp.full((B,), t_total, jnp.int32), target_lengths,
    )
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-12)
    np.testing.assert_array_equal(got.positions, want.positions)
    np.testing.assert_array_equal(got.labels, want.labels)
    with pytest.raises(ValueError, match="not both"):
        streaming_align_update(
            transition, st_a, inputs[:2], targets, stream_targets=pre
        )


def test_streaming_align_partial_and_empty(rng):
    """Mid-stream backtrace aligns the prefix; an element with no frames
    yet scores -inf with an all -1 alignment."""
    t_total = 8
    transition, inputs, targets, target_lengths = _problem(rng, t_total)
    st = streaming_align_init(B, S, dtype=jnp.float64)
    chunk_lengths = jnp.asarray([5, 3, 0], jnp.int32)
    st, (adv, v) = streaming_align_update(
        transition, st, inputs[:5], targets, chunk_lengths=chunk_lengths,
        target_lengths=target_lengths,
    )
    got = streaming_align_backtrace(
        st, adv, v, targets, target_lengths=target_lengths
    )
    want = viterbi_align(
        transition, inputs[:5], targets, chunk_lengths, target_lengths
    )
    gp, wp = np.asarray(got.positions), np.asarray(want.positions)
    for b in range(2):
        np.testing.assert_allclose(got.scores[b], want.scores[b], rtol=1e-12)
        np.testing.assert_array_equal(gp[:, b], wp[:, b])
    assert np.isneginf(np.asarray(got.scores)[2])
    assert np.all(gp[:, 2] == -1)


@pytest.mark.parametrize("splits", [[10], [4, 3, 3], [1] * 10])
def test_streaming_wfsa_matches_oneshot(rng, splits):
    """Streaming the full (FCC-equivalent) automaton and a chain automaton
    matches one-shot wfsa_score on the consumed prefix, ragged included."""
    t_total = 10
    transition = jnp.asarray(rng.normal(size=(N, N)), jnp.float64)
    inputs = jnp.asarray(rng.normal(size=(t_total, B, N)), jnp.float64)
    lengths = jnp.asarray([10, 7, 4], jnp.int32)

    labels = jnp.asarray(rng.integers(0, N, size=(3,)), jnp.int32)
    chain = chain_wfsa(
        labels,
        jnp.asarray(rng.normal(size=(3,)), jnp.float64),
        jnp.asarray(rng.normal(size=(3,)), jnp.float64),
    )
    for fsa in (full_wfsa(transition), chain):
        st = streaming_wfsa_init(fsa, B, dtype=jnp.float64)
        off = 0
        for t_c in splits:
            cl = jnp.clip(lengths - off, 0, t_c).astype(jnp.int32)
            st = streaming_wfsa_update(
                fsa, st, inputs[off : off + t_c], chunk_lengths=cl
            )
            off += t_c
        got = streaming_wfsa_scores(fsa, st)
        want = wfsa_score(fsa, inputs, lengths)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12)
        np.testing.assert_array_equal(st.frames_seen, lengths)


def test_streaming_under_data_parallel_mesh(rng):
    """The streaming state is (B, ...)-leading, so it shards over a data
    mesh with shard_map like any batch: per-shard updates compose to the
    same result as the single-chip stream (online multi-stream serving)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from torch_asg_tpu.parallel import make_mesh

    t_total = 8
    n_dev = len(jax.devices())
    big_b = 2 * n_dev
    transition = jnp.asarray(rng.normal(size=(N, N)), jnp.float64)
    inputs = jnp.asarray(rng.normal(size=(t_total, big_b, N)), jnp.float64)
    targets = jnp.asarray(rng.integers(0, N, size=(big_b, S)), jnp.int32)
    target_lengths = jnp.full((big_b,), S, jnp.int32)

    mesh = make_mesh()
    upd = jax.shard_map(
        lambda tr, st, ch, tg, tl: streaming_update(
            tr, st, ch, tg, target_lengths=tl
        ),
        mesh=mesh,
        in_specs=(P(), P("data"), P(None, "data"), P("data"), P("data")),
        out_specs=P("data"),
        check_vma=False,
    )
    st = streaming_init(big_b, N, S, dtype=jnp.float64)
    st_ref = st
    for off in range(0, t_total, 4):
        st = upd(transition, st, inputs[off : off + 4], targets, target_lengths)
        st_ref = streaming_update(
            transition, st_ref, inputs[off : off + 4], targets,
            target_lengths=target_lengths,
        )
    np.testing.assert_allclose(
        np.asarray(st.alpha_full), np.asarray(st_ref.alpha_full), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(st.alpha_aligned), np.asarray(st_ref.alpha_aligned),
        rtol=1e-12,
    )


def test_streaming_update_jits(rng):
    transition, inputs, targets, target_lengths = _problem(rng, 9)
    upd = jax.jit(streaming_update)
    st = streaming_init(B, N, S, dtype=jnp.float64)
    for off in range(0, 9, 3):
        st = upd(
            transition, st, inputs[off : off + 3], targets,
            target_lengths=target_lengths,
        )
    full, _ = streaming_scores(st, target_lengths)
    want = fcc_score(transition, inputs, jnp.full((B,), 9, jnp.int32))
    np.testing.assert_allclose(full, want, rtol=1e-12)


def test_streaming_grads_finite_on_dead_band_rows(rng):
    """Differentiating the streaming prefix loss must stay NaN-free.

    Early in a stream most of the (B, S) aligned band is unreachable
    (-inf on both logaddexp branches); jnp.logaddexp's VJP emits NaN
    there, which is why streaming_update uses semiring.logaddexp.  The
    prefix loss full - aligned is an advertised differentiable surface
    (distillation / online fine-tuning), so pin grad finiteness through
    init -> update -> scores with dead rows present."""
    t_total = 6  # < S + margin: aligned band only partially consumed
    transition, inputs, targets, target_lengths = _problem(rng, t_total)

    def prefix_loss(transition, inputs):
        st = streaming_init(B, N, S, dtype=jnp.float64)
        st = streaming_update(
            transition, st, inputs[:3], targets,
            target_lengths=target_lengths,
        )
        st = streaming_update(
            transition, st, inputs[3:], targets,
            target_lengths=target_lengths,
        )
        full, aligned = streaming_scores(st, target_lengths)
        # aligned can be -inf for elements whose prefix cannot yet cover
        # the target; mask those to keep the *loss* finite while still
        # differentiating through every consumed lattice cell
        loss = jnp.where(jnp.isfinite(aligned), full - aligned, full)
        return loss.sum()

    val, (g_t, g_i) = jax.value_and_grad(prefix_loss, argnums=(0, 1))(
        transition, inputs
    )
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(g_t)))
    assert np.all(np.isfinite(np.asarray(g_i)))


def test_streaming_targets_promotes_precompute_dtype(rng):
    """A float64 transition with a forgotten dtype kwarg must not round
    the precomputed exp-transition to float32 (silent parity loss)."""
    transition, inputs, targets, target_lengths = _problem(rng, 8)
    pre = streaming_targets(transition, targets, N, target_lengths)
    assert pre.e_t.dtype == jnp.float64

    st = streaming_init(B, N, S, dtype=jnp.float64)
    for off in range(0, 8, 4):
        st = streaming_update(
            transition, st, inputs[off : off + 4], stream_targets=pre,
        )
    full, _ = streaming_scores(st, target_lengths)
    want = fcc_score(transition, inputs, jnp.full((B,), 8, jnp.int32))
    np.testing.assert_allclose(full, want, rtol=1e-12)


def test_streaming_update_rejects_downcasting_precompute(rng):
    """An explicitly float32 precompute feeding a float64 state raises
    instead of silently degrading the stream's parity."""
    transition, inputs, targets, target_lengths = _problem(rng, 4)
    pre = streaming_targets(
        transition.astype(jnp.float32), targets, N, target_lengths,
        dtype=jnp.float32,
    )
    st = streaming_init(B, N, S, dtype=jnp.float64)
    with pytest.raises(ValueError, match="precomputed at"):
        streaming_update(transition, st, inputs[:4], stream_targets=pre)


def test_streaming_align_rejects_downcasting_precompute(rng):
    """The forced-alignment path applies the same precompute-dtype guard
    as the scorer: a low-precision precompute feeding a higher-precision
    stream could silently flip near-tie stay/advance decisions."""
    transition, inputs, targets, target_lengths = _problem(rng, 4)
    pre = streaming_targets(
        transition.astype(jnp.float32), targets, N, target_lengths,
        dtype=jnp.float32,
    )
    st = streaming_align_init(B, S, dtype=jnp.float64)
    with pytest.raises(ValueError, match="precomputed at"):
        streaming_align_update(transition, st, inputs[:4],
                               stream_targets=pre)


def test_streaming_f64_precompute_feeds_f32_state(rng):
    """A float64 transition with default-dtype precompute (promoted to
    f64) feeding the default float32 state must run — the precompute is
    cast down to the authoritative state dtype, not promoted into the
    scan carry (regression: carry dtype mismatch TypeError) — and match
    the one-shot f32 path."""
    t_total = 8
    transition, inputs, targets, target_lengths = _problem(rng, t_total)
    pre = streaming_targets(transition, targets, N, target_lengths)
    assert pre.self_trans.dtype == jnp.float64

    st = streaming_init(B, N, S)  # f32 state
    sta = streaming_align_init(B, S)  # f32 align state
    advs, vals = [], []
    for off in range(0, t_total, 4):
        chunk = inputs[off : off + 4].astype(jnp.float32)
        st = streaming_update(transition, st, chunk, stream_targets=pre)
        sta, (adv, v) = streaming_align_update(
            transition, sta, chunk, stream_targets=pre
        )
        advs.append(adv)
        vals.append(v)
    assert st.alpha_full.dtype == jnp.float32
    assert sta.delta.dtype == jnp.float32

    tr32 = transition.astype(jnp.float32)
    in32 = inputs.astype(jnp.float32)
    li = jnp.full((B,), t_total, jnp.int32)
    full, aligned = streaming_scores(st, target_lengths)
    np.testing.assert_allclose(
        full, fcc_score(tr32, in32, li), rtol=2e-5
    )
    np.testing.assert_allclose(
        aligned, fac_score(tr32, in32, targets, li, target_lengths),
        rtol=2e-5,
    )
    got = streaming_align_backtrace(
        sta, jnp.concatenate(advs), jnp.concatenate(vals),
        stream_targets=pre,
    )
    want = viterbi_align(tr32, in32, targets, li, target_lengths)
    np.testing.assert_allclose(got.scores, want.scores, rtol=2e-5)
    np.testing.assert_array_equal(got.positions, want.positions)


def test_streaming_align_backtrace_derives_ragged_lengths(rng):
    """With a ragged-length precompute and NO explicit target_lengths,
    the backtrace must anchor at the baked-in final slot (from smask),
    not at S-1 (regression: silently wrong alignments)."""
    t_total = 10
    transition, inputs, targets, target_lengths = _problem(rng, t_total)
    assert int(target_lengths.min()) < S  # ragged by construction
    pre = streaming_targets(
        transition, targets, N, target_lengths, dtype=jnp.float64
    )
    st = streaming_align_init(B, S, dtype=jnp.float64)
    st, (adv, v) = streaming_align_update(
        transition, st, inputs, stream_targets=pre
    )
    got = streaming_align_backtrace(st, adv, v, stream_targets=pre)
    want = viterbi_align(
        transition, inputs, targets,
        jnp.full((B,), t_total, jnp.int32), target_lengths,
    )
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-12)
    np.testing.assert_array_equal(got.positions, want.positions)
    np.testing.assert_array_equal(got.labels, want.labels)


# ---------------------------------------------------------------------------
# Streaming beam-pruned decoding
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("splits", [[12], [4, 4, 4], [1] * 12, [7, 5]])
def test_streaming_beam_matches_oneshot(rng, splits):
    """Streaming beam decode == one-shot beam_decode on the consumed
    prefix — scores AND paths (shared _topk, identical candidate
    ordering, so tie-breaking matches), ragged rates included."""
    from torch_asg_tpu import beam_decode
    from torch_asg_tpu.ops.streaming import (
        streaming_beam_backtrace,
        streaming_beam_init,
        streaming_beam_update,
    )

    t_total, k = 12, 3
    transition, inputs, _, _ = _problem(rng, t_total)
    lengths = jnp.asarray([12, 8, 3], jnp.int32)

    st = streaming_beam_init(B, k, dtype=jnp.float64)
    labs, bps, vals = [], [], []
    off = 0
    for t_c in splits:
        cl = jnp.clip(lengths - off, 0, t_c).astype(jnp.int32)
        st, (lab, bp, v) = streaming_beam_update(
            transition, st, inputs[off : off + t_c], chunk_lengths=cl
        )
        labs.append(lab)
        bps.append(bp)
        vals.append(v)
        off += t_c
    got = streaming_beam_backtrace(
        st, jnp.concatenate(labs), jnp.concatenate(bps),
        jnp.concatenate(vals),
    )
    want = beam_decode(transition, inputs, lengths, beam_size=k)
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-12)
    np.testing.assert_array_equal(got.paths, want.paths)


def test_streaming_beam_partial_and_empty(rng):
    """Mid-stream backtrace equals the one-shot beam decode of the
    consumed prefix; an element with no frames yet is -inf / all -1."""
    from torch_asg_tpu import beam_decode
    from torch_asg_tpu.ops.streaming import (
        streaming_beam_backtrace,
        streaming_beam_init,
        streaming_beam_update,
    )

    t_total, k = 10, 2
    transition, inputs, _, _ = _problem(rng, t_total)
    cl = jnp.asarray([5, 3, 0], jnp.int32)
    st = streaming_beam_init(B, k, dtype=jnp.float64)
    st, (lab, bp, v) = streaming_beam_update(
        transition, st, inputs[:5], chunk_lengths=cl
    )
    got = streaming_beam_backtrace(st, lab, bp, v)
    for b in range(2):
        L = int(cl[b])
        w = beam_decode(
            transition, inputs[:L], jnp.asarray([L] * B, jnp.int32),
            beam_size=k,
        )
        np.testing.assert_allclose(got.scores[b], w.scores[b], rtol=1e-12)
        np.testing.assert_array_equal(
            np.asarray(got.paths)[:L, b], np.asarray(w.paths)[:L, b]
        )
    assert np.isneginf(np.asarray(got.scores)[2])
    assert (np.asarray(got.paths)[:, 2] == -1).all()

    with pytest.raises(ValueError, match="beam_size"):
        streaming_beam_init(B, 0)


def test_streaming_beam_wider_than_vocab(rng):
    """beam_size > N must not crash (documented: tail slots carry -inf
    and never win) and must match the one-shot decoder, which clamps."""
    from torch_asg_tpu import beam_decode
    from torch_asg_tpu.ops.streaming import (
        streaming_beam_backtrace,
        streaming_beam_init,
        streaming_beam_update,
    )

    t_total, k = 8, N + 3
    transition, inputs, _, _ = _problem(rng, t_total)
    st = streaming_beam_init(B, k, dtype=jnp.float64)
    labs, bps, vals = [], [], []
    for off in (0, 4):
        st, (lab, bp, v) = streaming_beam_update(
            transition, st, inputs[off : off + 4]
        )
        labs.append(lab)
        bps.append(bp)
        vals.append(v)
    assert np.isneginf(np.asarray(st.delta)[:, N:]).all()
    got = streaming_beam_backtrace(
        st, jnp.concatenate(labs), jnp.concatenate(bps),
        jnp.concatenate(vals),
    )
    want = beam_decode(
        transition, inputs, jnp.full((B,), t_total, jnp.int32), beam_size=k
    )
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-12)
    np.testing.assert_array_equal(got.paths, want.paths)


@pytest.mark.parametrize("splits", [[10], [4, 3, 3], [1] * 10])
def test_streaming_wfsa_viterbi_matches_oneshot(rng, splits):
    """Streaming WFSA best path == one-shot wfsa_viterbi on the consumed
    prefix (shared arc step + walker: identical lowest-arc-id ties),
    ragged rates included, for a full automaton and a lexicon graph."""
    from torch_asg_tpu.ops.streaming import (
        streaming_wfsa_viterbi_backtrace,
        streaming_wfsa_viterbi_init,
        streaming_wfsa_viterbi_update,
    )
    from torch_asg_tpu.ops.wfsa import lexicon_wfsa, wfsa_viterbi

    t_total = 10
    transition = jnp.asarray(rng.normal(size=(N, N)), jnp.float64)
    inputs = jnp.asarray(rng.normal(size=(t_total, B, N)), jnp.float64)
    lengths = jnp.asarray([10, 7, 4], jnp.int32)
    words = [
        jnp.asarray(rng.integers(0, N, size=(3,)), jnp.int32),
        jnp.asarray(rng.integers(0, N, size=(2,)), jnp.int32),
    ]
    for fsa in (full_wfsa(transition), lexicon_wfsa(transition, words)):
        st = streaming_wfsa_viterbi_init(fsa, B, dtype=jnp.float64)
        backs, vals = [], []
        off = 0
        for t_c in splits:
            cl = jnp.clip(lengths - off, 0, t_c).astype(jnp.int32)
            st, (bk, v) = streaming_wfsa_viterbi_update(
                fsa, st, inputs[off : off + t_c], chunk_lengths=cl
            )
            backs.append(bk)
            vals.append(v)
            off += t_c
        got = streaming_wfsa_viterbi_backtrace(
            fsa, st, jnp.concatenate(backs), jnp.concatenate(vals)
        )
        want = wfsa_viterbi(fsa, inputs, lengths)
        np.testing.assert_allclose(got.scores, want.scores, rtol=1e-12)
        np.testing.assert_array_equal(got.states, want.states)
        np.testing.assert_array_equal(got.labels, want.labels)


def test_streaming_wfsa_viterbi_partial_and_empty(rng):
    """Mid-stream backtrace equals the one-shot decode of the consumed
    prefix; a zero-frame element scores max(start+final), all -1 path."""
    from torch_asg_tpu.ops.streaming import (
        streaming_wfsa_viterbi_backtrace,
        streaming_wfsa_viterbi_init,
        streaming_wfsa_viterbi_update,
    )
    from torch_asg_tpu.ops.wfsa import wfsa_viterbi

    t_total = 8
    transition = jnp.asarray(rng.normal(size=(N, N)), jnp.float64)
    inputs = jnp.asarray(rng.normal(size=(t_total, B, N)), jnp.float64)
    fsa = full_wfsa(transition)
    cl = jnp.asarray([5, 3, 0], jnp.int32)
    st = streaming_wfsa_viterbi_init(fsa, B, dtype=jnp.float64)
    st, (bk, v) = streaming_wfsa_viterbi_update(
        fsa, st, inputs[:5], chunk_lengths=cl
    )
    got = streaming_wfsa_viterbi_backtrace(fsa, st, bk, v)
    for b in range(2):
        L = int(cl[b])
        want = wfsa_viterbi(fsa, inputs[:L], jnp.full((B,), L, jnp.int32))
        np.testing.assert_allclose(got.scores[b], want.scores[b], rtol=1e-12)
        np.testing.assert_array_equal(
            np.asarray(got.labels)[:L, b], np.asarray(want.labels)[:, b]
        )
    empty_score = float(
        jnp.max(fsa.start.astype(jnp.float64) + fsa.final.astype(jnp.float64))
    )
    np.testing.assert_allclose(float(got.scores[2]), empty_score, rtol=1e-12)
    assert (np.asarray(got.labels)[:, 2] == -1).all()
    assert (np.asarray(got.states)[:, 2] == -1).all()


@pytest.mark.parametrize("splits", [[12], [4, 4, 4], [7, 5]])
def test_streaming_beam_nbest_matches_oneshot(rng, splits):
    """streaming_beam_nbest_backtrace == one-shot beam_nbest on the
    consumed prefix (scores AND paths, every rank)."""
    from torch_asg_tpu import beam_nbest
    from torch_asg_tpu.ops.streaming import (
        streaming_beam_init,
        streaming_beam_nbest_backtrace,
        streaming_beam_update,
    )

    t_total, k, n = 12, 4, 3
    transition, inputs, _, _ = _problem(rng, t_total)
    lengths = jnp.asarray([12, 8, 3], jnp.int32)

    st = streaming_beam_init(B, k, dtype=jnp.float64)
    labs, bps, vals = [], [], []
    off = 0
    for t_c in splits:
        cl = jnp.clip(lengths - off, 0, t_c).astype(jnp.int32)
        st, (lab, bp, v) = streaming_beam_update(
            transition, st, inputs[off : off + t_c], chunk_lengths=cl
        )
        labs.append(lab)
        bps.append(bp)
        vals.append(v)
        off += t_c
    got = streaming_beam_nbest_backtrace(
        st, jnp.concatenate(labs), jnp.concatenate(bps),
        jnp.concatenate(vals), n,
    )
    want = beam_nbest(transition, inputs, n, lengths, beam_size=k)
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-12)
    np.testing.assert_array_equal(got.paths, want.paths)

    with pytest.raises(ValueError, match="beam_size"):
        streaming_beam_nbest_backtrace(
            st, jnp.concatenate(labs), jnp.concatenate(bps),
            jnp.concatenate(vals), k + 1,
        )
