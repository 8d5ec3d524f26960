"""C++ host-runtime tests: native vs numpy-fallback parity, and the ASG
extended-alphabet semantics (the wav2letter repeat-symbol trick described
in zh217/torch-asg ``doc/tech_report.tex`` section on collapsing repeats).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from torch_asg_tpu.runtime import (
    collapse_path,
    encode_targets,
    has_native_runtime,
    pack_frames,
)

NATIVE = has_native_runtime()


def test_native_runtime_built():
    # The toolchain exists in CI; the .so must build.
    assert NATIVE


def test_pack_frames_parity(rng):
    utts = [
        np.asarray(rng.normal(size=(t, 8)), np.float32) for t in (5, 3, 7, 1)
    ]
    out_np, len_np = pack_frames(utts, pad_value=-1.0, use_native=False)
    assert out_np.shape == (7, 4, 8)
    assert len_np.tolist() == [5, 3, 7, 1]
    # padding value present beyond lengths
    assert np.all(out_np[5:, 0] == -1.0)
    if NATIVE:
        out_c, len_c = pack_frames(utts, pad_value=-1.0, use_native=True)
        np.testing.assert_array_equal(out_c, out_np)
        np.testing.assert_array_equal(len_c, len_np)


@pytest.mark.parametrize(
    "labels,expected",
    [
        ([0, 1, 2], [0, 1, 2]),
        ([0, 0, 1], [0, 26, 1]),  # double -> rep1 symbol (index 26)
        ([0, 0, 0, 1], [0, 27, 1]),  # triple -> rep2 symbol (index 27)
        ([3, 3, 3, 3], [3, 27, 3]),  # 4-run: triple + single
        ([5, 5, 5, 5, 5, 5], [5, 27, 5, 27]),  # 6-run: two triples
        ([], []),
    ],
)
def test_encode_semantics(labels, expected):
    got, lens = encode_targets([np.asarray(labels, np.int32)], 26, max_reps=2)
    assert got[0, : lens[0]].tolist() == expected


def test_encode_parity_random(rng):
    seqs = [
        np.asarray(rng.integers(0, 5, size=rng.integers(1, 20)), np.int32)
        for _ in range(16)
    ]
    got_np, len_np = encode_targets(seqs, 5, max_reps=2, use_native=False)
    if NATIVE:
        got_c, len_c = encode_targets(seqs, 5, max_reps=2, use_native=True)
        np.testing.assert_array_equal(len_c, len_np)
        for b in range(len(seqs)):
            np.testing.assert_array_equal(
                got_c[b, : len_c[b]], got_np[b, : len_np[b]]
            )


def test_encode_collapse_roundtrip(rng):
    # encode -> frame expansion -> collapse recovers the original labels
    seq = np.asarray([1, 1, 2, 3, 3, 3, 4], np.int32)
    enc, lens = encode_targets([seq], 26, max_reps=2)
    framewise = np.repeat(enc[0, : lens[0]], 3)  # simulate frame duplication
    dec = collapse_path(framewise, alphabet_size=26, max_reps=2)
    np.testing.assert_array_equal(dec, seq)


def test_collapse_path_parity(rng):
    path = np.asarray([0, 0, 1, -1, 1, 2, 2, 26, 26, 3, -1, -1], np.int32)
    got_np = collapse_path(path, 26, 2, use_native=False)
    if NATIVE:
        got_c = collapse_path(path, 26, 2, use_native=True)
        np.testing.assert_array_equal(got_c, got_np)
    # -1 dropped; runs collapsed (also across -1 gaps); 26 is rep1 ->
    # expands the previous label once
    assert got_np.tolist() == [0, 1, 2, 2, 3]


def test_cmvn_native_matches_numpy():
    from torch_asg_tpu.runtime import cmvn

    r = np.random.default_rng(11)
    utts = [
        np.asarray(r.normal(loc=3.0, scale=2.5, size=(40, 8)), np.float32),
        np.asarray(r.normal(loc=-1.0, scale=0.2, size=(7, 8)), np.float32),
        np.zeros((1, 8), np.float32),  # zero-variance edge case
    ]
    out_native = cmvn(utts, use_native=True)
    out_np = cmvn(utts, use_native=False)
    for a, b in zip(out_native, out_np):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    # normalized stats: per-dim mean ~0, var ~1 for the long utterance
    np.testing.assert_allclose(out_np[0].mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(out_np[0].var(axis=0), 1.0, atol=1e-3)
    # inputs untouched
    assert float(utts[0].mean()) != 0.0


def test_cmvn_mean_only():
    from torch_asg_tpu.runtime import cmvn

    r = np.random.default_rng(12)
    u = np.asarray(r.normal(loc=5.0, scale=3.0, size=(30, 4)), np.float32)
    for native in (True, False):
        (out,) = cmvn([u], norm_var=False, use_native=native)
        np.testing.assert_allclose(out.mean(axis=0), 0.0, atol=1e-4)
        np.testing.assert_allclose(out.var(axis=0), u.var(axis=0), rtol=1e-4)


def test_prefetcher_order_and_contents():
    from torch_asg_tpu.runtime import BatchPrefetcher

    items = list(range(20))
    with BatchPrefetcher(items, lambda x: x * x, depth=3) as pf:
        assert list(pf) == [x * x for x in items]


def test_prefetcher_propagates_exceptions():
    from torch_asg_tpu.runtime import BatchPrefetcher

    def bad(x):
        if x == 3:
            raise RuntimeError("boom at 3")
        return x

    pf = BatchPrefetcher(range(10), bad, depth=2)
    got = []
    with pytest.raises(RuntimeError, match="boom at 3"):
        for v in pf:
            got.append(v)
    assert got == [0, 1, 2]


def test_prefetcher_exception_with_full_queue_and_slow_consumer():
    """The error must reach a slow consumer even when the bounded queue is
    full at raise time (regression: the worker used to drop the exception
    after a 1 s put timeout, leaving the consumer blocked forever)."""
    import time

    from torch_asg_tpu.runtime import BatchPrefetcher

    def bad(x):
        if x == 1:
            raise RuntimeError("late boom")
        return x

    pf = BatchPrefetcher(range(5), bad, depth=1)
    time.sleep(1.5)  # let the worker fill the depth-1 queue and hit the raise
    assert next(pf) == 0
    with pytest.raises(RuntimeError, match="late boom"):
        next(pf)


def test_prefetcher_repeated_stopiteration():
    """Iterators must keep raising StopIteration after exhaustion
    (regression: a second manual next() used to block forever)."""
    from torch_asg_tpu.runtime import BatchPrefetcher

    pf = BatchPrefetcher([1, 2], lambda x: x, depth=2)
    assert list(pf) == [1, 2]
    for _ in range(3):
        with pytest.raises(StopIteration):
            next(pf)


def test_prefetcher_early_close_stops_worker():
    import threading

    from torch_asg_tpu.runtime import BatchPrefetcher

    produced = []

    def prepare(x):
        produced.append(x)
        return x

    pf = BatchPrefetcher(range(10_000), prepare, depth=2)
    first = next(pf)
    assert first == 0
    pf.close()
    assert pf._worker.is_alive() is False
    # bounded lookahead: worker never ran far beyond the queue depth
    assert len(produced) < 50
    with pytest.raises(StopIteration):
        next(pf)


def test_bucket_ladder_and_pick():
    from torch_asg_tpu.runtime import bucket_ladder, pick_bucket

    ladder = bucket_ladder(1000, num_buckets=6, min_value=50)
    assert ladder[-1] == 1000 and ladder[0] == 50
    assert ladder == sorted(set(ladder))
    assert len(ladder) <= 6  # never MORE shapes than asked for
    # exactly one program shape when exactly one is requested
    assert bucket_ladder(1000, num_buckets=1, min_value=50) == [1000]
    assert pick_bucket(50, ladder) == 50
    assert pick_bucket(51, ladder) == ladder[1]
    assert pick_bucket(1000, ladder) == 1000
    with pytest.raises(ValueError, match="exceeds"):
        pick_bucket(1001, ladder)


def test_bucket_batcher_bounded_shapes_and_contents():
    """Every emitted batch shape comes from the bucket grid; contents and
    lengths of real rows are preserved exactly."""
    from torch_asg_tpu.runtime import BucketBatcher

    r = np.random.default_rng(3)
    time_buckets, target_buckets = [8, 16, 32], [4, 8]
    bb = BucketBatcher(
        batch_size=3, time_buckets=time_buckets, target_buckets=target_buckets
    )
    utts = []
    for _ in range(11):
        t = int(r.integers(2, 33))
        feats = np.asarray(r.normal(size=(t, 5)), np.float32)
        labels = r.integers(0, 9, size=int(r.integers(1, 8)))
        utts.append((feats, labels))

    seen = {}
    batches = list(bb.batches(iter(utts)))
    for b in batches:
        T_b, B_b, F = b["features"].shape
        assert T_b in time_buckets and B_b == 3 and F == 5
        assert b["targets"].shape[1] in target_buckets
        for i in range(3):
            if not b["pad_mask"][i]:
                continue
            L = int(b["feature_lengths"][i])
            key = b["features"][:L, i].tobytes()
            seen[key] = (
                b["targets"][i, : int(b["target_lengths"][i])].tolist()
            )
    # every utterance came out exactly once with its own labels
    assert len(seen) == len(utts)
    for feats, labels in utts:
        key = feats.tobytes()
        assert seen[key] == list(labels)
    # all real rows emitted; flush() leaves nothing behind
    assert sum(int(b["pad_mask"].sum()) for b in batches) == len(utts)
    assert bb.flush() == []


def test_bucket_batcher_criterion_padding_invariance(rng):
    """A bucket-padded batch scores identically to the tight batch (the
    serving contract: padding costs compute, never correctness)."""
    from torch_asg_tpu import asg_loss
    from torch_asg_tpu.runtime import BucketBatcher

    N = 6
    bb = BucketBatcher(
        batch_size=2, time_buckets=[32], target_buckets=[8]
    )
    utts = [
        (np.asarray(rng.normal(size=(20, N)), np.float32),
         np.asarray([1, 2, 3], np.int64)),
        (np.asarray(rng.normal(size=(13, N)), np.float32),
         np.asarray([4, 0], np.int64)),
    ]
    (batch,) = list(bb.batches(iter(utts)))
    trans = jnp.asarray(rng.normal(size=(N, N)))
    bucketed = asg_loss(
        trans,
        jnp.asarray(batch["features"], jnp.float64),
        jnp.asarray(batch["targets"]),
        jnp.asarray(batch["feature_lengths"]),
        jnp.asarray(batch["target_lengths"]),
        reduction="none",
    )
    for i, (feats, labels) in enumerate(utts):
        tight = asg_loss(
            trans,
            jnp.asarray(feats[:, None, :], jnp.float64),
            jnp.asarray(np.asarray(labels, np.int32)[None]),
            jnp.asarray([feats.shape[0]], jnp.int32),
            jnp.asarray([len(labels)], jnp.int32),
            reduction="none",
        )
        np.testing.assert_allclose(
            float(bucketed[i]), float(tight[0]), rtol=1e-12
        )


def test_device_prefetch_puts_on_device():
    import jax

    from torch_asg_tpu.runtime import device_prefetch

    batches = [
        {"x": np.ones((4, 3), np.float32) * i, "n": np.int32(i)}
        for i in range(3)
    ]
    with device_prefetch(batches, lambda b: b, depth=2) as pf:
        out = list(pf)
    assert len(out) == 3
    assert isinstance(out[1]["x"], jax.Array)
    np.testing.assert_allclose(np.asarray(out[2]["x"]), 2.0)


def test_collapse_path_default_expands_rep_symbols():
    """Default max_reps matches encode_targets (regression: the old
    default 0 silently emitted raw repeat-symbol indices)."""
    from torch_asg_tpu.runtime import collapse_path

    N = 5
    # path: a a rep1 b  -> a a a b  (rep1 = index N = one extra copy)
    path = np.asarray([2, 2, N, 3], np.int32)
    for native in (True, False):
        out = collapse_path(path, alphabet_size=N, use_native=native)
        assert out.tolist() == [2, 2, 3]
    # encode/decode round-trip with defaults on both sides
    from torch_asg_tpu.runtime import encode_targets

    labels = np.asarray([4, 4, 4, 1, 2, 2], np.int64)
    enc, ln = encode_targets([labels], alphabet_size=N)
    rt = collapse_path(enc[0][: int(ln[0])], alphabet_size=N)
    assert rt.tolist() == labels.tolist()


def test_pack_frames_and_cmvn_reject_flat_utterance():
    from torch_asg_tpu.runtime import cmvn, pack_frames

    with pytest.raises(ValueError, match="expected"):
        pack_frames([np.zeros(16, np.float32)])
    with pytest.raises(ValueError, match="expected"):
        cmvn([np.zeros(16, np.float32)])


def test_prefetcher_close_unblocks_blocked_consumer():
    """close() from another thread must wake a consumer blocked in
    __next__ on an empty queue (the worker enqueues nothing once _stop
    is set, so an unbounded get() would hang that consumer forever)."""
    import threading
    import time

    from torch_asg_tpu.runtime import BatchPrefetcher

    gate = threading.Event()

    def slow_prepare(x):
        gate.wait(timeout=10.0)  # hold the queue empty until close()
        return x

    pf = BatchPrefetcher(range(3), slow_prepare, depth=1)
    result = {}

    def consume():
        try:
            next(pf)
            result["outcome"] = "item"
        except StopIteration:
            result["outcome"] = "stopped"

    consumer = threading.Thread(target=consume)
    consumer.start()
    time.sleep(0.3)  # consumer is now blocked in __next__
    pf.close()
    gate.set()  # release the worker so join() can finish
    consumer.join(timeout=5.0)
    assert not consumer.is_alive(), "consumer stayed blocked after close()"
    assert result["outcome"] == "stopped"


def test_bucketed_streaming_beam_end_to_end(rng):
    """Serving-path composition stress (VERDICT r3 item 6): ragged
    traffic -> BucketBatcher -> fixed-size streaming chunks crossing
    utterance boundaries -> streaming beam decode -> backtrace, checked
    for exact parity against (a) one-shot beam_decode on the bucketed
    batch and (b) a tight per-utterance one-shot decode — the pieces are
    individually pinned elsewhere; this drives the pipeline a production
    recognizer actually runs."""
    from torch_asg_tpu import beam_decode
    from torch_asg_tpu.ops.streaming import (
        streaming_beam_backtrace,
        streaming_beam_init,
        streaming_beam_update,
    )
    from torch_asg_tpu.runtime import BucketBatcher

    N, k, chunk = 6, 3, 7  # chunk=7 never divides the time buckets
    bb = BucketBatcher(
        batch_size=3, time_buckets=[8, 16, 32], target_buckets=[4, 8]
    )
    utts = []
    for _ in range(10):
        t = int(rng.integers(2, 33))
        feats = np.asarray(rng.normal(size=(t, N)), np.float32)
        labels = rng.integers(0, N, size=int(rng.integers(1, 5)))
        utts.append((feats, labels))
    trans = jnp.asarray(rng.normal(size=(N, N)), jnp.float64)

    decoded = {}  # utterance key -> (score, path prefix)
    for batch in bb.batches(iter(utts)):
        emissions = jnp.asarray(batch["features"], jnp.float64)
        lengths = jnp.asarray(batch["feature_lengths"], jnp.int32)
        t_bucket, num_batches = emissions.shape[:2]

        st = streaming_beam_init(num_batches, k, dtype=jnp.float64)
        labs, bps, vals = [], [], []
        for off in range(0, t_bucket, chunk):
            t_c = min(chunk, t_bucket - off)
            cl = jnp.clip(lengths - off, 0, t_c).astype(jnp.int32)
            st, (lab, bp, v) = streaming_beam_update(
                trans, st, emissions[off : off + t_c], chunk_lengths=cl
            )
            labs.append(lab)
            bps.append(bp)
            vals.append(v)
        got = streaming_beam_backtrace(
            st, jnp.concatenate(labs), jnp.concatenate(bps),
            jnp.concatenate(vals),
        )
        want = beam_decode(trans, emissions, lengths, beam_size=k)
        np.testing.assert_allclose(got.scores, want.scores, rtol=1e-12)
        np.testing.assert_array_equal(got.paths, want.paths)
        for i in range(num_batches):
            if not batch["pad_mask"][i]:
                continue
            L = int(lengths[i])
            key = batch["features"][:L, i].tobytes()
            decoded[key] = (
                float(got.scores[i]), np.asarray(got.paths[:L, i])
            )

    # every utterance decoded once, identical to its tight one-shot decode
    assert len(decoded) == len(utts)
    for feats, _ in utts:
        score, path = decoded[feats.tobytes()]
        tight = beam_decode(
            trans,
            jnp.asarray(feats[:, None, :], jnp.float64),
            jnp.asarray([feats.shape[0]], jnp.int32),
            beam_size=k,
        )
        np.testing.assert_allclose(score, float(tight.scores[0]), rtol=1e-12)
        np.testing.assert_array_equal(path, np.asarray(tight.paths[:, 0]))
