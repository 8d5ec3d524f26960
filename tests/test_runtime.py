"""C++ host-runtime tests: native vs numpy-fallback parity, and the ASG
extended-alphabet semantics (the wav2letter repeat-symbol trick described
in zh217/torch-asg ``doc/tech_report.tex`` section on collapsing repeats).
"""

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
