"""Online (streaming) recognition example.

Simulates a live audio front-end: emission chunks arrive a few frames at
a time, per-stream rates differ (as real microphones do), and after
every chunk the recognizer reads out

  * exact prefix scores (full / aligned / running ASG loss margin) via
    ``streaming_update`` + ``streaming_scores``;
  * the current best-path hypothesis via ``streaming_viterbi_update`` +
    ``streaming_viterbi_backtrace``, collapsed to labels by the C++ host
    runtime's ``collapse_path``.

Both streaming read-outs are exact: they equal the one-shot
``fcc_score``/``fac_score``/``viterbi_decode`` on the concatenated
prefix (pinned by tests/test_streaming.py) — this demo shows the online
API shape, not an approximation.  The reference consumes whole
utterances only (its recursions take the full (T, B, N) tensor,
``fully_connected_lattice.cpp`` / ``force_aligned_lattice.cpp``).

Run:  python examples/stream_decode.py [--chunk 10] [--frames 60]
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from torch_asg_tpu import (
    streaming_init,
    streaming_scores,
    streaming_targets,
    streaming_update,
    streaming_viterbi_backtrace,
    streaming_viterbi_init,
    streaming_viterbi_update,
    viterbi_decode,
)
from torch_asg_tpu.runtime import collapse_path

NUM_LABELS = 12


def synthetic_stream(rng, num_streams, total_frames):
    """Emissions that weakly encode a planted label sequence per stream."""
    emissions = rng.normal(0, 0.5, size=(total_frames, num_streams, NUM_LABELS))
    planted = []
    for b in range(num_streams):
        labs, t = [], 0
        while t < total_frames:
            lab = int(rng.integers(0, NUM_LABELS))
            dur = int(rng.integers(3, 8))
            emissions[t : t + dur, b, lab] += 3.0
            labs.append(lab)
            t += dur
        planted.append(labs)
    return emissions.astype(np.float32), planted


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--chunk", type=int, default=10)
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--streams", type=int, default=3)
    p.add_argument(
        "--beam", type=int, default=0, metavar="K",
        help="also run the beam-pruned online decoder (streaming_beam_*) "
             "with beam width K — the O(N/K)-cheaper path for "
             "wordpiece-scale vocabularies; 0 disables",
    )
    args = p.parse_args(argv)

    rng = np.random.default_rng(0)
    B, T, N = args.streams, args.frames, NUM_LABELS
    emissions, planted = synthetic_stream(rng, B, T)
    transition = jnp.zeros((N, N), jnp.float32)
    # a short fixed "expected transcript" per stream for the aligned score
    targets = jnp.asarray(
        [seq[:4] + [0] * max(0, 4 - len(seq)) for seq in planted], jnp.int32
    )
    target_lengths = jnp.full((B,), 4, jnp.int32)

    # each stream delivers frames at its own rate (stream b lags b frames
    # per chunk) — ragged chunk_lengths keep the states consistent.
    # streaming_targets precomputes the chunk-invariant target gathers
    # once so every jitted update pays only the per-chunk emission gather.
    pre = streaming_targets(transition, targets, N, target_lengths)
    score_st = streaming_init(B, N, int(targets.shape[1]))
    vit_st = streaming_viterbi_init(B, N)
    upd_scores = jax.jit(streaming_update)
    upd_vit = jax.jit(streaming_viterbi_update)
    if args.beam:
        from torch_asg_tpu import streaming_beam_init, streaming_beam_update

        beam_st = streaming_beam_init(B, args.beam)
        upd_beam = jax.jit(streaming_beam_update)
        beam_hist = ([], [], [])  # labels, backptrs, valid

    bps, vals = [], []
    delivered = np.zeros(B, np.int64)
    emis = jnp.asarray(emissions)
    for off in range(0, T, args.chunk):
        t_c = min(args.chunk, T - off)
        chunk_lengths = jnp.asarray(
            np.minimum(np.maximum(t_c - np.arange(B), 0), t_c), jnp.int32
        )
        # stream b's next frames are its own continuation, not a global slice
        chunk = np.zeros((t_c, B, N), np.float32)
        for b in range(B):
            n_b = int(chunk_lengths[b])
            chunk[:n_b, b] = emissions[delivered[b] : delivered[b] + n_b, b]
        chunk = jnp.asarray(chunk)

        score_st = upd_scores(
            transition, score_st, chunk,
            chunk_lengths=chunk_lengths, stream_targets=pre,
        )
        vit_st, (bp, v) = upd_vit(
            transition, vit_st, chunk, chunk_lengths=chunk_lengths
        )
        bps.append(bp)
        vals.append(v)
        if args.beam:
            beam_st, (blab, bbp, bv) = upd_beam(
                transition, beam_st, chunk, chunk_lengths=chunk_lengths
            )
            for hist, x in zip(beam_hist, (blab, bbp, bv)):
                hist.append(x)
        delivered += np.asarray(chunk_lengths)

        full, aligned = streaming_scores(score_st, target_lengths)
        hyp = streaming_viterbi_backtrace(
            vit_st, jnp.concatenate(bps), jnp.concatenate(vals)
        )
        print(f"after {delivered.tolist()} frames:")
        for b in range(B):
            path = np.asarray(hyp.paths)[:, b]
            labels = collapse_path(path).tolist()
            print(
                f"  stream {b}: full={float(full[b]):8.2f} "
                f"aligned={float(aligned[b]):8.2f} hyp={labels}"
            )

    # exactness check against the one-shot decoder on each full stream
    one = viterbi_decode(
        transition, emis, jnp.asarray(delivered, jnp.int32)
    )
    final = streaming_viterbi_backtrace(
        vit_st, jnp.concatenate(bps), jnp.concatenate(vals)
    )
    # streaming emits each stream's labels at its delivery positions;
    # compare the consumed-frame label sequences
    for b in range(B):
        mine = np.asarray(final.paths)[:, b]
        ref = np.asarray(one.paths)[: int(delivered[b]), b]
        assert mine[mine >= 0].tolist() == ref.tolist(), f"stream {b} mismatch"
    print("final streaming hypotheses exactly match the one-shot decoder")

    if args.beam:
        from torch_asg_tpu import beam_decode, streaming_beam_backtrace

        beam_final = streaming_beam_backtrace(
            beam_st, *(jnp.concatenate(h) for h in beam_hist)
        )
        one_beam = beam_decode(
            transition, emis, jnp.asarray(delivered, jnp.int32),
            beam_size=args.beam,
        )
        for b in range(B):
            mine = np.asarray(beam_final.paths)[:, b]
            ref = np.asarray(one_beam.paths)[: int(delivered[b]), b]
            assert mine[mine >= 0].tolist() == ref.tolist()
            hyp = collapse_path(mine).tolist()
            gap = float(one.scores[b] - beam_final.scores[b])
            print(
                f"  beam-{args.beam} stream {b}: hyp={hyp} "
                f"(score gap to exact: {gap:.4f})"
            )
        print("streaming beam hypotheses match the one-shot beam decoder")
    return 0


if __name__ == "__main__":
    sys.exit(main())
