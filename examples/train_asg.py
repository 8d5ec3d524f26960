"""End-to-end ASG training example on synthetic speech-like data.

Demonstrates the full framework surface: the C++ host runtime packs
ragged utterances and encodes targets into the ASG extended alphabet, the
Wav2Letter encoder + ASG criterion train under jit (optionally across a
device mesh), checkpoints save/restore through orbax, and the Viterbi
decoder greedy-decodes a sample at the end.

Run:  python examples/train_asg.py [--steps 50] [--checkpoint-dir /tmp/ckpt]
      [--profile-dir /tmp/trace] [--impl scan|pallas]
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from torch_asg_tpu import viterbi_decode
from torch_asg_tpu.models import Wav2Letter, create_train_state, make_train_step
from torch_asg_tpu.runtime import (BatchPrefetcher, cmvn, collapse_path,
                                   encode_targets, pack_frames)
from torch_asg_tpu.utils.profiling import trace

ALPHABET = 26  # letters; +2 repeat symbols -> 28 labels
MAX_REPS = 2
NUM_LABELS = ALPHABET + MAX_REPS
FEATURE_DIM = 64


def synthetic_raw(rng: np.random.Generator, batch_size: int, max_frames: int):
    """Raw ragged utterances whose features weakly encode a random letter
    sequence (the 'corpus' — fixed across epochs like real training)."""
    utts, label_seqs = [], []
    for _ in range(batch_size):
        n_labels = int(rng.integers(3, 8))
        labels = rng.integers(0, ALPHABET, size=n_labels)
        frames_per = rng.integers(2, 5, size=n_labels)
        feats = []
        for lab, k in zip(labels, frames_per):
            f = rng.normal(0, 0.3, size=(int(k), FEATURE_DIM)).astype(np.float32)
            f[:, lab % FEATURE_DIM] += 2.0  # planted evidence
            feats.append(f)
        utts.append(np.concatenate(feats)[:max_frames])
        label_seqs.append(labels.astype(np.int32))
    return utts, label_seqs


def prepare_batch(utts, label_seqs):
    """Host data path for one batch: CMVN + pack + encode (the C++/OpenMP
    runtime; runs per step in the prefetcher's worker thread)."""
    utts = cmvn(utts)  # per-utterance feature normalization (C++ runtime)
    features, feat_lengths = pack_frames(utts)  # (T, B, F) via the C++ runtime
    targets, target_lengths = encode_targets(label_seqs, ALPHABET, MAX_REPS)
    return {
        "features": jnp.asarray(features.transpose(1, 0, 2)),  # (B, T, F)
        "feature_lengths": jnp.asarray(feat_lengths),
        "targets": jnp.asarray(targets),
        "target_lengths": jnp.asarray(target_lengths),
    }


def synthetic_batch(rng: np.random.Generator, batch_size: int, max_frames: int):
    utts, label_seqs = synthetic_raw(rng, batch_size, max_frames)
    return prepare_batch(utts, label_seqs), label_seqs


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--checkpoint-dir", type=str, default="")
    ap.add_argument("--profile-dir", type=str, default="")
    ap.add_argument("--impl", type=str, default="auto")
    ap.add_argument("--batch-size", type=int, default=8)
    args = ap.parse_args(argv)

    model = Wav2Letter(num_labels=NUM_LABELS, channels=128, depth=2, head_channels=128)
    optimizer = optax.adamw(3e-3)
    state, optimizer = create_train_state(
        model, jax.random.key(0), FEATURE_DIM, optimizer
    )
    train_step = jax.jit(make_train_step(model, optimizer, impl=args.impl))

    ckpt_mgr = None
    if args.checkpoint_dir:
        import orbax.checkpoint as ocp

        ckpt_mgr = ocp.CheckpointManager(
            os.path.abspath(args.checkpoint_dir),
            options=ocp.CheckpointManagerOptions(max_to_keep=2),
        )
        latest = ckpt_mgr.latest_step()
        if latest is not None:
            state = ckpt_mgr.restore(latest, args=ocp.args.StandardRestore(state))
            print(f"restored checkpoint at step {latest}")

    rng = np.random.default_rng(0)
    start = int(state.step)
    # a small FIXED corpus, cycled (epochs): the loss descends visibly
    # and the final decode runs on data the model actually trained on
    corpus = [
        synthetic_raw(rng, args.batch_size, max_frames=32)
        for _ in range(4)
    ]
    # async input pipeline: each step's CMVN + packing + encoding
    # (C++/OpenMP, GIL-free) runs in the worker while the chip executes
    # the previous step
    steps_iter = range(start, start + args.steps)
    prefetcher = BatchPrefetcher(
        steps_iter, lambda s: prepare_batch(*corpus[s % len(corpus)]), depth=2
    )
    with trace(args.profile_dir or None), prefetcher:
        for step, batch in zip(steps_iter, prefetcher):
            state, loss = train_step(state, batch)
            if step % 5 == 0 or step == start + args.steps - 1:
                print(f"step {step:4d}  loss {float(loss):8.4f}")
            if ckpt_mgr and (step + 1) % 10 == 0:
                ckpt_mgr.save(step + 1, args=ocp.args.StandardSave(state))
    if ckpt_mgr:
        ckpt_mgr.wait_until_finished()

    # decode one TRAINED utterance with the trained model
    utts0, label_seqs = corpus[0]
    batch = prepare_batch(utts0, label_seqs)
    emissions = model.apply({"params": state.params["encoder"]}, batch["features"])
    lengths = model.output_length(batch["feature_lengths"]).astype(jnp.int32)
    res = viterbi_decode(state.params["transition"], emissions, lengths)
    hyp = collapse_path(np.asarray(res.paths)[:, 0], ALPHABET, MAX_REPS)
    print("ref labels:", label_seqs[0].tolist())
    print("hyp labels:", hyp.tolist())


if __name__ == "__main__":
    main()
