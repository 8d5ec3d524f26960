"""Smoke tests for the shipped examples (tiny shapes, CPU): user-facing
entry points rot silently otherwise.  Each must run end-to-end and hit
its own internal assertions (stream_decode pins streaming == one-shot;
train_asg trains, checkpoints, and decodes)."""

import os
import sys

import pytest

_EX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "examples")
sys.path.insert(0, _EX)


def test_stream_decode_example():
    import stream_decode

    assert stream_decode.main(
        ["--frames", "18", "--chunk", "6", "--beam", "2"]
    ) == 0


def test_nbest_rescore_example():
    import nbest_rescore

    assert nbest_rescore.main(["--k", "4"]) == 0


def test_train_asg_example(tmp_path):
    import train_asg

    assert train_asg.main([
        "--steps", "2", "--batch-size", "2", "--impl", "scan",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
    ]) in (0, None)
