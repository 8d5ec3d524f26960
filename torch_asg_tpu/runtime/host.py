"""ctypes bindings for the C++ host runtime, with pure-numpy fallbacks.

The shared library is built by ``make -C native`` (attempted lazily on
first use); when unavailable (no toolchain), semantically identical numpy
implementations take over so the framework stays importable everywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_LIB_NAME = "_asg_host.so"
_HERE = os.path.dirname(os.path.abspath(__file__))
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(_HERE)), "native")

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    path = os.path.join(_HERE, _LIB_NAME)
    if os.path.isdir(_NATIVE_DIR):
        # Run make even when the .so exists: it is a no-op when fresh and
        # rebuilds when native/asg_host.cpp changed (a stale gitignored
        # binary would otherwise silently shadow source edits).
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            if not os.path.exists(path):
                return None
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None

    lib.asg_pack_frames.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.asg_encode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.asg_encode_batch.restype = ctypes.c_int64
    lib.asg_collapse_path.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.asg_collapse_path.restype = ctypes.c_int64
    lib.asg_cmvn.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_float,
        ctypes.c_int32,
    ]
    _lib = lib
    return lib


def has_native_runtime() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def pack_frames(
    utterances: Sequence[np.ndarray],
    pad_value: float = 0.0,
    use_native: Optional[bool] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Pack ragged (T_b, F) float32 utterances into (T_max, B, F) + lengths."""
    num_batches = len(utterances)
    if num_batches == 0:
        return np.zeros((0, 0, 0), np.float32), np.zeros((0,), np.int32)
    if utterances[0].ndim != 2:
        raise ValueError(
            f"utterance 0 has shape {utterances[0].shape}; expected (*, F)"
        )
    feat_dim = utterances[0].shape[1]
    for b, u in enumerate(utterances):
        if u.ndim != 2 or u.shape[1] != feat_dim:
            raise ValueError(
                f"utterance {b} has shape {u.shape}; expected (*, {feat_dim}) "
                "— all utterances must share the feature dim"
            )
    lengths = np.array([u.shape[0] for u in utterances], np.int32)
    t_max = int(lengths.max())
    lib = _load() if use_native in (None, True) else None
    if lib is not None and use_native is not False:
        frames = np.ascontiguousarray(
            np.concatenate([np.asarray(u, np.float32) for u in utterances], axis=0),
            np.float32,
        )
        offsets = np.zeros(num_batches + 1, np.int64)
        np.cumsum(lengths, out=offsets[1:])
        out = np.empty((t_max, num_batches, feat_dim), np.float32)
        out_lengths = np.empty(num_batches, np.int32)
        lib.asg_pack_frames(
            _ptr(frames, ctypes.c_float),
            _ptr(offsets, ctypes.c_int64),
            num_batches,
            t_max,
            feat_dim,
            pad_value,
            _ptr(out, ctypes.c_float),
            _ptr(out_lengths, ctypes.c_int32),
        )
        return out, out_lengths
    out = np.full((t_max, num_batches, feat_dim), pad_value, np.float32)
    for b, u in enumerate(utterances):
        out[: u.shape[0], b] = u
    return out, lengths


def encode_labels_np(
    labels: np.ndarray, alphabet_size: int, max_reps: int
) -> np.ndarray:
    """Numpy reference for the ASG repeat-symbol encoding (see asg_host.cpp)."""
    out = []
    i = 0
    labels = labels.tolist()
    while i < len(labels):
        lab = labels[i]
        run = 1
        while i + run < len(labels) and labels[i + run] == lab:
            run += 1
        left = run
        while left > 0:
            out.append(lab)
            reps = min(left - 1, max_reps)
            if reps > 0:
                out.append(alphabet_size + reps - 1)
            left -= 1 + reps
        i += run
    return np.asarray(out, np.int32)


def encode_targets(
    sequences: Sequence[np.ndarray],
    alphabet_size: int,
    max_reps: int = 2,
    pad_value: int = 0,
    use_native: Optional[bool] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Batch-encode label sequences into the ASG extended alphabet.

    Returns (targets (B, S_max) int32, target_lengths (B,) int32).  The
    extended alphabet has size alphabet_size + max_reps.
    """
    num_batches = len(sequences)
    if num_batches == 0:
        return np.zeros((0, 1), np.int32), np.zeros((0,), np.int32)
    in_lengths = np.array([len(s) for s in sequences], np.int64)
    s_max = int(in_lengths.max()) if num_batches else 0
    lib = _load() if use_native in (None, True) else None
    if lib is not None and use_native is not False and s_max > 0:
        flat = np.ascontiguousarray(
            np.concatenate([np.asarray(s, np.int32) for s in sequences]), np.int32
        )
        offsets = np.zeros(num_batches + 1, np.int64)
        np.cumsum(in_lengths, out=offsets[1:])
        out = np.empty((num_batches, s_max), np.int32)
        out_lengths = np.empty(num_batches, np.int32)
        lib.asg_encode_batch(
            _ptr(flat, ctypes.c_int32),
            _ptr(offsets, ctypes.c_int64),
            num_batches,
            alphabet_size,
            max_reps,
            s_max,
            pad_value,
            _ptr(out, ctypes.c_int32),
            _ptr(out_lengths, ctypes.c_int32),
        )
        max_len = int(out_lengths.max()) if num_batches else 0
        return out[:, : max(max_len, 1)], out_lengths
    encoded = [encode_labels_np(np.asarray(s), alphabet_size, max_reps) for s in sequences]
    out_lengths = np.array([len(e) for e in encoded], np.int32)
    width = max(int(out_lengths.max()), 1)
    out = np.full((num_batches, width), pad_value, np.int32)
    for b, e in enumerate(encoded):
        out[b, : len(e)] = e
    return out, out_lengths


def collapse_path(
    path: np.ndarray,
    alphabet_size: int = 0,
    max_reps: int = 2,
    use_native: Optional[bool] = None,
) -> np.ndarray:
    """Collapse a framewise label path (e.g. viterbi_decode output column)
    into a label sequence: drop -1 padding, dedup runs, and — when
    ``alphabet_size > 0`` — expand the ``max_reps`` repeat symbols of the
    ASG extended alphabet (labels ``alphabet_size .. alphabet_size +
    max_reps - 1``; default 2 matches ``encode_targets``).  With
    ``alphabet_size == 0`` it is a plain dedup and ``max_reps`` is
    ignored."""
    path = np.ascontiguousarray(np.asarray(path, np.int32))
    lib = _load() if use_native in (None, True) else None
    if lib is not None and use_native is not False:
        # worst case every frame expands max_reps+1 labels
        out = np.empty(path.shape[0] * (max(max_reps, 0) + 1) + 1, np.int32)
        n = lib.asg_collapse_path(
            _ptr(path, ctypes.c_int32),
            path.shape[0],
            alphabet_size,
            max_reps,
            _ptr(out, ctypes.c_int32),
        )
        return out[:n].copy()
    out = []
    prev = -1
    for lab in path.tolist():
        if lab < 0 or lab == prev:
            continue
        prev = lab
        if alphabet_size > 0 and alphabet_size <= lab < alphabet_size + max_reps:
            if out:
                reps = lab - alphabet_size + 1
                out.extend([out[-1]] * reps)
        else:
            out.append(lab)
    return np.asarray(out, np.int32)


def cmvn(
    utterances: Sequence[np.ndarray],
    epsilon: float = 1e-5,
    norm_var: bool = True,
    use_native: Optional[bool] = None,
) -> list:
    """Per-utterance cepstral mean (and variance) normalization.

    The standard wav2letter front-end transform, run on the host data
    path (C++/OpenMP when available) while the chip computes.  Returns
    new (T_b, F) float32 arrays; inputs are not modified.
    """
    num_batches = len(utterances)
    if num_batches == 0:
        return []
    if utterances[0].ndim != 2:
        raise ValueError(
            f"utterance 0 has shape {utterances[0].shape}; expected (*, F)"
        )
    feat_dim = utterances[0].shape[1]
    for b, u in enumerate(utterances):
        if u.ndim != 2 or u.shape[1] != feat_dim:
            raise ValueError(
                f"utterance {b} has shape {u.shape}; expected (*, {feat_dim})"
            )
    lib = _load() if use_native in (None, True) else None
    if lib is not None and use_native is not False:
        lengths = np.array([u.shape[0] for u in utterances], np.int64)
        flat = np.ascontiguousarray(
            np.concatenate(
                [np.asarray(u, np.float32) for u in utterances], axis=0
            ),
            np.float32,
        )
        offsets = np.zeros(num_batches + 1, np.int64)
        np.cumsum(lengths, out=offsets[1:])
        lib.asg_cmvn(
            _ptr(flat, ctypes.c_float),
            _ptr(offsets, ctypes.c_int64),
            num_batches,
            feat_dim,
            epsilon,
            1 if norm_var else 0,
        )
        return [
            flat[offsets[b] : offsets[b + 1]].copy()
            for b in range(num_batches)
        ]
    out = []
    for u in utterances:
        u = np.asarray(u, np.float32)
        if u.shape[0] == 0:
            out.append(u.copy())
            continue
        mean = u.mean(axis=0, dtype=np.float64)
        if norm_var:
            var = u.var(axis=0, dtype=np.float64)
            out.append(((u - mean) / np.sqrt(var + epsilon)).astype(np.float32))
        else:
            out.append((u - mean).astype(np.float32))
    return out
