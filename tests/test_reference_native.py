"""Direct parity against the REFERENCE's own compiled C++ extension.

The reference's CPU extension (zh217/torch-asg ``native/*.cpp``) is
JIT-compiled from the read-only reference checkout and driven through its
native entry points (the call sequence of ``torch_asg/asg.py:7-56``); its
losses and gradients are then compared against this framework in fp64.
This is the strongest parity evidence available: not golden constants,
not a re-derivation — the actual reference binary.

Skipped (not failed) when the toolchain can't build the extension.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from torch_asg_tpu import asg_loss

REF_SRC = "/root/reference/torch_asg/native"
BUILD_DIR = "/tmp/ref_native_build"


@pytest.fixture(scope="module")
def ref():
    import os

    os.makedirs(BUILD_DIR, exist_ok=True)
    try:
        from torch.utils.cpp_extension import load

        return load(
            name="torch_asg_native",
            sources=[
                f"{REF_SRC}/utils.cpp",
                f"{REF_SRC}/force_aligned_lattice.cpp",
                f"{REF_SRC}/fully_connected_lattice.cpp",
                f"{REF_SRC}/extension.cpp",
            ],
            extra_cflags=["-fopenmp", "-O2"],
            extra_ldflags=["-fopenmp"],
            build_directory=BUILD_DIR,
            verbose=False,
        )
    except Exception as e:  # no toolchain / headers: skip, don't fail
        pytest.skip(f"reference extension unavailable: {e}")


def _reference_loss_and_grads(ref, trans, inputs, targets, li, lo):
    """Loss + (dT, dI) via the reference native API (asg.py call sequence)."""
    t_total, num_batches, num_labels = inputs.shape
    s_total = targets.shape[1]
    full, a_f, b_f, pc_f = ref.fully_connected_forward(
        inputs, trans, li, t_total, num_batches, num_labels
    )
    aligned, a_a, b_a, pc_a = ref.force_aligned_forward(
        inputs, targets, trans, li, lo, t_total, num_batches, num_labels,
        s_total,
    )
    ones = torch.ones(num_batches, dtype=inputs.dtype)
    gt_f, gi_f = ref.fully_connected_backward(
        ones, a_f, b_f, pc_f, t_total, num_batches, num_labels
    )
    gt_a, gi_a = ref.force_aligned_backward(
        -ones, a_a, b_a, pc_a, targets, li, lo, t_total, num_batches,
        num_labels, s_total,
    )
    return full - aligned, gt_f + gt_a, gi_f + gi_a


@pytest.mark.parametrize("seed", range(3))
def test_loss_and_grads_match_reference_binary(ref, seed):
    r = np.random.default_rng(seed)
    t_total, num_batches, s_total, num_labels = 14, 4, 5, 7
    inputs_np = r.normal(size=(t_total, num_batches, num_labels))
    trans_np = r.normal(size=(num_labels, num_labels)) * 0.5
    targets_np = r.integers(0, num_labels, size=(num_batches, s_total))
    li_np = r.integers(s_total, t_total + 1, size=(num_batches,))
    lo_np = r.integers(1, s_total + 1, size=(num_batches,))

    ref_loss, ref_gt, ref_gi = _reference_loss_and_grads(
        ref,
        torch.tensor(trans_np, dtype=torch.float64),
        torch.tensor(inputs_np, dtype=torch.float64),
        torch.tensor(targets_np, dtype=torch.int64),
        torch.tensor(li_np, dtype=torch.int64),
        torch.tensor(lo_np, dtype=torch.int64),
    )

    loss = asg_loss(
        jnp.asarray(trans_np), jnp.asarray(inputs_np),
        jnp.asarray(targets_np, jnp.int32),
        jnp.asarray(li_np, jnp.int32), jnp.asarray(lo_np, jnp.int32),
        reduction="none", impl="scan",
    )
    gt, gi = jax.grad(
        lambda tr, i: asg_loss(
            tr, i, jnp.asarray(targets_np, jnp.int32),
            jnp.asarray(li_np, jnp.int32), jnp.asarray(lo_np, jnp.int32),
            reduction="sum", impl="scan",
        ),
        (0, 1),
    )(jnp.asarray(trans_np), jnp.asarray(inputs_np))

    np.testing.assert_allclose(np.asarray(loss), ref_loss.numpy(), rtol=1e-10,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(gt), ref_gt.numpy(), rtol=1e-9,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(gi), ref_gi.numpy(), rtol=1e-9,
                               atol=1e-10)


def test_fused_matches_reference_binary(ref, rng):
    """The production fused path against the reference binary (fp64
    interpret mode)."""
    t_total, num_batches, s_total, num_labels = 12, 3, 4, 6
    inputs_np = rng.normal(size=(t_total, num_batches, num_labels))
    trans_np = rng.normal(size=(num_labels, num_labels)) * 0.5
    targets_np = rng.integers(0, num_labels, size=(num_batches, s_total))
    li_np = rng.integers(s_total, t_total + 1, size=(num_batches,))
    lo_np = rng.integers(1, s_total + 1, size=(num_batches,))

    ref_loss, ref_gt, ref_gi = _reference_loss_and_grads(
        ref,
        torch.tensor(trans_np, dtype=torch.float64),
        torch.tensor(inputs_np, dtype=torch.float64),
        torch.tensor(targets_np, dtype=torch.int64),
        torch.tensor(li_np, dtype=torch.int64),
        torch.tensor(lo_np, dtype=torch.int64),
    )

    tgts = jnp.asarray(targets_np, jnp.int32)
    li = jnp.asarray(li_np, jnp.int32)
    lo = jnp.asarray(lo_np, jnp.int32)
    loss = asg_loss(
        jnp.asarray(trans_np), jnp.asarray(inputs_np), tgts, li, lo,
        reduction="none", impl="fused",
    )
    gt, gi = jax.grad(
        lambda tr, i: asg_loss(tr, i, tgts, li, lo, reduction="sum",
                               impl="fused"),
        (0, 1),
    )(jnp.asarray(trans_np), jnp.asarray(inputs_np))

    np.testing.assert_allclose(np.asarray(loss), ref_loss.numpy(), rtol=1e-9,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(gt), ref_gt.numpy(), rtol=1e-8,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(gi), ref_gi.numpy(), rtol=1e-8,
                               atol=1e-9)


@pytest.mark.parametrize(
    "shape_case",
    [
        # (T, B, S, N, li, lo) — degenerate and boundary length patterns
        (9, 3, 4, 6, [1, 9, 4], [1, 1, 4]),     # li=1 / lo=1 corners
        (7, 2, 7, 5, [7, 7], [7, 3]),           # S == T, full-length target
        (16, 4, 3, 11, [16, 3, 9, 12], [3, 3, 1, 2]),  # tight li == lo
    ],
)
def test_edge_lengths_match_reference_binary(ref, shape_case):
    t_total, num_batches, s_total, num_labels, li_l, lo_l = shape_case
    r = np.random.default_rng(sum(li_l))
    inputs_np = r.normal(size=(t_total, num_batches, num_labels))
    trans_np = r.normal(size=(num_labels, num_labels)) * 0.5
    targets_np = r.integers(0, num_labels, size=(num_batches, s_total))
    li_np = np.asarray(li_l)
    lo_np = np.asarray(lo_l)

    ref_loss, ref_gt, ref_gi = _reference_loss_and_grads(
        ref,
        torch.tensor(trans_np, dtype=torch.float64),
        torch.tensor(inputs_np, dtype=torch.float64),
        torch.tensor(targets_np, dtype=torch.int64),
        torch.tensor(li_np, dtype=torch.int64),
        torch.tensor(lo_np, dtype=torch.int64),
    )

    tgts = jnp.asarray(targets_np, jnp.int32)
    li = jnp.asarray(li_np, jnp.int32)
    lo = jnp.asarray(lo_np, jnp.int32)
    # all four impl tiers against the reference binary, including the
    # wordpiece-scale matmul formulation (exact at any N; fp64 here)
    for impl in ("scan", "fused", "pallas", "matmul"):
        loss = asg_loss(
            jnp.asarray(trans_np), jnp.asarray(inputs_np), tgts, li, lo,
            reduction="none", impl=impl,
        )
        gt, gi = jax.grad(
            lambda tr, i: asg_loss(tr, i, tgts, li, lo, reduction="sum",
                                   impl=impl),
            (0, 1),
        )(jnp.asarray(trans_np), jnp.asarray(inputs_np))
        np.testing.assert_allclose(np.asarray(loss), ref_loss.numpy(),
                                   rtol=1e-9, atol=1e-9, err_msg=impl)
        np.testing.assert_allclose(np.asarray(gt), ref_gt.numpy(), rtol=1e-8,
                                   atol=1e-9, err_msg=impl)
        np.testing.assert_allclose(np.asarray(gi), ref_gi.numpy(), rtol=1e-8,
                                   atol=1e-9, err_msg=impl)


# ---------------------------------------------------------------------------
# Randomized fuzz sweep (VERDICT r4 item 4): ~40 seeded configs spanning
# the reference's input envelope — N in {1, 2, 7, 64}, S == T, li == lo,
# B == 1, S == 1, repeated-label targets, mixed ragged patterns — each
# driven through ALL FOUR impl tiers against the reference binary at
# fp64 / 1e-9.  Shapes repeat across seeds so jit caching keeps the
# sweep to minutes of CPU.
# ---------------------------------------------------------------------------

_FUZZ_FAMILIES = [
    # (name, T, B, S, N, pattern)
    ("s_eq_t_b1", 9, 1, 9, 7, "ragged"),
    ("s1", 12, 3, 1, 5, "ragged"),
    ("n1", 10, 4, 5, 1, "ragged"),
    ("n2", 8, 2, 4, 2, "ragged"),
    ("n64", 11, 3, 6, 64, "ragged"),
    ("li_eq_lo", 16, 5, 8, 7, "li_eq_lo"),
    ("tight_full", 7, 2, 7, 7, "full"),
    ("repeats", 14, 4, 6, 7, "repeated_labels"),
]


def _fuzz_case(seed, t_total, num_batches, s_total, num_labels, pattern):
    r = np.random.default_rng(seed)
    inputs_np = r.normal(size=(t_total, num_batches, num_labels))
    trans_np = r.normal(size=(num_labels, num_labels)) * 0.5
    if pattern == "repeated_labels":
        lab = r.integers(0, num_labels, size=(num_batches, 1))
        targets_np = np.repeat(lab, s_total, axis=1)
    else:
        targets_np = r.integers(0, num_labels, size=(num_batches, s_total))
    if pattern == "full":
        li_np = np.full(num_batches, t_total)
        lo_np = np.full(num_batches, s_total)
    elif pattern == "li_eq_lo":
        li_np = r.integers(1, s_total + 1, size=num_batches)
        lo_np = li_np.copy()
    else:  # mixed ragged, always alignable (lo <= li)
        lo_np = r.integers(1, s_total + 1, size=num_batches)
        li_np = np.array(
            [r.integers(lo, t_total + 1) for lo in lo_np])
    return inputs_np, trans_np, targets_np, li_np, lo_np


@pytest.mark.parametrize("family", _FUZZ_FAMILIES, ids=lambda f: f[0])
def test_fuzz_sweep_matches_reference_binary(ref, family):
    name, t_total, num_batches, s_total, num_labels, pattern = family
    for seed_i in range(5):
        # deterministic across processes (str hash is salted)
        seed = (sum(map(ord, name)) * 1009 + seed_i) % (2**31)
        inputs_np, trans_np, targets_np, li_np, lo_np = _fuzz_case(
            seed, t_total, num_batches, s_total, num_labels, pattern)

        ref_loss, ref_gt, ref_gi = _reference_loss_and_grads(
            ref,
            torch.tensor(trans_np, dtype=torch.float64),
            torch.tensor(inputs_np, dtype=torch.float64),
            torch.tensor(targets_np, dtype=torch.int64),
            torch.tensor(li_np, dtype=torch.int64),
            torch.tensor(lo_np, dtype=torch.int64),
        )

        tgts = jnp.asarray(targets_np, jnp.int32)
        li = jnp.asarray(li_np, jnp.int32)
        lo = jnp.asarray(lo_np, jnp.int32)
        for impl in ("scan", "fused", "pallas", "matmul"):
            loss, (gt, gi) = jax.value_and_grad(
                lambda tr, i: asg_loss(tr, i, tgts, li, lo,
                                       reduction="sum", impl=impl),
                (0, 1),
            )(jnp.asarray(trans_np), jnp.asarray(inputs_np))
            msg = f"{name} seed={seed_i} impl={impl}"
            np.testing.assert_allclose(
                float(loss), float(ref_loss.sum()), rtol=1e-9, atol=1e-9,
                err_msg=msg)
            np.testing.assert_allclose(
                np.asarray(gt), ref_gt.numpy(), rtol=1e-8, atol=1e-9,
                err_msg=msg)
            np.testing.assert_allclose(
                np.asarray(gi), ref_gi.numpy(), rtol=1e-8, atol=1e-9,
                err_msg=msg)
