"""Multi-chip sharding tests on a virtual 8-device CPU mesh.

Checks the data-parallel and vocabulary-sharded paths produce the same
losses and gradients as the single-chip implementation (the capability the
single-device reference never had; SURVEY.md section 2 parallelism table).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_asg_tpu import asg_loss
from torch_asg_tpu.parallel import (
    asg_loss_dp,
    asg_loss_vp,
    fcc_score_vp,
    make_mesh,
    shard_batch,
    viterbi_align_dp,
    viterbi_decode_dp,
)
from torch_asg_tpu.ops.fcc import fcc_score
from torch_asg_tpu.ops.viterbi import viterbi_align, viterbi_decode


@pytest.fixture(scope="module")
def case():
    r = np.random.default_rng(5)
    T, B, S, N = 12, 8, 4, 16
    return dict(
        inputs=jnp.asarray(r.normal(size=(T, B, N))),
        trans=jnp.asarray(r.normal(size=(N, N)) * 0.3),
        targets=jnp.asarray(r.integers(0, N, size=(B, S))),
        li=jnp.asarray(r.integers(S, T + 1, size=(B,))),
        lo=jnp.asarray(r.integers(1, S + 1, size=(B,))),
    )


def test_mesh_helper():
    mesh = make_mesh()
    assert mesh.shape["data"] == len(jax.devices())
    mesh2 = make_mesh((4, 2), ("data", "model"))
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh((3,), ("data",))


def test_dp_matches_single_chip(case):
    mesh = make_mesh()
    ref = asg_loss(
        case["trans"], case["inputs"], case["targets"], case["li"], case["lo"],
        reduction="none",
    )
    inputs, targets, li, lo = shard_batch(
        mesh, "data", case["inputs"], case["targets"], case["li"], case["lo"]
    )
    got = asg_loss_dp(
        mesh, case["trans"], inputs, targets, li, lo, reduction="none"
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-12)

    for reduction in ("mean", "sum"):
        got_r = asg_loss_dp(
            mesh, case["trans"], inputs, targets, li, lo, reduction=reduction
        )
        ref_r = asg_loss(
            case["trans"], case["inputs"], case["targets"], case["li"],
            case["lo"], reduction=reduction,
        )
        np.testing.assert_allclose(float(got_r), float(ref_r), rtol=1e-12)


def test_dp_grads_psum(case):
    mesh = make_mesh()

    def dp_loss(trans, inputs):
        return asg_loss_dp(
            mesh, trans, inputs, case["targets"], case["li"], case["lo"],
            reduction="sum",
        )

    def ref_loss(trans, inputs):
        return asg_loss(
            trans, inputs, case["targets"], case["li"], case["lo"],
            reduction="sum",
        )

    g_dp = jax.grad(dp_loss, argnums=(0, 1))(case["trans"], case["inputs"])
    g_ref = jax.grad(ref_loss, argnums=(0, 1))(case["trans"], case["inputs"])
    np.testing.assert_allclose(np.asarray(g_dp[0]), np.asarray(g_ref[0]), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_dp[1]), np.asarray(g_ref[1]), rtol=1e-10)


def test_dp_viterbi_decode_matches_single_chip(case):
    mesh = make_mesh()
    ref = viterbi_decode(case["trans"], case["inputs"], case["li"])
    got = viterbi_decode_dp(mesh, case["trans"], case["inputs"], case["li"])
    np.testing.assert_allclose(np.asarray(got.scores), np.asarray(ref.scores),
                               rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(got.paths), np.asarray(ref.paths))
    with pytest.raises(ValueError, match="divisible"):
        viterbi_decode_dp(mesh, case["trans"], case["inputs"][:, :3], None)


def test_dp_beam_decode_matches_single_chip(case):
    from torch_asg_tpu.ops.viterbi import beam_decode
    from torch_asg_tpu.parallel import beam_decode_dp

    mesh = make_mesh()
    ref = beam_decode(case["trans"], case["inputs"], case["li"], beam_size=4)
    got = beam_decode_dp(
        mesh, case["trans"], case["inputs"], case["li"], beam_size=4
    )
    np.testing.assert_allclose(np.asarray(got.scores), np.asarray(ref.scores),
                               rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(got.paths), np.asarray(ref.paths))


def test_dp_viterbi_align_matches_single_chip(case):
    mesh = make_mesh()
    ref = viterbi_align(
        case["trans"], case["inputs"], case["targets"], case["li"], case["lo"]
    )
    got = viterbi_align_dp(
        mesh, case["trans"], case["inputs"], case["targets"], case["li"],
        case["lo"],
    )
    np.testing.assert_allclose(np.asarray(got.scores), np.asarray(ref.scores),
                               rtol=1e-12)
    np.testing.assert_array_equal(
        np.asarray(got.positions), np.asarray(ref.positions)
    )
    np.testing.assert_array_equal(
        np.asarray(got.labels), np.asarray(ref.labels)
    )


def test_vp_fcc_forward(case):
    mesh = make_mesh(axis_names=("model",))
    ref = fcc_score(case["trans"], case["inputs"], case["li"])
    got = fcc_score_vp(mesh, case["trans"], case["inputs"], case["li"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-10)


def test_vp_asg_loss_and_grads(case):
    mesh = make_mesh(axis_names=("model",))
    ref = asg_loss(
        case["trans"], case["inputs"], case["targets"], case["li"], case["lo"],
        reduction="none",
    )
    got = asg_loss_vp(
        mesh, case["trans"], case["inputs"], case["targets"], case["li"],
        case["lo"], reduction="none",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-10)

    def vp_loss(trans, inputs):
        return asg_loss_vp(
            mesh, trans, inputs, case["targets"], case["li"], case["lo"],
            reduction="sum",
        )

    def ref_loss(trans, inputs):
        return asg_loss(
            trans, inputs, case["targets"], case["li"], case["lo"],
            reduction="sum",
        )

    g_vp = jax.grad(vp_loss, argnums=(0, 1))(case["trans"], case["inputs"])
    g_ref = jax.grad(ref_loss, argnums=(0, 1))(case["trans"], case["inputs"])
    np.testing.assert_allclose(
        np.asarray(g_vp[0]), np.asarray(g_ref[0]), rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(g_vp[1]), np.asarray(g_ref[1]), rtol=1e-9, atol=1e-12
    )


def test_vp_on_2d_mesh(case):
    # The model axis of a composed 4x2 mesh: asg_loss_vp shards labels over
    # 'model' (size 2) while staying replicated over 'data'.
    mesh = make_mesh((4, 2), ("data", "model"))
    ref = asg_loss(
        case["trans"], case["inputs"], case["targets"], case["li"], case["lo"],
        reduction="none",
    )
    got = asg_loss_vp(
        mesh, case["trans"], case["inputs"], case["targets"], case["li"],
        case["lo"], reduction="none",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-10)


def test_vp_accepts_bf16_and_wide_targets(rng):
    """asg_loss_vp normalizes inputs like asg_loss: bf16 upcast and S>T
    clamp (regression: bf16 crashed the scan carry; S>T gave inf/NaN)."""
    mesh = make_mesh((4,), ("model",), devices=jax.devices("cpu")[:4])
    t_total, num_batches, num_labels, s_total = 6, 2, 8, 10  # S > T
    inputs = jnp.asarray(
        rng.normal(size=(t_total, num_batches, num_labels)), jnp.bfloat16
    )
    trans = jnp.asarray(rng.normal(size=(num_labels, num_labels)) * 0.3,
                        jnp.float32)
    targets = jnp.asarray(
        rng.integers(0, num_labels, size=(num_batches, s_total)), jnp.int32
    )
    loss = asg_loss_vp(mesh, trans, inputs, targets, reduction="none")
    assert np.all(np.isfinite(np.asarray(loss, np.float32)))
    ref = asg_loss(
        trans, inputs.astype(jnp.float32), targets, reduction="none",
        impl="scan",
    )
    np.testing.assert_allclose(np.asarray(loss, np.float32), ref, rtol=2e-2,
                               atol=1e-2)


def test_vp_degenerate_element_does_not_nan_shared_grads(rng):
    """One element with an all -inf frame (no valid path, score = -inf)
    must not contaminate the SHARED transition gradient of the others
    (regression: exp(gamma - score) was -inf - -inf = NaN, and NaN*0
    poisoned dT for the whole batch even with that element's cotangent
    zeroed).  Mirrors the single-chip masked_softmax semantics."""
    mesh = make_mesh((4,), ("model",), devices=jax.devices("cpu")[:4])
    T, B, S, N = 8, 3, 3, 8
    inputs = np.asarray(rng.normal(size=(T, B, N)))
    inputs[4, 1, :] = -np.inf  # element 1: unreachable frame
    inputs = jnp.asarray(inputs)
    trans = jnp.asarray(rng.normal(size=(N, N)) * 0.3)
    targets = jnp.asarray(rng.integers(0, N, size=(B, S)), jnp.int32)
    keep = jnp.asarray([1.0, 0.0, 1.0])  # mask the degenerate element out

    def masked_loss(tr, x):
        per = asg_loss_vp(mesh, tr, x, targets, reduction="none")
        return jnp.sum(jnp.where(keep > 0, per, 0.0))

    loss, (gt, gi) = jax.value_and_grad(masked_loss, argnums=(0, 1))(
        trans, inputs
    )
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(gt)).all()
    gi = np.asarray(gi)
    assert np.isfinite(gi[:, 0]).all() and np.isfinite(gi[:, 2]).all()
    # parity with the single-chip scan path on the same masked objective
    def masked_ref(tr, x):
        per = asg_loss(tr, x, targets, reduction="none", impl="scan")
        return jnp.sum(jnp.where(keep > 0, per, 0.0))

    loss_r, (gt_r, gi_r) = jax.value_and_grad(masked_ref, argnums=(0, 1))(
        trans, inputs
    )
    np.testing.assert_allclose(float(loss), float(loss_r), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(gt_r), rtol=1e-8,
                               atol=1e-10)


def test_vp_unknown_reduction_raises(case):
    mesh = make_mesh((4,), ("model",), devices=jax.devices("cpu")[:4])
    with pytest.raises(ValueError, match="reduction"):
        asg_loss_vp(
            mesh, case["trans"], case["inputs"], case["targets"],
            case["li"], case["lo"], reduction="avg",
        )


def test_dp_unknown_reduction_raises(case):
    mesh = make_mesh()
    with pytest.raises(ValueError, match="reduction"):
        asg_loss_dp(
            mesh, case["trans"], case["inputs"], case["targets"],
            case["li"], case["lo"], reduction="avg",
        )
