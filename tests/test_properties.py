"""Property-based invariants of the ASG criterion.

These hold for ANY inputs by the math, so they make cheap wide-coverage
tests: the loss is a log-partition difference over nested path sets, hence
always >= 0; temperature scaling commutes the way the tech report's
generalized semiring says; impl dispatch degrades gracefully.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_asg_tpu import ASGLoss, asg_loss
from torch_asg_tpu.asg import _FUSED_MAX_WIDTH, _resolve_impl


def _case(rng, t_total, num_batches, s_total, num_labels):
    inputs = jnp.asarray(rng.normal(size=(t_total, num_batches, num_labels)) * 3)
    trans = jnp.asarray(rng.normal(size=(num_labels, num_labels)))
    targets = jnp.asarray(
        rng.integers(0, num_labels, size=(num_batches, s_total)), jnp.int32
    )
    li = jnp.asarray(
        rng.integers(s_total, t_total + 1, size=(num_batches,)), jnp.int32
    )
    lo = jnp.asarray(rng.integers(1, s_total + 1, size=(num_batches,)), jnp.int32)
    return trans, inputs, targets, li, lo


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("impl", ["scan", "fused"])
def test_loss_nonnegative(seed, impl):
    """The aligned paths are a subset of all paths: full >= aligned."""
    rng = np.random.default_rng(seed)
    trans, inputs, targets, li, lo = _case(rng, 14, 4, 5, 7)
    loss = asg_loss(trans, inputs, targets, li, lo, reduction="none", impl=impl)
    assert np.all(np.asarray(loss) >= -1e-9), loss


def test_temperature_identity(rng):
    """tau = 1 equals the plain loss; tau scaling = tau * loss(x / tau)."""
    trans, inputs, targets, li, lo = _case(rng, 11, 3, 4, 6)
    base = asg_loss(trans, inputs, targets, li, lo, reduction="none", impl="scan")
    t1 = asg_loss(
        trans, inputs, targets, li, lo, reduction="none", impl="scan",
        temperature=1.0,
    )
    np.testing.assert_allclose(t1, base, rtol=1e-12)
    tau = 0.5
    scaled = asg_loss(
        trans, inputs, targets, li, lo, reduction="none", impl="scan",
        temperature=tau,
    )
    manual = tau * asg_loss(
        trans / tau, inputs / tau, targets, li, lo, reduction="none", impl="scan"
    )
    np.testing.assert_allclose(scaled, manual, rtol=1e-10)


def test_temperature_approaches_viterbi(rng):
    """tau -> 0 approaches the tropical (max) semiring loss."""
    from torch_asg_tpu import viterbi_align, viterbi_decode

    trans, inputs, targets, li, lo = _case(rng, 11, 2, 4, 6)
    tau = 1e-3
    loss_tau = asg_loss(
        trans, inputs, targets, li, lo, reduction="none", impl="scan",
        temperature=tau,
    )
    best_full = viterbi_decode(trans, inputs, li).scores
    best_ali = viterbi_align(trans, inputs, targets, li, lo).scores
    np.testing.assert_allclose(loss_tau, best_full - best_ali, atol=0.05)


def test_module_temperature_matches_functional(rng):
    trans, inputs, targets, li, lo = _case(rng, 9, 2, 3, 5)
    m = ASGLoss.create(5, temperature=2.0, impl="scan")
    m = m.__class__(**{**m.__dict__, "transition": trans})
    out_m = m(inputs, targets, li, lo)
    out_f = asg_loss(
        trans, inputs, targets, li, lo, reduction="mean", impl="scan",
        temperature=2.0,
    )
    np.testing.assert_allclose(out_m, out_f, rtol=1e-12)


def test_auto_falls_back_for_wide_vocab():
    """'auto' must not route giant vocabularies at the VMEM-resident kernel;
    they go to the matmul formulation (no (B, N, N) materialization)."""
    fn_small = _resolve_impl("auto", 30, 50)
    fn_big = _resolve_impl("auto", _FUSED_MAX_WIDTH + 1, 50)
    assert fn_small.__name__ == "asg_scores_fused"
    assert fn_big.__name__ == "scores_matmul"


@pytest.mark.parametrize("impl", ["scan", "pallas", "fused"])
def test_neg_inf_transitions_stay_finite(rng, impl):
    """-inf transition entries (forbidden bigrams) are legal log-semiring
    values: losses/grads of untouched paths must stay finite, never NaN
    (regression: the one-hot transition gather once produced 0 * -inf)."""
    trans, inputs, targets, li, lo = _case(rng, 10, 3, 4, 6)
    # forbid a bigram no target uses: labels are in [0, 6); pick (5 -> 5)
    # only if 5 is never followed by 5 in targets; force targets clear
    targets = jnp.where(targets == 5, 4, targets)
    trans = trans.at[5, 5].set(float("-inf"))
    loss = asg_loss(trans, inputs, targets, li, lo, reduction="none", impl=impl)
    assert np.all(np.isfinite(np.asarray(loss))), loss
    g = jax.grad(
        lambda tr, i: asg_loss(tr, i, targets, li, lo, reduction="sum",
                               impl=impl),
        (0, 1),
    )(trans, inputs)
    assert not np.any(np.isnan(np.asarray(g[0])))
    assert not np.any(np.isnan(np.asarray(g[1])))
    # parity with the scan oracle under the same forbidden bigram
    ref = asg_loss(trans, inputs, targets, li, lo, reduction="none",
                   impl="scan")
    np.testing.assert_allclose(loss, ref, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("impl", ["scan", "fused"])
def test_loss_zero_iff_single_path(rng, impl):
    """With one target spanning every frame via forced self-loops and a
    one-hot-certain emission sequence, full ~= aligned (loss -> 0 as the
    emissions sharpen)."""
    t_total, num_labels = 6, 4
    scale = 30.0
    emis = np.full((t_total, 1, num_labels), -scale, np.float64)
    emis[:, 0, 2] = scale  # label 2 certain at every frame
    inputs = jnp.asarray(emis)
    trans = jnp.zeros((num_labels, num_labels))
    targets = jnp.asarray([[2]], jnp.int32)
    loss = asg_loss(
        trans, inputs, targets,
        jnp.asarray([t_total], jnp.int32), jnp.asarray([1], jnp.int32),
        reduction="none", impl=impl,
    )
    assert float(loss[0]) >= -1e-9
    assert float(loss[0]) < 1e-6  # all competing paths are ~e^-60 down


@pytest.mark.parametrize("seed", range(2))
def test_matmul_impl_matches_scan(rng, seed):
    """impl='matmul' (the large-vocab formulation) is exact vs the oracle."""
    r = np.random.default_rng(seed)
    trans, inputs, targets, li, lo = _case(r, 13, 3, 5, 7)
    l_s = asg_loss(trans, inputs, targets, li, lo, reduction="none", impl="scan")
    l_m = asg_loss(trans, inputs, targets, li, lo, reduction="none",
                   impl="matmul")
    np.testing.assert_allclose(l_m, l_s, rtol=1e-10, atol=1e-10)
    gs = jax.grad(lambda tr, i: asg_loss(tr, i, targets, li, lo, impl="scan"),
                  (0, 1))(trans, inputs)
    gm = jax.grad(lambda tr, i: asg_loss(tr, i, targets, li, lo,
                                         impl="matmul"), (0, 1))(trans, inputs)
    np.testing.assert_allclose(gm[0], gs[0], rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(gm[1], gs[1], rtol=1e-9, atol=1e-11)


def test_gather_branch_matches_onehot(rng, monkeypatch):
    """The large-N gather branch of make_aligned/scatter_to_full is exact
    vs the one-hot matmul branch (forced via the threshold)."""
    from torch_asg_tpu.ops import fac as fac_mod

    trans, inputs, targets, li, lo = _case(rng, 12, 3, 4, 6)
    trans = trans.at[5, 5].set(float("-inf"))  # -inf flows through gathers
    targets = jnp.where(targets == 5, 4, targets)

    def run():
        l = asg_loss(trans, inputs, targets, li, lo, reduction="none",
                     impl="matmul")
        g = jax.grad(
            lambda tr, i: asg_loss(tr, i, targets, li, lo, reduction="sum",
                                   impl="matmul"), (0, 1)
        )(trans, inputs)
        return l, g

    l_onehot, g_onehot = run()
    monkeypatch.setattr(fac_mod, "_ONEHOT_MAX_LABELS", 2)
    l_gather, g_gather = run()
    np.testing.assert_allclose(l_gather, l_onehot, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(g_gather[0], g_onehot[0], rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(g_gather[1], g_onehot[1], rtol=1e-9, atol=1e-11)


def test_auto_uses_matmul_for_wide_vocab():
    from torch_asg_tpu.asg import _resolve_impl

    fn = _resolve_impl("auto", 10000, 50)
    assert fn.__name__ == "scores_matmul"
