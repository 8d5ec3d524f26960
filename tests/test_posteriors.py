"""Posterior marginals: gradient identities pin the implementation."""

import jax
import jax.numpy as jnp
import numpy as np

from torch_asg_tpu import fac_posteriors, fcc_posteriors
from torch_asg_tpu.ops.fac import fac_score
from torch_asg_tpu.ops.fcc import fcc_score


def _case(rng, t_total=12, num_batches=3, s_total=4, num_labels=6):
    inputs = jnp.asarray(rng.normal(size=(t_total, num_batches, num_labels)))
    trans = jnp.asarray(rng.normal(size=(num_labels, num_labels)) * 0.5)
    targets = jnp.asarray(
        rng.integers(0, num_labels, size=(num_batches, s_total)), jnp.int32
    )
    li = jnp.asarray([12, 8, 10], jnp.int32)
    lo = jnp.asarray([4, 2, 3], jnp.int32)
    return trans, inputs, targets, li, lo


def test_fcc_posteriors_are_score_gradients(rng):
    trans, inputs, targets, li, lo = _case(rng)
    post = fcc_posteriors(trans, inputs, li)
    grad = jax.grad(lambda i: fcc_score(trans, i, li).sum())(inputs)
    np.testing.assert_allclose(post, grad, rtol=1e-10, atol=1e-12)
    # valid frames sum to 1; invalid frames are exactly 0
    sums = np.asarray(post.sum(axis=2))
    tmask = np.arange(12)[:, None] < np.asarray(li)[None, :]
    np.testing.assert_allclose(sums[tmask], 1.0, rtol=1e-9)
    np.testing.assert_allclose(sums[~tmask], 0.0)


def test_fac_posteriors_are_soft_alignments(rng):
    trans, inputs, targets, li, lo = _case(rng)
    post = fac_posteriors(trans, inputs, targets, li, lo)
    sums = np.asarray(post.sum(axis=2))
    tmask = np.arange(12)[:, None] < np.asarray(li)[None, :]
    np.testing.assert_allclose(sums[tmask], 1.0, rtol=1e-9)
    np.testing.assert_allclose(sums[~tmask], 0.0)
    # monotone support: mass must concentrate on reachable (t, s) cells;
    # slot s is unreachable before frame s
    for s in range(4):
        np.testing.assert_allclose(np.asarray(post[:s, :, s]), 0.0)


def test_fac_posteriors_peak_matches_viterbi(rng):
    """In a sharply-peaked lattice, the soft alignment's argmax follows
    the Viterbi alignment."""
    from torch_asg_tpu import viterbi_align

    trans, inputs, targets, li, lo = _case(rng)
    sharp = inputs * 20.0  # low temperature -> near-deterministic paths
    post = fac_posteriors(trans, sharp, targets, li, lo)
    ali = viterbi_align(trans, sharp, targets, li, lo)
    post_np = np.asarray(post)
    pos_np = np.asarray(ali.positions)
    li_np = np.asarray(li)
    agree = total = 0
    for b in range(post_np.shape[1]):
        for t in range(li_np[b]):
            total += 1
            agree += int(post_np[t, b].argmax() == pos_np[t, b])
    assert agree / total > 0.8


def test_posteriors_differentiate_nan_free_on_ragged(rng):
    """The posteriors API is advertised for distillation losses, so
    jax.grad THROUGH it must be NaN-free on ragged batches (regression:
    logsumexp's vjp produced 0*inf = NaN on all -inf rows past each
    utterance's length)."""
    T, B, N, S = 8, 3, 5, 3
    inputs = jnp.asarray(rng.normal(size=(T, B, N)))
    trans = jnp.asarray(rng.normal(size=(N, N)) * 0.5)
    targets = jnp.asarray(rng.integers(0, N, size=(B, S)), jnp.int32)
    li = jnp.asarray([8, 5, 2], jnp.int32)
    lo = jnp.asarray([3, 2, 1], jnp.int32)
    teacher = jax.nn.softmax(jnp.asarray(rng.normal(size=(T, B, N))), axis=2)

    def distill(x):
        p = fcc_posteriors(trans, x, li)
        return jnp.sum((p - teacher) ** 2)

    g = jax.grad(distill)(inputs)
    assert np.isfinite(np.asarray(g)).all()

    def distill_fac(x):
        p = fac_posteriors(trans, x, targets, li, lo)
        return jnp.sum(p ** 2)

    g2 = jax.grad(distill_fac)(inputs)
    assert np.isfinite(np.asarray(g2)).all()


def test_fcc_posteriors_large_vocab_matmul_parity(rng, monkeypatch):
    """Above the width threshold the matmul scans take over (regression:
    the (B, N, N)-per-step forms OOM at wordpiece scale); both forms must
    agree exactly in fp64."""
    from torch_asg_tpu.ops import posteriors as post_mod

    T, B, N = 7, 2, 9
    inputs = jnp.asarray(rng.normal(size=(T, B, N)))
    trans = jnp.asarray(rng.normal(size=(N, N)) * 0.5)
    li = jnp.asarray([7, 4], jnp.int32)
    ref = fcc_posteriors(trans, inputs, li)
    monkeypatch.setattr(post_mod, "_MM_MIN_LABELS", 4)
    got = fcc_posteriors(trans, inputs, li)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-9,
                               atol=1e-12)


def test_posteriors_temperature_equals_scaled_inputs(rng):
    """posteriors(..., temperature=tau) == posteriors(T/tau, I/tau): the
    generalized-semiring scaling of tech_report.tex:78-88 applied to the
    marginals (VERDICT r2 item 8)."""
    trans, inputs, targets, li, lo = _case(rng)
    tau = 2.5
    soft = fcc_posteriors(trans, inputs, li, temperature=tau)
    manual = fcc_posteriors(trans / tau, inputs / tau, li)
    np.testing.assert_allclose(soft, manual, rtol=1e-12)

    soft_a = fac_posteriors(trans, inputs, targets, li, lo, temperature=tau)
    manual_a = fac_posteriors(trans / tau, inputs / tau, targets, li, lo)
    np.testing.assert_allclose(soft_a, manual_a, rtol=1e-12)

    # tau = 1 is the identity
    np.testing.assert_allclose(
        fcc_posteriors(trans, inputs, li, temperature=1.0),
        fcc_posteriors(trans, inputs, li),
        rtol=1e-15,
    )


def test_posteriors_temperature_zero_limit_is_viterbi_occupancy(rng):
    """tau -> 0 sharpens the marginals to the one-hot occupancy of the
    best path (FCC) / best monotone alignment (FAC)."""
    from torch_asg_tpu import viterbi_align, viterbi_decode

    trans, inputs, targets, li, lo = _case(rng)
    # adjacent-distinct targets: a repeated label makes several monotone
    # alignments EXACTLY tie (the boundary between identical labels can
    # shift freely), and the tau -> 0 posterior then splits mass
    # uniformly over the tied set instead of going one-hot
    targets = jnp.asarray(
        (np.cumsum(np.asarray(targets) % (trans.shape[0] - 1) + 1, axis=1))
        % trans.shape[0],
        jnp.int32,
    )
    tau = 1e-3
    t_total, num_batches = inputs.shape[0], inputs.shape[1]

    post = fcc_posteriors(trans, inputs, li, temperature=tau)
    path = np.asarray(viterbi_decode(trans, inputs, li).paths)
    tmask = np.arange(t_total)[:, None] < np.asarray(li)[None, :]
    onehot = np.zeros_like(np.asarray(post))
    for b in range(num_batches):
        for t in range(t_total):
            if tmask[t, b]:
                onehot[t, b, path[t, b]] = 1.0
    np.testing.assert_allclose(np.asarray(post), onehot, atol=1e-6)

    post_a = fac_posteriors(trans, inputs, targets, li, lo, temperature=tau)
    ali = np.asarray(viterbi_align(trans, inputs, targets, li, lo).positions)
    onehot_a = np.zeros_like(np.asarray(post_a))
    for b in range(num_batches):
        for t in range(t_total):
            if tmask[t, b] and ali[t, b] >= 0:
                onehot_a[t, b, ali[t, b]] = 1.0
    np.testing.assert_allclose(np.asarray(post_a), onehot_a, atol=1e-6)


def test_posteriors_temperature_validation(rng):
    import pytest

    trans, inputs, targets, li, lo = _case(rng)
    with pytest.raises(ValueError, match="temperature"):
        fcc_posteriors(trans, inputs, li, temperature=0.0)
    with pytest.raises(ValueError, match="temperature"):
        fac_posteriors(trans, inputs, targets, li, lo, temperature=-1.0)


# ---------------------------------------------------------------------------
# posterior_decode: the minimum-frame-risk decode (VERDICT r3 stretch
# item 8 — the log<->tropical interpolated decode surface).
# ---------------------------------------------------------------------------


def test_posterior_decode_is_argmax_of_posteriors(rng):
    from torch_asg_tpu import posterior_decode

    trans, inputs, targets, li, lo = _case(rng)
    res = posterior_decode(trans, inputs, li, impl="scan")
    post = np.asarray(fcc_posteriors(trans, inputs, li))
    tmask = np.arange(12)[:, None] < np.asarray(li)[None, :]
    want = post.argmax(axis=2)
    got = np.asarray(res.paths)
    np.testing.assert_array_equal(got[tmask], want[tmask])
    assert (got[~tmask] == -1).all()
    np.testing.assert_allclose(
        np.asarray(res.scores),
        np.where(tmask, post.max(axis=2), 0.0).sum(axis=0),
        rtol=1e-10,
    )
    # scores are expected-correct-frame counts: bounded by the lengths
    assert (np.asarray(res.scores) <= np.asarray(li) + 1e-9).all()
    assert (np.asarray(res.scores) > 0).all()


def test_posterior_decode_pallas_matches_scan(rng):
    """The kernel-gradient path (posteriors == d fcc_score / d inputs
    through the Pallas custom_vjp) decodes identically to the scan
    oracle."""
    from torch_asg_tpu import posterior_decode

    trans, inputs, targets, li, lo = _case(rng)
    inputs32 = inputs.astype(jnp.float32)
    a = posterior_decode(trans, inputs32, li, impl="scan")
    b = posterior_decode(trans, inputs32, li, impl="pallas")
    np.testing.assert_array_equal(np.asarray(a.paths), np.asarray(b.paths))
    np.testing.assert_allclose(a.scores, b.scores, rtol=1e-4)


def test_posterior_decode_tau_to_zero_recovers_viterbi(rng):
    from torch_asg_tpu import posterior_decode, viterbi_decode

    trans, inputs, targets, li, lo = _case(rng)
    vit = viterbi_decode(trans, inputs, li)
    mbr = posterior_decode(trans, inputs, li, temperature=0.05, impl="scan")
    np.testing.assert_array_equal(np.asarray(mbr.paths), np.asarray(vit.paths))
    # ... and the concentrated posterior mass approaches one per frame
    # (0.97-0.98/frame at tau=0.05 on this case; exact only as tau -> 0)
    np.testing.assert_allclose(
        np.asarray(mbr.scores), np.asarray(li, np.float64), rtol=0.05
    )
    assert (np.asarray(mbr.scores) <= np.asarray(li) + 1e-9).all()


def test_posterior_decode_validation(rng):
    import pytest

    from torch_asg_tpu import posterior_decode

    trans, inputs, targets, li, lo = _case(rng)
    with pytest.raises(ValueError, match="impl"):
        posterior_decode(trans, inputs, li, impl="nope")
    with pytest.raises(ValueError, match="temperature"):
        posterior_decode(trans, inputs, li, temperature=0.0)


def test_posterior_decode_spread_guard(rng):
    """The pallas tier shares asg_loss's exp-domain spread guard: eager
    'auto' reroutes to the log-domain scan, explicit 'pallas' raises,
    and under jit the scores channel comes back NaN (paths are ints and
    cannot carry the poison)."""
    import pytest

    from torch_asg_tpu import posterior_decode

    trans, inputs, targets, li, lo = _case(rng)
    inputs32 = inputs.astype(jnp.float32)
    wide = jnp.asarray(trans, jnp.float32).at[0, 0].set(150.0)

    # eager 'auto': routed to scan, finite and equal to the oracle
    got = posterior_decode(wide, inputs32, li)  # impl='auto'
    want = posterior_decode(wide, inputs32, li, impl="scan")
    np.testing.assert_array_equal(np.asarray(got.paths),
                                  np.asarray(want.paths))
    assert np.isfinite(np.asarray(got.scores)).all()

    # eager explicit 'pallas': loud
    with pytest.raises(ValueError, match="spread"):
        posterior_decode(wide, inputs32, li, impl="pallas")

    # traced: scores NaN-poisoned, healthy transition untouched
    f = jax.jit(lambda tr: posterior_decode(tr, inputs32, li,
                                            impl="pallas"))
    assert np.isnan(np.asarray(f(wide).scores)).all()
    ok = jnp.asarray(trans, jnp.float32)
    want_ok = posterior_decode(ok, inputs32, li, impl="scan")
    np.testing.assert_array_equal(np.asarray(f(ok).paths),
                                  np.asarray(want_ok.paths))
    assert np.isfinite(np.asarray(f(ok).scores)).all()
    # validate=False restores the unguarded dispatch
    res = posterior_decode(wide, inputs32, li, impl="pallas",
                           validate=False)
    assert res.paths.shape == inputs32.shape[:2]


def test_posterior_decode_reroute_correct_under_jit(rng):
    """validate='reroute' under jit must return the CORRECT decode for a
    >60-nat transition (in-graph scan fallback), not NaN scores —
    review-pass fix: the guard's 'reroute' value was being treated as a
    truthy poison flag."""
    from torch_asg_tpu import posterior_decode

    trans, inputs, targets, li, lo = _case(rng)
    inputs32 = inputs.astype(jnp.float32)
    wide = jnp.asarray(trans, jnp.float32).at[0, 0].set(150.0)

    f = jax.jit(lambda tr: posterior_decode(tr, inputs32, li,
                                            impl="pallas",
                                            validate="reroute"))
    got = f(wide)
    want = posterior_decode(wide, inputs32, li, impl="scan")
    assert np.isfinite(np.asarray(got.scores)).all()
    np.testing.assert_array_equal(np.asarray(got.paths),
                                  np.asarray(want.paths))
    np.testing.assert_allclose(np.asarray(got.scores),
                               np.asarray(want.scores), rtol=1e-4)
    # healthy transition through the SAME compiled fn: fast branch
    ok = jnp.asarray(trans, jnp.float32)
    want_ok = posterior_decode(ok, inputs32, li, impl="scan")
    got_ok = f(ok)
    np.testing.assert_array_equal(np.asarray(got_ok.paths),
                                  np.asarray(want_ok.paths))
