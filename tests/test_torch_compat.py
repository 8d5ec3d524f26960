"""torch_compat.ASGLoss: the torch-autograd front-end over the JAX
kernels.  Parity is against this package's own asg_loss/jax.grad (which
are themselves pinned against the reference binary at 1e-9 in
tests/test_reference_native.py), plus torch-native contracts the JAX
front-ends cannot express: .backward(), optimizer steps, gradcheck,
eval-mode backward raising like the reference module."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from torch_asg_tpu import asg_loss
from torch_asg_tpu.torch_compat import ASGLoss, _ASGLossFn


def _case(rng, t_total=6, num_batches=2, s_total=3, num_labels=5):
    inputs = rng.normal(size=(t_total, num_batches, num_labels))
    trans = rng.normal(size=(num_labels, num_labels)) * 0.5
    targets = rng.integers(0, num_labels, size=(num_batches, s_total))
    li = np.asarray([t_total, t_total - 1], np.int64)
    lo = np.asarray([s_total, s_total - 1], np.int64)
    return trans, inputs, targets, li, lo


@pytest.mark.parametrize("reduction", ["mean", "sum", "none"])
def test_loss_and_grads_match_jax(rng, reduction):
    trans, inputs, targets, li, lo = _case(rng)
    crit = ASGLoss(num_labels=5, reduction=reduction, impl="scan")
    with torch.no_grad():
        crit.transition.copy_(torch.from_numpy(trans).float())
    t_in = torch.from_numpy(inputs).float().requires_grad_(True)
    loss = crit(t_in, torch.from_numpy(targets),
                torch.from_numpy(li), torch.from_numpy(lo))

    def jf(tr, i):
        return asg_loss(tr, i, jnp.asarray(targets, jnp.int32),
                        jnp.asarray(li, jnp.int32),
                        jnp.asarray(lo, jnp.int32),
                        reduction=reduction, impl="scan")

    tr32 = jnp.asarray(trans, jnp.float32)
    in32 = jnp.asarray(inputs, jnp.float32)
    want = np.asarray(jf(tr32, in32))
    np.testing.assert_allclose(loss.detach().numpy(), want, rtol=1e-5)

    if reduction == "none":
        ct = rng.normal(size=loss.shape)
        loss.backward(torch.from_numpy(ct).float())
        _, vjp = jax.vjp(jf, tr32, in32)
        gt_want, gi_want = vjp(jnp.asarray(ct, jnp.float32))
    else:
        loss.backward()
        gt_want, gi_want = jax.grad(lambda tr, i: jf(tr, i),
                                    argnums=(0, 1))(tr32, in32)
    np.testing.assert_allclose(crit.transition.grad.numpy(),
                               np.asarray(gt_want), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(t_in.grad.numpy(),
                               np.asarray(gi_want), rtol=1e-4, atol=1e-6)


def test_fused_tier_matches_scan_through_torch(rng):
    """impl='auto' (the fused kernels; interpret mode on CPU) through the
    torch bridge agrees with the scan tier end to end."""
    trans, inputs, targets, li, lo = _case(rng)
    losses, grads = {}, {}
    for impl in ("scan", "auto"):
        crit = ASGLoss(num_labels=5, reduction="sum", impl=impl)
        with torch.no_grad():
            crit.transition.copy_(torch.from_numpy(trans).float())
        t_in = torch.from_numpy(inputs).float().requires_grad_(True)
        loss = crit(t_in, torch.from_numpy(targets),
                    torch.from_numpy(li), torch.from_numpy(lo))
        loss.backward()
        losses[impl] = float(loss)
        grads[impl] = (crit.transition.grad.numpy(), t_in.grad.numpy())
    np.testing.assert_allclose(losses["auto"], losses["scan"], rtol=1e-4)
    for a, b in zip(grads["auto"], grads["scan"]):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)


def test_gradcheck_fp64(rng):
    """torch.autograd.gradcheck over the bridge in double precision —
    the torch-native equivalent of the suite's fp64 gradchecks."""
    trans, inputs, targets, li, lo = _case(rng, t_total=5, num_batches=2,
                                           s_total=2, num_labels=4)
    t64 = torch.from_numpy(trans).double().requires_grad_(True)
    i64 = torch.from_numpy(inputs).double().requires_grad_(True)
    tgt = torch.from_numpy(targets)
    config = ("sum", "scan", 1.0)

    def fn(t, i):
        return _ASGLossFn.apply(t, i, tgt, torch.from_numpy(li),
                                torch.from_numpy(lo), config)

    assert torch.autograd.gradcheck(fn, (t64, i64), eps=1e-6, atol=1e-7,
                                    rtol=1e-5)


def test_eval_mode_backward_raises_like_reference(rng):
    """forward_only / .eval() run under no_grad: .backward() errors, the
    reference's eval-mode contract (torch_asg/asg.py:129) — which the
    JAX compat shim can only approximate with zero grads."""
    trans, inputs, targets, li, lo = _case(rng)
    crit = ASGLoss(num_labels=5, reduction="mean")
    with torch.no_grad():
        crit.transition.copy_(torch.from_numpy(trans).float())
    t_in = torch.from_numpy(inputs).float().requires_grad_(True)

    crit.eval()
    loss_eval = crit(t_in, torch.from_numpy(targets),
                     torch.from_numpy(li), torch.from_numpy(lo))
    assert not loss_eval.requires_grad
    with pytest.raises(RuntimeError):
        loss_eval.backward()

    crit.train()
    loss_train = crit(t_in, torch.from_numpy(targets),
                      torch.from_numpy(li), torch.from_numpy(lo))
    np.testing.assert_allclose(float(loss_eval), float(loss_train),
                               rtol=1e-6)

    # forward_only=True behaves as permanently-eval
    crit_fo = ASGLoss(num_labels=5, forward_only=True)
    with torch.no_grad():
        crit_fo.transition.copy_(torch.from_numpy(trans).float())
    out = crit_fo(t_in, torch.from_numpy(targets),
                  torch.from_numpy(li), torch.from_numpy(lo))
    assert not out.requires_grad


def test_optimizer_step_learns(rng):
    """A plain torch training loop (SGD on the transition + the inputs
    treated as logits) drives the loss down — grads really flow."""
    trans, inputs, targets, li, lo = _case(rng)
    crit = ASGLoss(num_labels=5, reduction="mean", impl="scan")
    t_in = torch.nn.Parameter(torch.from_numpy(inputs).float())
    opt = torch.optim.SGD(list(crit.parameters()) + [t_in], lr=0.5)
    losses = []
    for _ in range(8):
        opt.zero_grad()
        loss = crit(t_in, torch.from_numpy(targets),
                    torch.from_numpy(li), torch.from_numpy(lo))
        loss.backward()
        opt.step()
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.1, losses
    assert not crit.transition.detach().eq(0).all()  # parameter moved


def test_spread_guard_through_torch(rng):
    trans, inputs, targets, li, lo = _case(rng)
    crit = ASGLoss(num_labels=5, reduction="mean", impl="fused")
    with torch.no_grad():
        crit.transition[0, 0] = 150.0
    t_in = torch.from_numpy(inputs).float()
    with pytest.raises(ValueError, match="spread"):
        crit(t_in, torch.from_numpy(targets), torch.from_numpy(li),
             torch.from_numpy(lo))
    # 'auto' reroutes to the log-domain tier: finite loss
    crit_auto = ASGLoss(num_labels=5, reduction="mean")
    with torch.no_grad():
        crit_auto.transition[0, 0] = 150.0
    out = crit_auto(t_in, torch.from_numpy(targets),
                    torch.from_numpy(li), torch.from_numpy(lo))
    assert np.isfinite(float(out))


def test_state_dict_roundtrip(rng):
    crit = ASGLoss(num_labels=5)
    with torch.no_grad():
        crit.transition.copy_(torch.randn(5, 5))
    sd = crit.state_dict()
    assert "transition" in sd
    crit2 = ASGLoss(num_labels=5)
    crit2.load_state_dict(sd)
    assert torch.equal(crit2.transition, crit.transition)


def test_default_lengths_and_list_inputs(rng):
    """None lengths default to full, mirroring asg_loss._prep; numpy
    targets work without explicit torch conversion."""
    trans, inputs, targets, li, lo = _case(rng)
    crit = ASGLoss(num_labels=5, reduction="none", impl="scan")
    with torch.no_grad():
        crit.transition.copy_(torch.from_numpy(trans).float())
    t_in = torch.from_numpy(inputs).float()
    got = crit(t_in, targets)  # numpy targets, no lengths
    want = np.asarray(asg_loss(
        jnp.asarray(trans, jnp.float32), jnp.asarray(inputs, jnp.float32),
        jnp.asarray(targets, jnp.int32), reduction="none", impl="scan"))
    np.testing.assert_allclose(got.detach().numpy(), want, rtol=1e-5)


def test_bf16_inputs_upcast(rng):
    """bf16/f16 emission tensors work (Tensor.numpy() rejects them raw);
    the criterion boundary upcasts like asg_loss does for JAX arrays."""
    trans, inputs, targets, li, lo = _case(rng)
    crit = ASGLoss(num_labels=5, reduction="mean", impl="scan")
    with torch.no_grad():
        crit.transition.copy_(torch.from_numpy(trans).float())
    t_in = torch.from_numpy(inputs).bfloat16().requires_grad_(True)
    loss = crit(t_in, torch.from_numpy(targets),
                torch.from_numpy(li), torch.from_numpy(lo))
    loss.backward()
    assert loss.dtype == torch.bfloat16
    assert t_in.grad is not None and t_in.grad.dtype == torch.bfloat16
    want = float(asg_loss(
        jnp.asarray(trans, jnp.float32),
        jnp.asarray(np.asarray(torch.from_numpy(inputs).bfloat16().float()),
                    jnp.float32),
        jnp.asarray(targets, jnp.int32), jnp.asarray(li, jnp.int32),
        jnp.asarray(lo, jnp.int32), reduction="mean", impl="scan"))
    np.testing.assert_allclose(float(loss), want, rtol=1e-2)


def test_double_backward_raises_loudly(rng):
    """The bridge's grads are JAX-computed constants to torch autograd;
    create_graph=True must fail loudly instead of silently dropping this
    term's curvature from a mixed objective.  (once_differentiable would
    NOT catch this: it only errors when the cotangent requires grad,
    which a loss head's never does — the explicit grad-mode check in
    backward is the reliable signal.)"""
    trans, inputs, targets, li, lo = _case(rng)
    crit = ASGLoss(num_labels=5, reduction="sum", impl="scan")
    t_in = torch.from_numpy(inputs).float().requires_grad_(True)
    loss = crit(t_in, torch.from_numpy(targets),
                torch.from_numpy(li), torch.from_numpy(lo))
    mixed = loss + (t_in ** 2).sum()
    with pytest.raises(RuntimeError, match="twice"):
        torch.autograd.grad(mixed, t_in, create_graph=True)
    # ... and the ordinary first-order path is untouched
    (g,) = torch.autograd.grad(loss + (t_in ** 2).sum(), t_in)
    assert np.isfinite(g.numpy()).all()


def test_load_reference_transition_roundtrip(rng, tmp_path):
    """Migration hand-off: a reference-format checkpoint (the single
    'transition' nn.Parameter key, torch_asg/asg.py:105) loads via the
    helper (dict and file forms, incl. nested prefix) AND drops straight
    into torch_compat.ASGLoss.load_state_dict."""
    from torch_asg_tpu.torch_compat import load_reference_transition

    n = 6
    ref_t = torch.from_numpy(rng.normal(size=(n, n)).astype(np.float32))
    sd = {"transition": ref_t}

    got = load_reference_transition(sd)
    np.testing.assert_array_equal(got, ref_t.numpy())

    p = tmp_path / "ref_ckpt.pt"
    torch.save(sd, p)
    np.testing.assert_array_equal(load_reference_transition(p), ref_t.numpy())

    nested = {"criterion.transition": ref_t, "encoder.w": torch.zeros(2)}
    np.testing.assert_array_equal(
        load_reference_transition(nested, prefix="criterion."), ref_t.numpy())
    with pytest.raises(KeyError, match="transition"):
        load_reference_transition(nested)

    # drop-in load_state_dict on the torch front-end (same param name)
    crit = ASGLoss(num_labels=n, reduction="none", impl="scan")
    crit.load_state_dict(sd)
    np.testing.assert_array_equal(
        crit.transition.detach().numpy(), ref_t.numpy())
    # and the JAX value matches what asg_loss would consume
    trans_j = jnp.asarray(load_reference_transition(sd))
    r2 = np.random.default_rng(3)
    inputs = r2.normal(size=(7, 2, n)).astype(np.float32)
    targets = r2.integers(0, n, size=(2, 3))
    want = asg_loss(trans_j, jnp.asarray(inputs),
                    jnp.asarray(targets, jnp.int32), reduction="none",
                    impl="scan")
    crit_out = crit(torch.from_numpy(inputs), torch.from_numpy(targets))
    np.testing.assert_allclose(crit_out.detach().numpy(),
                               np.asarray(want), rtol=1e-5)
