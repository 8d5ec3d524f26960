"""Torch front-end: the reference's ``nn.Module`` surface, executing the
TPU kernels inside ``torch.autograd``.

``compat.ASGLoss`` matches the reference's signature but takes JAX
arrays; this module goes the rest of the way for users who keep their
training loop in PyTorch.  ``torch_compat.ASGLoss`` is a real
``torch.nn.Module`` with the transition matrix as an ``nn.Parameter``
(the reference holds it the same way, ``torch_asg/asg.py:101-108``), and
its forward/backward run this package's JAX/Pallas kernels — loss AND
gradients flow back into torch autograd, so ``loss.backward()`` /
``optimizer.step()`` work unchanged:

    from torch_asg_tpu.torch_compat import ASGLoss   # was: from torch_asg

    crit = ASGLoss(num_labels=30, reduction="mean")
    loss = crit(inputs, targets, input_lengths, target_lengths)
    loss.backward()          # d loss / d inputs and / d crit.transition

Bridging is by host round-trip (torch CPU tensor → numpy → JAX device
array and back).  That is the honest contract on this stack — torch in
this environment is CPU-only while the kernels run on TPU, so a
host↔device copy exists either way; for emission tensors it is one
contiguous memcpy each direction per step.  Scalar-reduction losses
('mean'/'sum') compute gradients TOGETHER with the forward (the fused
kernel pair runs once; backward is just the cotangent scale), so
``loss.backward()`` costs no extra device work.  ``reduction='none'``
has a (B,)-vector cotangent unknown at forward time, so its backward
re-dispatches one fused fwd+bwd with the actual cotangent.

Eval semantics match the reference exactly: in ``forward_only`` mode or
after ``.eval()`` the loss is computed under ``torch.no_grad()`` via the
store-less forward-only kernel, and calling ``.backward()`` on it raises
(the reference errors the same way, ``torch_asg/asg.py:129``) — unlike
``compat.ASGLoss`` where JAX's functional autodiff can only return
zeros.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .asg import REDUCTIONS, _spread_guard, asg_loss

try:
    import torch
except ImportError as _e:  # pragma: no cover - torch is baked into CI
    raise ImportError(
        "torch_asg_tpu.torch_compat requires pytorch; install it or use "
        "torch_asg_tpu.compat (JAX-array front-end) instead."
    ) from _e


def _to_jax(x, dtype=None):
    if x is None:
        return None
    if isinstance(x, torch.Tensor):
        x = x.detach().cpu()
        if x.dtype in (torch.bfloat16, torch.float16):
            # Tensor.numpy() rejects bf16/f16; asg_loss upcasts these at
            # the criterion boundary anyway (the TPU norm for encoder
            # outputs), so the cast is semantics-preserving.
            x = x.float()
        x = x.numpy()
    return jnp.asarray(np.asarray(x), dtype)


def _to_torch(x, device, dtype=None):
    # np.array(copy=True): JAX arrays export read-only buffers, which
    # torch.from_numpy would alias (and warn about).
    t = torch.from_numpy(np.array(x, copy=True))
    return t.to(device=device, dtype=dtype) if dtype is not None else t.to(device)


@functools.lru_cache(maxsize=None)
def _compiled(reduction: str, impl: str, temperature: float):
    """Jitted (primal, value_and_grad, vector-cotangent vjp) for a config.

    ``validate=False`` inside the traces: the module re-runs the
    host-side spread check on the CONCRETE parameter every forward (see
    ``ASGLoss.forward``), which is strictly stronger than the in-graph
    NaN poison the traced guard would add.
    """

    def f(trans, inputs, targets, li, lo):
        return asg_loss(
            trans, inputs, targets, li, lo,
            reduction=reduction, impl=impl, temperature=temperature,
            validate=False,
        )

    primal = jax.jit(f)
    scalar_vag = jax.jit(jax.value_and_grad(f, argnums=(0, 1)))

    def _vjp(trans, inputs, targets, li, lo, ct):
        out, vjp_fn = jax.vjp(lambda t, i: f(t, i, targets, li, lo),
                              trans, inputs)
        # the loss dtype is promote(inputs, transition) — e.g. f64 when
        # torch's default dtype is float64 while the emissions are f32 —
        # and jax.vjp requires the cotangent to match it exactly
        return vjp_fn(ct.astype(out.dtype))

    vector_vjp = jax.jit(_vjp)
    return primal, scalar_vag, vector_vjp


class _ASGLossFn(torch.autograd.Function):
    """autograd bridge; gradients w.r.t. (transition, inputs) only."""

    @staticmethod
    def forward(ctx, transition, inputs, targets, input_lengths,
                target_lengths, config):
        reduction, impl, temperature = config
        primal, scalar_vag, vector_vjp = _compiled(reduction, impl,
                                                   temperature)
        tj = _to_jax(transition)
        ij = _to_jax(inputs)
        tgt = _to_jax(targets, jnp.int32)
        li = _to_jax(input_lengths, jnp.int32)
        lo = _to_jax(target_lengths, jnp.int32)

        device, dtype = inputs.device, inputs.dtype
        # grad mode is force-disabled inside Function.forward, so
        # is_grad_enabled() would always read False here; needs_input_grad
        # reflects the OUTER autograd state per input.
        needs_grad = ctx.needs_input_grad[0] or ctx.needs_input_grad[1]
        if not needs_grad:
            loss = primal(tj, ij, tgt, li, lo)
            ctx.mode = "eval"
        elif reduction in ("mean", "sum"):
            # One fused fwd+bwd on-device now; backward is a host-side
            # cotangent scale.
            loss, (gt, gi) = scalar_vag(tj, ij, tgt, li, lo)
            ctx.mode = "scalar"
            ctx.grads = (
                _to_torch(gt, device, transition.dtype),
                _to_torch(gi, device, dtype),
            )
        else:  # 'none': (B,) cotangent arrives at backward time
            loss = primal(tj, ij, tgt, li, lo)
            ctx.mode = "vector"
            ctx.call = (vector_vjp, tj, ij, tgt, li, lo)
            ctx.meta = (device, transition.dtype, dtype)
        return _to_torch(loss, device, dtype)

    @staticmethod
    def backward(ctx, grad_out):
        # The grads returned here are constants to torch autograd
        # (computed in JAX), so create_graph=True through this loss would
        # SILENTLY drop its curvature from a mixed objective — fail
        # loudly instead.  The engine enables grad mode during backward
        # iff create_graph was requested, so this is the reliable signal
        # (once_differentiable only errors when the cotangent itself
        # requires grad, which a loss head's never does).
        if torch.is_grad_enabled():
            raise RuntimeError(
                "torch_asg_tpu.torch_compat.ASGLoss is not twice-"
                "differentiable (create_graph=True): its gradients are "
                "computed in JAX and enter torch autograd as constants, "
                "so second-order terms through this loss would be "
                "silently wrong.  Compute higher-order derivatives on "
                "the JAX side (jax.hessian / jax.jvp of asg_loss)."
            )
        if ctx.mode == "scalar":
            gt, gi = ctx.grads
            return (grad_out.to(gt) * gt, grad_out.to(gi) * gi,
                    None, None, None, None)
        # vector cotangent: one fused fwd+bwd re-dispatch with the real ct
        vector_vjp, tj, ij, tgt, li, lo = ctx.call
        device, tdtype, idtype = ctx.meta
        ct = _to_jax(grad_out, ij.dtype)
        gt, gi = vector_vjp(tj, ij, tgt, li, lo, ct)
        return (
            _to_torch(gt, device, tdtype),
            _to_torch(gi, device, idtype),
            None, None, None, None,
        )


def load_reference_transition(state_dict_or_path, prefix: str = ""):
    """Extract the learned (N, N) transition matrix from a reference
    checkpoint as float32 numpy — the migration hand-off for JAX users.

    The reference stores it as the single ``nn.Parameter`` of its module
    (``torch_asg/asg.py:105``), so its ``state_dict()`` key is
    ``"transition"`` (optionally under a ``prefix`` like
    ``"criterion."`` when the criterion was a submodule).  Accepts a
    loaded mapping or a path for ``torch.load``.  Torch users don't need
    this: ``torch_compat.ASGLoss`` registers the same parameter name, so
    ``crit.load_state_dict(ref_state_dict)`` is already drop-in.

    Use with the JAX front-ends::

        trans = load_reference_transition("asg_checkpoint.pt")
        crit = torch_asg_tpu.ASGLoss(transition=jnp.asarray(trans),
                                     num_labels=trans.shape[0])
    """
    sd = state_dict_or_path
    if not hasattr(sd, "keys"):
        sd = torch.load(sd, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):  # a whole module was saved
        sd = sd.state_dict()
    key = prefix + "transition"
    if key not in sd:
        raise KeyError(
            f"{key!r} not in checkpoint (keys: {sorted(sd.keys())[:10]}); "
            f"pass prefix='<module path>.' if the criterion was nested."
        )
    t = sd[key]
    if isinstance(t, torch.Tensor):
        t = t.detach().cpu().float().numpy()
    t = np.asarray(t, np.float32)
    if t.ndim != 2 or t.shape[0] != t.shape[1]:
        raise ValueError(f"transition must be square (N, N); got {t.shape}")
    return t


class ASGLoss(torch.nn.Module):
    """Reference-signature ASG criterion as a torch module on TPU kernels.

    Constructor matches the reference (``torch_asg/asg.py:101``):
    ``ASGLoss(num_labels, reduction='mean', forward_only=False,
    gpu_no_stream_impl=False)``; ``gpu_no_stream_impl=True`` maps to the
    log-domain ``impl='scan'`` tier (the serial/debug implementation's
    role).  Extra keyword-only knobs mirror ``asg_loss``:
    ``impl``/``temperature``/``validate``.

    ``self.transition`` is an ``nn.Parameter`` — registered, saved in
    ``state_dict()``, visible to any torch optimizer.  The host-side
    spread check (``validate=True``) runs on the concrete parameter each
    forward: 'auto' reroutes past the exp-domain bound, an explicit
    exp-domain ``impl`` raises (same contract as ``asg_loss``).
    """

    def __init__(
        self,
        num_labels: int,
        reduction: str = "mean",
        forward_only: bool = False,
        gpu_no_stream_impl: bool = False,
        *,
        impl: str | None = None,
        temperature: float = 1.0,
        validate: bool = True,
    ):
        super().__init__()
        if reduction not in REDUCTIONS:
            raise ValueError(
                f"unknown reduction {reduction!r}; expected one of "
                f"{REDUCTIONS}"
            )
        self.num_labels = num_labels
        self.reduction = reduction
        self.forward_only = forward_only
        self.impl = impl or ("scan" if gpu_no_stream_impl else "auto")
        self.temperature = float(temperature)
        self.validate = validate
        self.transition = torch.nn.Parameter(
            torch.zeros(num_labels, num_labels)
        )

    def forward(self, inputs, targets, input_lengths=None,
                target_lengths=None):
        impl = self.impl
        if self.validate:
            # pass the user's value through: validate='reroute' silently
            # falls back to the log-domain tier where validate=True would
            # raise for an explicit exp-domain impl (the transition is
            # always concrete here, so the guard is host-side either way)
            impl, _ = _spread_guard(
                self.transition.detach().cpu().numpy(), impl,
                self.temperature, self.validate,
            )
        config = (self.reduction, impl, self.temperature)
        if self.forward_only or not self.training:
            # The store-less forward-only kernel is selected structurally
            # (no grad trace exists); .backward() on the result raises,
            # matching the reference's eval-mode behavior.
            with torch.no_grad():
                return _ASGLossFn.apply(
                    self.transition, inputs, targets, input_lengths,
                    target_lengths, config,
                )
        return _ASGLossFn.apply(
            self.transition, inputs, targets, input_lengths,
            target_lengths, config,
        )
