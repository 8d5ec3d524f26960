"""Drop-in API shim matching zh217/torch-asg's module signature.

The reference constructor is ``ASGLoss(num_labels, reduction='mean',
forward_only=False, gpu_no_stream_impl=False)`` (``torch_asg/asg.py:101``)
and its forward takes ``(inputs, targets, input_lengths=None,
target_lengths=None)`` with inputs (T, B, N) / targets (B, S)
(``asg.py:109``).  This wrapper keeps that exact surface so reference
users can switch by changing one import:

    from torch_asg_tpu.compat import ASGLoss

Differences that cannot be hidden: the transition matrix is a pytree leaf
(``.transition``) rather than an ``nn.Parameter`` (optimize it with optax),
and there is no CUDA/stream dispatch — ``gpu_no_stream_impl=True`` maps to
the pure-XLA 'scan' path (the same role: the serial/debug implementation,
``asg.py:124``), while the default uses the fused TPU kernels.
"""

from __future__ import annotations

import jax.numpy as jnp

from .asg import REDUCTIONS, asg_loss


class ASGLoss:
    """Reference-signature ASG loss front-end (see module docstring).

    Stateful-looking like the reference module, but jit/grad-friendly:
    pass ``transition=`` explicitly to ``forward`` to differentiate, or
    read/assign ``.transition`` between steps.
    """

    def __init__(
        self,
        num_labels: int,
        reduction: str = "mean",
        forward_only: bool = False,
        gpu_no_stream_impl: bool = False,
    ):
        if reduction not in REDUCTIONS:
            raise ValueError(
                f"unknown reduction {reduction!r}; expected one of {REDUCTIONS}"
            )
        self.num_labels = num_labels
        self.reduction = reduction
        self.forward_only = forward_only
        self.impl = "scan" if gpu_no_stream_impl else "auto"
        self.transition = jnp.zeros((num_labels, num_labels), jnp.float32)
        self.training = True

    def train(self, mode: bool = True) -> "ASGLoss":
        """Set training mode, mirroring ``nn.Module.train``.

        The reference auto-switches to the cheap score-only (beta-recursion
        only) path whenever ``forward_only or not self.training``
        (``torch_asg/asg.py:129``).  Here the same dispatch happens in
        ``forward``: eval mode stops gradients, so the custom_vjp primal —
        which never builds alpha — is the whole computation.
        """
        self.training = mode
        return self

    def eval(self) -> "ASGLoss":
        return self.train(False)

    def forward(
        self,
        inputs,
        targets,
        input_lengths=None,
        target_lengths=None,
        *,
        transition=None,
    ):
        trans = self.transition if transition is None else transition
        if self.forward_only or not self.training:
            # score-only dispatch (reference: forward_only or not training,
            # ``torch_asg/asg.py:129``): with gradients stopped nothing
            # differentiates through the loss, so the custom_vjp primal
            # (beta-only, no alpha/residual stores) is all that runs.
            # stop_gradient goes on the INPUTS, not the output: under an
            # enclosing jax.grad an output-side stop would still trace the
            # custom_vjp fwd rule (the residual-storing kernel) and only
            # discard its cotangent afterwards — input-side stopping keeps
            # the whole call in the primal trace, so the store-less kernel
            # is selected structurally (pinned by
            # tests/test_fused.py::test_forward_only_lowers_to_storeless_kernel).
            # SEMANTIC DIFFERENCE vs torch: the reference ERRORS on
            # .backward() in this mode (no autograd graph exists); JAX has
            # no backward graph to omit, so jax.grad through an eval-mode
            # loss returns ZEROS instead of raising.  Call .train() (or
            # construct with forward_only=False) before differentiating.
            import jax

            trans = jax.lax.stop_gradient(trans)
            inputs = jax.lax.stop_gradient(inputs)
        return asg_loss(
            trans,
            inputs,
            targets,
            input_lengths,
            target_lengths,
            reduction=self.reduction,
            impl=self.impl,
        )

    __call__ = forward
