"""Wav2Letter-style convolutional acoustic model (flagship model).

The ASG criterion was introduced together with the wav2letter ConvNet
(Collobert et al., cited at zh217/torch-asg ``README.md:3-4``); the
reference repo ships only the criterion.  This module supplies the model
family that criterion exists to train: a 1-D convolutional encoder over
acoustic features emitting per-frame label scores shaped (T, B, N) —
exactly what ``asg_loss`` consumes.

TPU-first choices: convolutions are MXU-shaped (feature dims multiples of
128, bf16-friendly), params carry ``flax`` partitioning metadata so the
wide mid-stack runs tensor-parallel over a 'model' mesh axis while the
batch is data-parallel over 'data'.
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvBlock(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    dropout: float = 0.0
    tp_axis: str = "model"

    @nn.compact
    def __call__(self, x, train: bool = False):
        # kernel (K, Cin, Cout): shard Cout over the model axis (output-
        # channel tensor parallelism; the following block's Cin contraction
        # is local after the gather XLA inserts).
        x = nn.Conv(
            self.features,
            (self.kernel,),
            strides=(self.stride,),
            padding="SAME",
            kernel_init=nn.with_partitioning(
                nn.initializers.lecun_normal(), (None, None, self.tp_axis)
            ),
            bias_init=nn.with_partitioning(
                nn.initializers.zeros_init(), (self.tp_axis,)
            ),
        )(x)
        x = nn.relu(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class Wav2Letter(nn.Module):
    """Conv encoder: features (B, T, F) -> emissions (T', B, N).

    num_labels: vocabulary size N (letters + ASG repeat symbols).
    channels: mid-stack width (MXU-friendly multiples of 128).
    depth: number of stride-1 mid blocks.
    """

    num_labels: int
    channels: int = 256
    depth: int = 6
    head_channels: int = 512
    frontend_kernel: int = 11
    frontend_stride: int = 2
    kernel: int = 7
    dropout: float = 0.0
    tp_axis: str = "model"

    @nn.compact
    def __call__(self, features: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ConvBlock(
            self.channels,
            self.frontend_kernel,
            self.frontend_stride,
            self.dropout,
            self.tp_axis,
        )(features, train)
        for _ in range(self.depth):
            x = ConvBlock(self.channels, self.kernel, 1, self.dropout, self.tp_axis)(
                x, train
            )
        x = ConvBlock(self.head_channels, self.kernel, 1, self.dropout, self.tp_axis)(
            x, train
        )
        # final 1x1 projection to label scores; kept replicated (N is small)
        x = nn.Dense(self.num_labels)(x)
        return jnp.transpose(x, (1, 0, 2))  # (T', B, N) for the criterion

    def output_length(self, input_length):
        """Frames emitted for a given feature length (SAME padding)."""
        return -(-input_length // self.frontend_stride)
