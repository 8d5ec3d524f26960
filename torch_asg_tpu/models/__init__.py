from .train import (
    TrainState,
    create_train_state,
    encoder_partition_specs,
    loss_fn,
    make_train_step,
    param_shardings,
    shard_train_state,
)
from .wav2letter import ConvBlock, Wav2Letter

__all__ = [
    "Wav2Letter",
    "ConvBlock",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "loss_fn",
    "encoder_partition_specs",
    "param_shardings",
    "shard_train_state",
]
