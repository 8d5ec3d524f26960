"""End-to-end ASG training step: wav2letter encoder + ASG criterion.

Functional train state (params pytree includes the criterion's learned
transition matrix, the analogue of the reference's ``nn.Parameter``
transition at ``asg.py:105``), optax optimizer, fully jittable, and
shardable over a ('data', 'model') mesh: batch data-parallel, conv
channels tensor-parallel, transition replicated with psum'd grads.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..asg import asg_loss
from .wav2letter import Wav2Letter


class TrainState(NamedTuple):
    params: Any  # {'encoder': ..., 'transition': (N, N)}
    opt_state: Any
    step: jnp.ndarray


def create_train_state(
    model: Wav2Letter,
    rng: jax.Array,
    feature_dim: int,
    optimizer: Optional[optax.GradientTransformation] = None,
    example_time: int = 16,
) -> Tuple[TrainState, optax.GradientTransformation]:
    from flax.core import meta

    feats = jnp.zeros((1, example_time, feature_dim), jnp.float32)
    variables = model.init(rng, feats)
    params = {
        # unbox the flax Partitioned metadata; sharding is applied via
        # encoder_partition_specs + shard_train_state instead.
        "encoder": meta.unbox(variables["params"]),
        # zero-init, like the reference module (asg.py:105)
        "transition": jnp.zeros((model.num_labels, model.num_labels), jnp.float32),
    }
    if optimizer is None:
        optimizer = optax.adamw(3e-4)
    opt_state = optimizer.init(params)
    return TrainState(params, opt_state, jnp.zeros((), jnp.int32)), optimizer


def loss_fn(
    model: Wav2Letter, params, batch, impl: str = "auto",
    train: bool = False, dropout_rng: Optional[jax.Array] = None,
):
    """batch: features (B,T,F), feat_lengths (B,), targets (B,S), target_lengths (B,)."""
    rngs = {"dropout": dropout_rng} if (train and dropout_rng is not None) else None
    emissions = model.apply(
        {"params": params["encoder"]}, batch["features"], train=train, rngs=rngs
    )
    input_lengths = model.output_length(batch["feature_lengths"]).astype(jnp.int32)
    return asg_loss(
        params["transition"],
        emissions,
        batch["targets"],
        input_lengths,
        batch["target_lengths"],
        reduction="mean",
        impl=impl,
    )


def make_train_step(
    model: Wav2Letter, optimizer, impl: str = "auto",
    dropout_rng: Optional[jax.Array] = None,
):
    """Jittable (state, batch) -> (state, loss) step.

    When the model uses dropout, pass a base ``dropout_rng``: each step
    folds in ``state.step`` so dropout masks vary over training (without
    it, a dropout-configured model silently trains with dropout inactive).
    """
    use_dropout = model.dropout > 0.0
    base_rng = (
        dropout_rng if dropout_rng is not None else jax.random.key(0)
    ) if use_dropout else None

    def train_step(state: TrainState, batch):
        rng = (
            jax.random.fold_in(base_rng, state.step) if use_dropout else None
        )
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(
                model, p, batch, impl, train=use_dropout, dropout_rng=rng
            )
        )(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


def encoder_partition_specs(model: Wav2Letter, feature_dim: int, example_time: int = 16):
    """PartitionSpec tree for the encoder params (from flax metadata)."""
    import flax.linen as nn

    feats = jax.ShapeDtypeStruct((1, example_time, feature_dim), jnp.float32)
    abs_vars = jax.eval_shape(model.init, jax.random.key(0), feats)
    return nn.get_partition_spec(abs_vars)["params"]


def param_shardings(mesh: Mesh, model: Wav2Letter, feature_dim: int):
    """NamedSharding tree matching the TrainState.params structure.

    Conv kernels land on the 'model' axis; everything else (including the
    transition matrix) replicates.
    """
    enc_specs = encoder_partition_specs(model, feature_dim)
    enc = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s if isinstance(s, P) else P()),
        enc_specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    return {
        "encoder": enc,
        "transition": NamedSharding(mesh, P()),
    }


def shard_train_state(
    mesh: Mesh, model: Wav2Letter, feature_dim: int, state: TrainState
) -> TrainState:
    """Place params AND optimizer moments on the mesh per the flax
    partitioning metadata.

    Optimizer state entries that mirror the params pytree (adam mu/nu,
    etc.) get the params' shardings — replicating them would keep
    per-chip optimizer memory at O(params) and defeat the tensor-parallel
    sharding; scalar counters and anything non-param-shaped replicate.
    """
    p_shard = param_shardings(mesh, model, feature_dim)
    params = jax.device_put(state.params, p_shard)
    repl = NamedSharding(mesh, P())

    params_def = jax.tree_util.tree_structure(state.params)

    def place(node):
        # a subtree shaped exactly like params follows the param shardings
        # — but only leaf-by-leaf where the SHAPES also match: factored
        # optimizers (adafactor v_row/v_col) mirror the params tree
        # structure with reduced-rank leaves, which a param spec would
        # reject at device_put
        if jax.tree_util.tree_structure(node) == params_def:
            def put(x, p_leaf, sh):
                if hasattr(x, "shape") and x.shape == p_leaf.shape:
                    return jax.device_put(x, sh)
                return jax.device_put(x, repl) if hasattr(x, "shape") else x

            return jax.tree_util.tree_map(put, node, state.params, p_shard)
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl) if hasattr(x, "shape") else x,
            node,
        )

    opt_state = jax.tree_util.tree_map(
        place,
        state.opt_state,
        is_leaf=lambda n: jax.tree_util.tree_structure(n) == params_def,
    )
    return TrainState(params, opt_state, jax.device_put(state.step, repl))
