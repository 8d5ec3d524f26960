"""Trainer plumbing: dropout rngs, optimizer-state sharding, host-runtime
input validation (regressions from code review)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from torch_asg_tpu.models import (
    Wav2Letter,
    create_train_state,
    loss_fn,
    make_train_step,
)
from torch_asg_tpu.models.train import param_shardings, shard_train_state
from torch_asg_tpu.parallel import make_mesh

FEAT = 16


def _batch(rng, b=2, t=12):
    return {
        "features": jnp.asarray(rng.normal(size=(b, t, FEAT)), jnp.float32),
        "feature_lengths": jnp.full((b,), t, jnp.int32),
        "targets": jnp.asarray(rng.integers(0, 8, size=(b, 3)), jnp.int32),
        "target_lengths": jnp.full((b,), 3, jnp.int32),
    }


def test_dropout_actually_fires(rng):
    """A dropout-configured model must train with active, step-varying
    dropout (regression: train=True/rngs were never passed)."""
    model = Wav2Letter(num_labels=8, channels=16, depth=1, head_channels=16,
                       dropout=0.5)
    state, opt = create_train_state(model, jax.random.key(0), FEAT,
                                    optax.sgd(0.0))
    batch = _batch(rng)
    eval_loss = loss_fn(model, state.params, batch)  # deterministic
    train_loss_a = loss_fn(model, state.params, batch, train=True,
                           dropout_rng=jax.random.key(1))
    train_loss_b = loss_fn(model, state.params, batch, train=True,
                           dropout_rng=jax.random.key(2))
    assert float(train_loss_a) != float(eval_loss)
    assert float(train_loss_a) != float(train_loss_b)

    # the train step folds the step count into the rng: same batch, lr=0
    # (params frozen), different masks -> different losses
    step = jax.jit(make_train_step(model, opt))
    state1, l1 = step(state, batch)
    state2, l2 = step(state1, batch)
    assert float(l1) != float(l2)


def test_dropout_free_model_is_deterministic(rng):
    model = Wav2Letter(num_labels=8, channels=16, depth=1, head_channels=16)
    state, opt = create_train_state(model, jax.random.key(0), FEAT,
                                    optax.sgd(0.0))
    batch = _batch(rng)
    step = jax.jit(make_train_step(model, opt))
    _, l1 = step(state, batch)
    _, l2 = step(state, batch)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2))


def test_optimizer_moments_follow_param_shardings(rng):
    """adam mu/nu must shard like the params, not replicate (regression:
    per-chip optimizer memory was O(params))."""
    mesh = make_mesh((4, 2), ("data", "model"), devices=jax.devices("cpu")[:8])
    model = Wav2Letter(num_labels=8, channels=16, depth=1, head_channels=16)
    state, _ = create_train_state(model, jax.random.key(0), FEAT,
                                  optax.adam(1e-3))
    sharded = shard_train_state(mesh, model, FEAT, state)
    p_shard = param_shardings(mesh, model, FEAT)

    p_leaves = jax.tree_util.tree_leaves_with_path(p_shard)
    mu = sharded.opt_state[0].mu  # adam ScaleByAdamState
    mu_leaves = jax.tree_util.tree_leaves_with_path(
        jax.tree_util.tree_map(lambda x: x.sharding, mu)
    )
    assert dict(mu_leaves) == dict(p_leaves)


def test_pack_frames_rejects_mismatched_feature_dims():
    from torch_asg_tpu.runtime import pack_frames

    with pytest.raises(ValueError, match="feature dim"):
        pack_frames([
            np.zeros((10, 8), np.float32), np.zeros((5, 4), np.float32)
        ])


def test_empty_batches_are_tolerated():
    from torch_asg_tpu.runtime import encode_targets, pack_frames

    out, lengths = pack_frames([])
    assert out.size == 0 and lengths.size == 0
    tgts, tlens = encode_targets([], alphabet_size=26)
    assert tgts.shape[0] == 0 and tlens.size == 0


def test_checkpoint_roundtrip_resumes_identically(rng, tmp_path):
    """orbax save -> restore -> one more step must match an uninterrupted
    two-step run exactly (transition matrix and adam state included)."""
    import orbax.checkpoint as ocp

    model = Wav2Letter(num_labels=8, channels=16, depth=1, head_channels=16)
    state, opt = create_train_state(model, jax.random.key(0), FEAT,
                                    optax.adam(1e-2))
    batch = _batch(rng)
    step = jax.jit(make_train_step(model, opt))

    # uninterrupted: two steps
    s1, _ = step(state, batch)
    s2, loss_straight = step(s1, batch)

    # interrupted: one step, save, restore into a FRESH state, resume
    s1b, _ = step(state, batch)
    with ocp.CheckpointManager(tmp_path / "ckpt") as mgr:
        mgr.save(1, args=ocp.args.StandardSave(s1b))
        mgr.wait_until_finished()

        fresh, _ = create_train_state(model, jax.random.key(7), FEAT,
                                      optax.adam(1e-2))
        with ocp.CheckpointManager(tmp_path / "ckpt") as mgr2:
            restored = mgr2.restore(
                mgr2.latest_step(), args=ocp.args.StandardRestore(fresh)
            )
    s2b, loss_resumed = step(restored, batch)

    np.testing.assert_allclose(
        float(loss_resumed), float(loss_straight), rtol=1e-6
    )
    for a, b in zip(jax.tree_util.tree_leaves(s2),
                    jax.tree_util.tree_leaves(s2b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # the criterion's own learned parameter moved and survived the trip
    trans_path = [
        (p, l) for p, l in
        jax.tree_util.tree_leaves_with_path(s2b.params)
        if "transition" in jax.tree_util.keystr(p)
    ]
    assert trans_path, "transition matrix missing from checkpointed params"


def test_asg_training_drives_decode_to_target(rng):
    """End-to-end learning: jointly optimizing emissions + transition
    under the ASG loss drives the loss toward its zero minimum and makes
    the unconstrained Viterbi decode collapse to the target sequence —
    the criterion's entire point, exercised through grad + optax + the
    decoder in one loop."""
    import optax

    from torch_asg_tpu import asg_loss, viterbi_decode

    T, B, N = 24, 2, 6
    targets = jnp.asarray([[1, 2, 3], [4, 0, 5]], jnp.int32)  # no repeats
    lo = jnp.full((B,), 3, jnp.int32)
    li = jnp.full((B,), T, jnp.int32)
    params = {
        "inputs": jnp.asarray(0.1 * rng.normal(size=(T, B, N))),
        "trans": jnp.zeros((N, N)),
    }

    def loss(p):
        return asg_loss(p["trans"], p["inputs"], targets, li, lo,
                        reduction="mean", impl="scan")

    opt = optax.adam(0.2)
    opt_state = opt.init(params)
    step = jax.jit(
        lambda p, s: (lambda g: opt.update(g, s, p))(jax.grad(loss)(p))
    )
    first = float(loss(params))
    for _ in range(120):
        updates, opt_state = step(params, opt_state)
        params = optax.apply_updates(params, updates)
    last = float(loss(params))
    assert last < 0.05 * first, (first, last)

    res = viterbi_decode(params["trans"], params["inputs"], li)
    paths = np.asarray(res.paths)
    for b in range(B):
        runs = [l for i, l in enumerate(paths[:, b])
                if i == 0 or l != paths[i - 1, b]]
        assert runs == list(np.asarray(targets[b])), (b, runs)


def test_shard_train_state_handles_factored_optimizer(rng):
    """adafactor's v_row/v_col mirror the params TREE with reduced-rank
    leaves; shard_train_state must fall back to replication for them
    instead of crashing on shape-incompatible param shardings
    (regression)."""
    mesh = make_mesh((2, 2), ("data", "model"),
                     devices=jax.devices("cpu")[:4])
    model = Wav2Letter(num_labels=8, channels=16, depth=1, head_channels=16)
    state, _ = create_train_state(
        model, jax.random.key(0), FEAT, optax.adafactor(1e-3)
    )
    sharded = shard_train_state(mesh, model, FEAT, state)
    flat, _ = jax.tree_util.tree_flatten(sharded.opt_state)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat
               if hasattr(x, "shape") and x.dtype.kind == "f")
