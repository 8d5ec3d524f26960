"""Round-5: in-situ criterion share — one on-chip train-step bench of
Wav2Letter + fused ASG at the production shape (VERDICT r4 item 8).

The 0.9 ms fused-step story is only meaningful if it holds INSIDE a real
training graph, where XLA schedules the criterion alongside the encoder's
convs and the optimizer update.  Measured here:

  full_step_ms    jitted train step: Wav2Letter fwd -> fused ASG loss ->
                  grads for encoder+transition -> adamw update, chained
                  state->state inside one jit (the real training-loop shape)
  encoder_only_ms the same step with the criterion replaced by a mean()
                  over the emissions (same encoder/optimizer work, no
                  lattices) — the difference is the criterion's in-situ
                  cost, including whatever scheduling overlap XLA finds

Shape: B=64 utterances, 2000 feature frames -> stride 2 -> T=1000
emission frames, N=30 labels, the BASELINE.json bench family.  Model:
the default Wav2Letter (channels 256, depth 6, head 512) — ~0.5 TFLOP
forward, so the analytic expectation is criterion ≈ 1 ms inside a
~10 ms step.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

B, T_FEAT, F_DIM, S, N = 64, 2000, 64, 50, 30
CHAIN_K = 4
REPEATS = 5


def stats(obs):
    obs = sorted(obs)
    return {"best": round(obs[0], 3), "median": round(obs[len(obs) // 2], 3),
            "spread": round(obs[-1] - obs[0], 3)}


def main():
    import optax

    from torch_asg_tpu.models import Wav2Letter, create_train_state
    from torch_asg_tpu.asg import asg_loss
    from torch_asg_tpu.utils.profiling import fetch_overhead_s, time_fn_chained

    print("backend:", jax.default_backend(), file=sys.stderr)
    r = np.random.default_rng(0)
    model = Wav2Letter(num_labels=N)
    state, optimizer = create_train_state(
        model, jax.random.key(0), F_DIM, optimizer=optax.adamw(3e-4)
    )
    batch = {
        "features": jnp.asarray(
            r.normal(size=(B, T_FEAT, F_DIM)), jnp.float32),
        "feature_lengths": jnp.asarray(
            r.integers(T_FEAT // 2, T_FEAT + 1, size=(B,)), jnp.int32),
        "targets": jnp.asarray(r.integers(0, N, size=(B, S)), jnp.int32),
        "target_lengths": jnp.asarray(
            r.integers(S // 2, S + 1, size=(B,)), jnp.int32),
    }

    def make_step(use_criterion):
        def loss_fn(params, feats):
            emissions = model.apply({"params": params["encoder"]}, feats)
            if not use_criterion:
                return emissions.mean()
            input_lengths = model.output_length(
                batch["feature_lengths"]).astype(jnp.int32)
            return asg_loss(
                params["transition"], emissions, batch["targets"],
                input_lengths, batch["target_lengths"],
                reduction="mean", impl="fused",
            )

        def step(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(
                params, batch["features"])
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        def chain(params, opt_state):
            (p, o), losses = jax.lax.scan(
                step, (params, opt_state), None, length=CHAIN_K)
            return losses[-1], p, o

        return jax.jit(chain)

    fetch_s = fetch_overhead_s()
    out = {}
    for name, use_crit in (("full_step", True), ("encoder_only", False)):
        f = make_step(use_crit)
        loss, p, o = f(state.params, state.opt_state)
        assert np.isfinite(float(loss)), name
        obs = [
            time_fn_chained(
                lambda x: f(x, state.opt_state), lambda _, r_: r_[1],
                state.params, warmup=1, iters=8, fetch_s=fetch_s,
            ) / CHAIN_K * 1e3
            for _ in range(REPEATS)
        ]
        out[name + "_ms"] = stats(obs)
        print(json.dumps({name: out[name + "_ms"]}), flush=True)

    crit_ms = out["full_step_ms"]["median"] - out["encoder_only_ms"]["median"]
    row = {
        "exp": "insitu_criterion_share_r5",
        "shape": f"B={B},T_feat={T_FEAT}->T=1000,N={N}",
        "model": "Wav2Letter(channels=256, depth=6, head=512)",
        **out,
        "criterion_in_situ_ms": round(crit_ms, 3),
        "criterion_share": round(
            crit_ms / out["full_step_ms"]["median"], 3),
    }
    print(json.dumps(row))


if __name__ == "__main__":
    main()
