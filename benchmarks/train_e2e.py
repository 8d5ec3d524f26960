"""End-to-end Wav2Letter + ASG train-step benchmark on the local TPU.

The criterion-level numbers live in bench.py; this measures the whole
framework train step (conv encoder fwd+bwd + fused ASG + adamw update)
with the round-2 in-graph chained methodology.

Run: python benchmarks/train_e2e.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from torch_asg_tpu.models import Wav2Letter, create_train_state, make_train_step
from torch_asg_tpu.utils.profiling import fetch_overhead_s, time_fn_chained

B, T, FEAT, NUM_LABELS, S = 32, 800, 64, 30, 40
CHAIN_K = 4


def main():
    model = Wav2Letter(
        num_labels=NUM_LABELS, channels=256, depth=4, head_channels=512
    )
    state, optimizer = create_train_state(
        model, jax.random.key(0), FEAT, optax.adamw(3e-4)
    )
    train_step = make_train_step(model, optimizer, impl="auto")

    r = np.random.default_rng(0)
    batch = {
        "features": jnp.asarray(r.normal(size=(B, T, FEAT)), jnp.float32),
        "feature_lengths": jnp.asarray(
            r.integers(T // 2, T + 1, size=(B,)), jnp.int32
        ),
        "targets": jnp.asarray(
            r.integers(0, NUM_LABELS, size=(B, S)), jnp.int32
        ),
        "target_lengths": jnp.asarray(
            r.integers(S // 2, S + 1, size=(B,)), jnp.int32
        ),
    }

    def chain(st, feats):
        def body(carry, _):
            st_c, f_c = carry
            st_n, loss = train_step(st_c, {**batch, "features": f_c})
            return (st_n, f_c + 0.0 * loss), loss

        (st_o, f_o), losses = jax.lax.scan(
            body, (st, feats), None, length=CHAIN_K
        )
        return losses[-1], st_o, f_o

    f = jax.jit(chain)
    out = f(state, batch["features"])
    jax.block_until_ready(out[0])
    fetch = fetch_overhead_s()
    t = min(
        time_fn_chained(
            lambda feats: f(state, feats),
            lambda _, o: o[2],
            batch["features"],
            warmup=2, iters=10, fetch_s=fetch,
        )
        for _ in range(3)
    ) * 1e3 / CHAIN_K

    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params)
    )
    frames = B * T
    print(json.dumps({
        "metric": "Wav2Letter+ASG full train step (B=32,T=800,feat=64)",
        "value": round(t, 3),
        "unit": "ms/step",
        "detail": {
            "frames_per_sec": round(frames / (t / 1e3), 1),
            "params": n_params,
            "model": "channels=256 depth=4 head=512",
            "backend": jax.default_backend(),
            "note": "in-graph chained (4 dependent optimizer steps/dispatch)",
        },
    }))


if __name__ == "__main__":
    main()
