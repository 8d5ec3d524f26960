"""Big-vocab dual-chain kernel parity: one-matrix-pass (alpha, beta)
streams vs the matmul tier's lax.scan oracles (ops/fcc.py), which are
themselves reference-parity-pinned (fully_connected_lattice.cpp:9-47 via
tests/test_reference_native.py).  Runs the kernel in interpret mode at
fp64 on ragged batches; the compiled-TPU adoption number lives in
scripts/exp_r5_bigvocab.py / docs/PERF_R5.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_asg_tpu.ops import fcc
from torch_asg_tpu.ops.fcc import fcc_score_matmul, force_dual_streams
from torch_asg_tpu.ops.pallas.bigvocab_kernels import fcc_dual_streams
from torch_asg_tpu.utils.lengths import mask_emissions


def _case(rng, T, B, N, lengths=None):
    inputs = jnp.asarray(rng.normal(size=(T, B, N)))
    trans = jnp.asarray(rng.normal(size=(N, N)))
    if lengths is None:
        lengths = rng.integers(1, T + 1, size=(B,))
        lengths[0] = T  # always exercise the L_in == T beta seed
    li = jnp.asarray(lengths, jnp.int32)
    return trans, inputs, li


@pytest.mark.parametrize(
    "shape",
    [
        (6, 3, 130),  # N one past the lane boundary
        (9, 2, 260),  # two stripes (gp=128 at fp64), ragged
        (2, 1, 128),  # minimal chain: a single paired step
        (5, 9, 40),   # batch past the sublane boundary, tiny N
    ],
)
def test_dual_streams_match_scans(rng, shape):
    T, B, N = shape
    trans, inputs, li = _case(rng, T, B, N)
    inputs_m = mask_emissions(inputs, li)
    alpha, beta = fcc_dual_streams(trans, inputs_m, li)
    a_ref = fcc._alpha_scan_mm(trans, inputs_m)
    b_ref = fcc._beta_scan_mm(trans, inputs_m, li)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(a_ref),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(beta), np.asarray(b_ref),
                               rtol=1e-9, atol=1e-9)


def test_dual_streams_t1_boundary(rng):
    trans, inputs, li = _case(rng, 1, 3, 140, lengths=[1, 1, 1])
    inputs_m = mask_emissions(inputs, li)
    alpha, beta = fcc_dual_streams(trans, inputs_m, li)
    np.testing.assert_allclose(np.asarray(alpha),
                               np.asarray(fcc._alpha_scan_mm(trans, inputs_m)))
    np.testing.assert_allclose(
        np.asarray(beta),
        np.asarray(fcc._beta_scan_mm(trans, inputs_m, li)),
    )


def test_dual_streams_inf_transition_column(rng):
    """-inf transitions are semiring zeros (exp-domain 0), not poison."""
    trans, inputs, li = _case(rng, 7, 2, 150)
    trans = trans.at[:, 3].set(-np.inf).at[5, :].set(-np.inf)
    inputs_m = mask_emissions(inputs, li)
    alpha, beta = fcc_dual_streams(trans, inputs_m, li)
    a_ref = fcc._alpha_scan_mm(trans, inputs_m)
    b_ref = fcc._beta_scan_mm(trans, inputs_m, li)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(a_ref),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(beta), np.asarray(b_ref),
                               rtol=1e-9, atol=1e-9)


def test_matmul_tier_loss_and_grads_via_dual(rng):
    """fcc_score_matmul with the kernel streams == with the scan streams:
    value, dT, dI — under jit, ragged lengths."""
    trans, inputs, li = _case(rng, 8, 3, 135)

    def loss(tr, ins, dual):
        with force_dual_streams(dual):
            return jnp.sum(fcc_score_matmul(tr, ins, li))

    v_d, (gt_d, gi_d) = jax.value_and_grad(
        lambda tr, ins: loss(tr, ins, True), argnums=(0, 1))(trans, inputs)
    v_s, (gt_s, gi_s) = jax.value_and_grad(
        lambda tr, ins: loss(tr, ins, False), argnums=(0, 1))(trans, inputs)
    np.testing.assert_allclose(float(v_d), float(v_s), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(gt_d), np.asarray(gt_s),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(gi_d), np.asarray(gi_s),
                               rtol=1e-8, atol=1e-10)
