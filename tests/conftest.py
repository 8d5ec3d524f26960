"""Test configuration: CPU backend with 8 virtual devices, fp64 enabled.

Must run before jax initializes its backends, hence the env mutation at
import time.  Tests validate numerics in float64 (like the reference's
gradcheck suite, ``test_asg.py:50-128``) and multi-chip sharding on a
virtual CPU mesh; the real-TPU path is exercised by bench.py and
__graft_entry__.py.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# Force CPU via config, not env: a sitecustomize may pre-import jax with
# the TPU plugin pinned, in which case env mutations are ignored.  The
# test suite needs fp64 + 8 virtual devices (TPU runs happen in bench.py).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Suite tiers (VERDICT r4 item 9): `pytest -m quick` is the <5-minute
# correctness core; the full suite (~29 min on this box's single core)
# adds streaming/distributed/runtime/examples.  Marked per-module here so
# individual tests never silently fall out of a tier.
_QUICK_MODULES = {
    "test_golden",
    "test_analytic",
    "test_grads",
    "test_api",
    "test_fused",
    "test_bigvocab",
}

# Heaviest individual fp64 gradchecks (10-18 s each on this one-core box),
# demoted so the quick tier stays under 5 minutes.  Each demoted check
# keeps a same-module sibling in the quick tier (e.g.
# test_fused_grads_match_oracle[shape0], test_golden_grads), so module
# coverage is preserved.
_QUICK_EXCEPT = {
    "test_fused_grads_numerical",
    "test_fused_grads_match_oracle[shape1]",
    "test_fused_forward_only_matches_vjp_path",
    "test_fused_no_pad_lane_arm",
    "test_fused_degenerate_lengths",
    "test_asg_grad_mean_reduction",
    "test_asg_grad_randomized[0]",
    "test_readme_shape_smoke",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        quick = mod in _QUICK_MODULES and item.name not in _QUICK_EXCEPT
        item.add_marker("quick" if quick else "slow")


@pytest.fixture
def rng():
    return np.random.default_rng(20260816)
