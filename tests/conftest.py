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


@pytest.fixture
def rng():
    return np.random.default_rng(20260816)
