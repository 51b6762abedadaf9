"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding logic is validated on a host-platform device mesh (the
same XLA programs TPUs run); real-TPU benchmarks live in ``bench.py``.
Environment must be set before jax initializes its backends.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# A site plugin may have already registered a TPU-tunnel backend and set
# jax_platforms at interpreter start; the config update wins over both.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(10)
