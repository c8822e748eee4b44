"""Test configuration: force a virtual 8-device CPU mesh before jax import.

This is the TPU-native analog of multi-node testing without a cluster
(SURVEY.md §4): sharding/collective code paths are exercised on
xla_force_host_platform_device_count=8 CPU devices.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env setup)
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
