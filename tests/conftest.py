"""Test configuration: force an 8-device virtual CPU mesh.

TPU-hardware-free testing of sharding/collectives, the TPU-native analog of
a fake backend (the reference has no test suite at all — SURVEY.md §4).
"""
import os

# Note: in this environment the 'axon' TPU plugin overrides the
# JAX_PLATFORMS env var, so the config must be set programmatically.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
