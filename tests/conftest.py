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
    flags += " --xla_force_host_platform_device_count=8"
# single-core hosts: in-process collectives abort after 40 s at a
# rendezvous when straggler device threads get starved — raise the limits
for k in ("xla_cpu_collective_timeout_seconds",
          "xla_cpu_collective_call_terminate_timeout_seconds"):
    if k not in flags:
        flags += f" --{k}=1200"
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: GSPMD CPU compiles are minutes on small hosts
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (GSPMD driver integration)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long GSPMD driver integration tests "
        "(skipped by default; enable with --runslow)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    if "slow" in (config.getoption("-m") or ""):
        return
    skip = pytest.mark.skip(reason="slow: use --runslow (or -m slow)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
