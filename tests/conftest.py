"""Test config: force an 8-virtual-device CPU platform BEFORE jax imports.

Multi-device tests (shard_map/pjit) run against this virtual mesh, per the
build plan's replacement for "multi-node tests without a cluster".
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config update is
# what actually pins tests to the 8-virtual-device CPU platform.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


REFERENCE_PATH = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "splendor_gym"))


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted"
)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
