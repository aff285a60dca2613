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

# Cache dir MUST be keyed by the host CPU fingerprint: /tmp persists across
# sessions that may land on different physical hosts, and XLA:CPU loads
# AOT-cached executables compiled for the old host's CPU features ->
# SIGILL/segfault mid-suite (the round-2 "game_logger search" mystery crash;
# see splendax/utils/cache.py:host_fingerprint and docs/DEFECTS.md).
from splendax.utils.cache import host_fingerprint  # noqa: E402

if not os.environ.get("SPLENDAX_TEST_NO_CACHE"):  # diagnostic switch
    jax.config.update(
        "jax_compilation_cache_dir", f"/tmp/jax_test_cache-{host_fingerprint()}"
    )
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
