"""Persistent XLA compilation cache for CLI entry points.

The eval harness jits a 100-turn lockstep scan whose first compile costs
minutes on CPU; with the persistent cache, repeated CLI invocations (and
train-driver restarts) reuse the compiled executable.  Tests configure their
own cache dir (tests/conftest.py).
"""

from __future__ import annotations

import os


def setup_runtime(path: str | None = None) -> None:
    """CLI runtime setup: honor JAX_PLATFORMS + persistent compile cache.

    Some out-of-tree TPU plugins (e.g. the tunneled `axon` platform in this
    image) ignore the JAX_PLATFORMS environment variable; only the explicit
    config update reliably pins the platform.  Without this, `JAX_PLATFORMS=cpu
    python -m splendax...` still dispatches to the remote TPU and a first
    compile of the 100-turn eval scan costs minutes instead of ~10s.
    """
    import jax

    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms:
        jax.config.update("jax_platforms", env_platforms)
    enable_compilation_cache(path)


def enable_compilation_cache(path: str | None = None) -> None:
    """Idempotently point JAX's persistent compilation cache at `path`
    (default: $SPLENDAX_CACHE_DIR or ~/.cache/splendax/xla)."""
    import jax

    path = path or os.environ.get(
        "SPLENDAX_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "splendax", "xla"),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
