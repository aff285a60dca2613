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


def host_fingerprint() -> str:
    """Short stable hash of this host's CPU feature set.

    XLA:CPU persists AOT-compiled executables into the compilation cache
    keyed WITHOUT the host's CPU features; loading an entry produced on a
    machine with different features SIGILLs/segfaults (measured: the
    round-2 "game_logger search after full suite" segfault and a round-3
    mid-suite crash in `backend_compile_and_load`, both preceded by
    jax's "Machine type used for XLA:CPU compilation doesn't match"
    warning — this environment migrates /tmp and ~/.cache across physical
    hosts between sessions).  Keying the cache DIRECTORY by the feature
    set makes foreign entries unreachable instead of fatal.

    The hash covers model identity (vendor/family/model/stepping/microcode),
    not just the flags line: LLVM's host features include model-keyed tuning
    preferences (`prefer-no-gather`/`prefer-no-scatter`, the Downfall
    mitigation) that differ between hosts whose cpuinfo FLAGS are identical
    — measured r5 as a flags-hash collision that put two physical hosts in
    one cache dir (benign that time: a tuning preference, not an ISA
    feature, but the separation must not depend on luck)."""
    import hashlib

    keys = ("vendor_id", "cpu family", "model", "model name", "stepping",
            "microcode", "flags")
    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not line.strip():
                    break  # first processor block only (cores are uniform)
                k, _, v = line.partition(":")
                if k.strip() in keys:
                    field = v.split()
                    if k.strip() == "flags":
                        field = sorted(field)
                    parts.append(f"{k.strip()}={' '.join(field)}")
    except OSError:
        pass
    if not parts:
        import platform

        parts = [platform.processor()]
    return hashlib.sha256("\n".join(parts).encode()).hexdigest()[:12]


def enable_compilation_cache(path: str | None = None) -> None:
    """Idempotently point JAX's persistent compilation cache at `path`
    (default: $SPLENDAX_CACHE_DIR or ~/.cache/splendax/xla), suffixed with
    the host CPU fingerprint (see `host_fingerprint`)."""
    import jax

    path = path or os.environ.get(
        "SPLENDAX_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "splendax", "xla"),
    )
    path = f"{path}-{host_fingerprint()}"
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
