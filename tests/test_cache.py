"""Host fingerprint contract for the persistent-XLA-cache defense.

The cross-host cache-poisoning fix (docs/DEFECTS.md) keys every cache dir
by `splendax.utils.cache.host_fingerprint()`.  These tests pin the two
properties the defense depends on: the hash is stable within a host, and
it covers CPU MODEL identity, not just the cpuinfo flags line — r5
measured two physical hosts with identical flags but different models
colliding in one dir (LLVM's model-keyed prefer-no-gather/scatter tuning
features are not cpuid flags).
"""

from __future__ import annotations

import os

from splendax.utils.cache import enable_compilation_cache, host_fingerprint


def test_fingerprint_stable_and_wellformed():
    f = host_fingerprint()
    assert len(f) == 12
    assert all(c in "0123456789abcdef" for c in f)
    assert host_fingerprint() == f


def test_fingerprint_covers_model_identity(tmp_path, monkeypatch):
    # Two synthetic hosts: identical flags, different model/stepping —
    # exactly the r5 collision.  The fingerprints MUST differ.
    common = (
        "vendor_id\t: GenuineIntel\n"
        "cpu family\t: 6\n"
        "flags\t\t: fpu vme de pse avx2 avx512f\n"
    )
    a = tmp_path / "cpuinfo_a"
    b = tmp_path / "cpuinfo_b"
    a.write_text(common + "model\t\t: 143\nmodel name\t: Xeon A\nstepping\t: 8\n\n")
    b.write_text(common + "model\t\t: 207\nmodel name\t: Xeon B\nstepping\t: 2\n\n")

    import splendax.utils.cache as cache

    real_open = open

    def fake_open(path, *args, **kwargs):
        if path == "/proc/cpuinfo":
            return real_open(fake_open.target, *args, **kwargs)
        return real_open(path, *args, **kwargs)

    monkeypatch.setattr("builtins.open", fake_open)
    fake_open.target = str(a)
    fa = cache.host_fingerprint()
    fb_same = cache.host_fingerprint()
    fake_open.target = str(b)
    fb = cache.host_fingerprint()
    assert fa == fb_same  # deterministic
    assert fa != fb  # model identity separates same-flags hosts


def test_cache_dir_suffixed_with_fingerprint(tmp_path):
    import jax

    prev = jax.config.jax_compilation_cache_dir
    try:
        base = os.path.join(str(tmp_path), "xla")
        enable_compilation_cache(base)
        assert jax.config.jax_compilation_cache_dir == (
            f"{base}-{host_fingerprint()}"
        )
        assert os.path.isdir(jax.config.jax_compilation_cache_dir)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
