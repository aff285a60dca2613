"""Worker process for the 2-process `jax.distributed` equivalence test
(tests/test_multidevice.py::test_two_process_distributed_equivalence).

Each of the two processes hosts 4 virtual CPU devices; together they form an
8-device global mesh.  The worker asserts that a dp-sharded `update_step`
over the 2-process global mesh produces the SAME parameters as a plain
single-process, single-device run — i.e. the multi-host path is
value-preserving, not just alive — and that checkpoint saving works as a
collective with only the coordinator writing.

Usage: python tests/_multihost_worker.py PORT PROCESS_ID NUM_PROCESSES LOGDIR
"""

import os
import sys

# Repo root on sys.path (sys.path, not PYTHONPATH — a PYTHONPATH prefix
# breaks jax_plugins namespace-package discovery, docs/ENVIRONMENT.md).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PORT, PID, NPROCS, LOGDIR = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)

# 4 local virtual CPU devices per process, BEFORE any jax import side-effects.
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("JAX_COORDINATOR_ADDRESS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Host-fingerprinted cache dir (same rationale as tests/conftest.py: foreign
# XLA:CPU AOT cache entries SIGILL when /tmp migrates across hosts).
from splendax.utils.cache import host_fingerprint  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", f"/tmp/jax_test_cache-{host_fingerprint()}"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# init BEFORE touching the backend (multihost.py docstring).
from splendax.parallel.multihost import (  # noqa: E402
    global_mesh,
    init_multihost,
    is_coordinator,
)

assert init_multihost(f"localhost:{PORT}", NPROCS, PID)
assert jax.process_count() == NPROCS, jax.process_count()
assert is_coordinator() == (PID == 0)
assert len(jax.devices()) == 4 * NPROCS, jax.devices()
assert len(jax.local_devices()) == 4

import numpy as np  # noqa: E402

from splendax.parallel.mesh import shard_train_state  # noqa: E402
from splendax.train import ppo  # noqa: E402
from splendax.train.checkpoint import CheckpointManager  # noqa: E402
from splendax.train.config import PPOConfig  # noqa: E402

cfg = PPOConfig(
    total_timesteps=16 * 4 * 1, num_envs=16, num_steps=4,
    minibatch_size=16, pool_size=2, seed=0,
)

# Baseline: plain single-device update on this process's local devices.
ts_plain = ppo.init_train_state(cfg)
ts_plain, m_plain = ppo.update_step(cfg, ts_plain)
plain_params = jax.device_get(ts_plain.params)

# Global run: the SAME initial state dp-sharded over all 8 devices spanning
# both processes (device_put of identical per-host numpy is the standard
# multihost ingestion path).
mesh = global_mesh(dp=4 * NPROCS, tp=1)
assert mesh.size == 4 * NPROCS
ts = jax.device_get(ppo.init_train_state(cfg))
ts = shard_train_state(ts, mesh)
ts, m = ppo.update_step(cfg, ts)

for a, b in zip(jax.tree.leaves(ts.params), jax.tree.leaves(plain_params)):
    np.testing.assert_allclose(
        np.asarray(jax.device_get(a)), np.asarray(b), rtol=2e-5, atol=2e-6
    )
assert abs(float(m["loss"]) - float(m_plain["loss"])) < 1e-4

# Checkpoint: collective gather on every process, file writes on coord only.
mgr = CheckpointManager(LOGDIR)
mgr.save_checkpoint(ts)
if PID == 0:
    assert mgr.has_checkpoint()

# Regression (code review, round 2): a multi-process run with the DEFAULT
# dp=0/tp=1 config must still get a global mesh — a None mesh would leave
# each process training an independent copy and corrupt checkpoints.
import jax.numpy as jnp  # noqa: E402

from splendax.train.checkpoint import gather_to_host  # noqa: E402
from splendax.train.train import _make_mesh_from_cfg  # noqa: E402

mesh_default = _make_mesh_from_cfg(PPOConfig())
assert mesh_default is not None and mesh_default.size == 4 * NPROCS

# Regression: gather_to_host must NOT concatenate process-LOCAL leaves
# across processes (process_allgather's host-local semantics would double
# them); global sharded leaves gather to their full value exactly once.
local = jnp.ones((32,))
g = gather_to_host({"local": local, "params": ts.params})
assert g["local"].shape == (32,), g["local"].shape
p0 = jax.tree.leaves(g["params"])[0]
q0 = jax.tree.leaves(plain_params)[0]
assert p0.shape == q0.shape, (p0.shape, q0.shape)

print(f"MULTIHOST_OK pid={PID} procs={jax.process_count()} "
      f"loss={float(m['loss']):.6f}")

# ---------------------------------------------------------------------------
# Optional stage 2 (round 3): dp x tp GLOBAL mesh + cross-restart resume.
# Enabled by a 5th argv "dptp_resume_save" / "dptp_resume_restore"; the plain
# invocation above remains the round-2 equivalence test.
# ---------------------------------------------------------------------------

MODE = sys.argv[5] if len(sys.argv) > 5 else ""

if MODE in ("dptp_resume_save", "dptp_resume_restore"):
    import hashlib

    def _params_hash(ts_):
        """sha256 over the host-gathered params, coordinator-side."""
        g = gather_to_host({"params": ts_.params})
        h = hashlib.sha256()
        for leaf in jax.tree.leaves(g["params"]):
            h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
        return h.hexdigest()

    # The full production shape: dp x tp over BOTH processes (4 devices
    # each): tensor-parallel weight shards live on different hosts, so the
    # update's psum/all-gathers cross the process boundary.
    mesh2 = global_mesh(dp=2 * NPROCS, tp=2)
    assert mesh2.shape == {"dp": 2 * NPROCS, "tp": 2}

    if MODE == "dptp_resume_save":
        # Uninterrupted 3-update run on the global dp x tp mesh...
        ts_a = shard_train_state(jax.device_get(ppo.init_train_state(cfg)), mesh2)
        for _ in range(3):
            ts_a, _ = ppo.update_step(cfg, ts_a)
        print(f"DPTP_UNINTERRUPTED_HASH {_params_hash(ts_a)}")
        # ...vs the same run saved after update 2 (collective save, one
        # writer), to be resumed by a FRESH process fleet.
        ts_b = shard_train_state(jax.device_get(ppo.init_train_state(cfg)), mesh2)
        for _ in range(2):
            ts_b, _ = ppo.update_step(cfg, ts_b)
        mgr2 = CheckpointManager(os.path.join(LOGDIR, "dptp"))
        mgr2.save_checkpoint(ts_b)
        if PID == 0:
            assert mgr2.has_checkpoint()
        print(f"DPTP_SAVE_OK pid={PID}")
    else:
        import jax.numpy as jnp2

        mgr2 = CheckpointManager(os.path.join(LOGDIR, "dptp"))
        restored = mgr2.restore_checkpoint(
            jax.device_get(ppo.init_train_state(cfg))
        )
        assert int(restored.update_idx) == 2
        ts_c = shard_train_state(jax.tree.map(jnp2.asarray, restored), mesh2)
        ts_c, _ = ppo.update_step(cfg, ts_c)
        assert int(ts_c.update_idx) == 3
        # tp sharding survived the restore->reshard cycle
        assert "tp" in str(ts_c.params["actor"][0]["w"].sharding.spec)
        print(f"DPTP_RESUMED_HASH {_params_hash(ts_c)}")
