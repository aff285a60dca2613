"""Multi-device sharding tests on the 8-virtual-device CPU mesh.

The reference has no distributed machinery (SURVEY.md §2.7); these validate
the TPU-native scale-out design instead: dp-sharded env fleets, dp x tp
sharded training steps, and numerical equivalence of sharded vs single-device
updates.  conftest.py forces `--xla_force_host_platform_device_count=8`.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import splendax as sx
from splendax.parallel.mesh import make_mesh, shard_train_state
from splendax.train import ppo
from splendax.train.config import PPOConfig


requires_8dev = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _tiny_cfg(**kw):
    base = dict(
        total_timesteps=256, num_envs=16, num_steps=4, minibatch_size=16,
        pool_size=2, seed=0,
    )
    base.update(kw)
    return PPOConfig(**base)


@requires_8dev
def test_env_fleet_dp_sharded_step():
    """Env batch sharded over 8 devices; the jitted step runs without
    resharding and outputs stay dp-sharded."""
    mesh = make_mesh(dp=8, tp=1)
    B = 64
    states, obs, masks = sx.reset_batch(jax.random.split(jax.random.PRNGKey(0), B))
    sh = NamedSharding(mesh, P("dp"))

    def shard(x):
        return jax.device_put(x, NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1)))))

    states = jax.tree.map(shard, states)
    masks = jax.device_put(masks, NamedSharding(mesh, P("dp", None)))
    a = jax.device_put(jnp.full((B,), 39, jnp.int32), sh)
    new_states, out, obs2, mask2 = sx.step_autoreset(
        states, a, jax.random.PRNGKey(1), mask=masks
    )
    assert obs2.shape == (B, 297)
    assert not bool(out.terminated.any())
    # output sharding preserved on the batch axis
    assert "dp" in str(obs2.sharding)


@requires_8dev
def test_dp_sharded_update_matches_single_device():
    """The same update_step on dp-sharded vs unsharded state gives identical
    params (GSPMD is value-preserving)."""
    cfg = _tiny_cfg()
    ts = ppo.init_train_state(cfg)
    ts_plain, m_plain = ppo.update_step(cfg, ts)

    mesh = make_mesh(dp=8, tp=1)
    ts_sharded = shard_train_state(ppo.init_train_state(cfg), mesh)
    ts_out, m_sharded = ppo.update_step(cfg, ts_sharded)

    for a, b in zip(jax.tree.leaves(ts_plain.params), jax.tree.leaves(ts_out.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)
    assert float(m_plain["loss"]) == pytest.approx(float(m_sharded["loss"]), rel=1e-4)


@requires_8dev
def test_dp_tp_mesh_update_runs():
    """dp=4 x tp=2 mesh: megatron-style param shardings compile and execute."""
    cfg = _tiny_cfg(num_envs=8)
    mesh = make_mesh(dp=4, tp=2)
    ts = shard_train_state(ppo.init_train_state(cfg), mesh)
    ts2, metrics = ppo.update_step(cfg, ts)
    assert np.isfinite(float(metrics["loss"]))
    assert int(ts2.update_idx) == 1


@requires_8dev
@pytest.mark.parametrize("hidden", [256, 128])
def test_tp_actually_shards_any_hidden_width(hidden):
    """The megatron param specs must put 'tp' on every MLP weight for ANY
    hidden width, not just the reference's 256 (regression: the specs used
    to match against a hardcoded HIDDEN constant, silently replicating all
    params — and wasting the tp axis — for any other --hidden value)."""
    cfg = _tiny_cfg(num_envs=8, hidden=hidden)
    mesh = make_mesh(dp=4, tp=2)
    ts = shard_train_state(ppo.init_train_state(cfg), mesh)
    for net in ("actor", "critic"):
        for i, layer in enumerate(ts.params[net]):
            spec = layer["w"].sharding.spec
            assert "tp" in spec, (net, i, spec)
    ts2, metrics = ppo.update_step(cfg, ts)
    assert np.isfinite(float(metrics["loss"]))


@requires_8dev
def test_train_cli_mesh_flags(tmp_path):
    """--dp/--tp flags reach the config and the train driver shards the
    TrainState over the requested mesh end-to-end."""
    from splendax.train import train as train_mod

    cfg = train_mod.parse_args([
        "--dp", "4", "--tp", "2", "--total-timesteps", "128",
        "--num-envs", "8", "--num-steps", "4", "--minibatch-size", "16",
        "--pool-size", "2", "--eval-every-updates", "1000",
        "--checkpoint-every-updates", "1000",
        "--log-dir", str(tmp_path),
    ])
    assert (cfg.dp, cfg.tp) == (4, 2)
    mesh = train_mod._make_mesh_from_cfg(cfg)
    assert mesh.shape == {"dp": 4, "tp": 2}
    # dp=-1 auto-fills from the device count.
    auto = train_mod._make_mesh_from_cfg(cfg.replace(dp=-1, tp=2))
    assert auto.shape["dp"] == len(jax.devices()) // 2

    stub = lambda params, seed: {}
    ts = train_mod.train(cfg, eval_fn=stub)
    assert int(ts.update_idx) == cfg.num_updates
    # params came out of a tp-sharded update
    w0 = ts.params["actor"][0]["w"]
    assert "tp" in str(w0.sharding)


@requires_8dev
def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_graft_entry_dryrun_32_devices():
    """Pod-slice-shaped mesh (dp=16 x tp=2 over 32 virtual devices): the
    full training step compiles and executes.  Runs in a subprocess because
    the virtual device count is fixed at backend init (conftest pins 8
    for in-process tests)."""
    import subprocess
    import sys as _sys

    r = subprocess.run(
        [_sys.executable, "__graft_entry__.py", "32"],
        capture_output=True, text=True, timeout=900,
        cwd=__file__.rsplit("/tests/", 1)[0],
        env={"PATH": "/usr/bin:/bin", "HOME": "/root"},
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "dryrun_multichip OK: mesh dp=16 tp=2" in r.stdout, r.stdout
