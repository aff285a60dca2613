"""PPO trainer components (reference `ppo_splendor.py`).

Covers: masked-categorical semantics (:27-38), a full jitted update_step
(rollout+GAE+epochs, :202-361), opponent-pool FIFO/sampling (:135-143,
367-370), checkpoint save/restore roundtrip (the splendax upgrade over the
reference's save-only manager), and npz param export/import.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from splendax.models import actor_critic as ac
from splendax.selfplay import pool as pool_lib
from splendax.train import ppo
from splendax.train.checkpoint import (
    CheckpointManager,
    export_params_npz,
    import_params_npz,
)
from splendax.train.config import PPOConfig


def _tiny_cfg(**kw):
    base = dict(
        total_timesteps=256, num_envs=8, num_steps=8, minibatch_size=16,
        pool_size=2, eval_games=4, seed=0,
    )
    base.update(kw)
    return PPOConfig(**base)


def test_masked_sampling_only_legal():
    key = jax.random.PRNGKey(0)
    logits = jnp.zeros((64, 45))
    mask = jnp.zeros((64, 45), bool).at[:, 7].set(True).at[:, 13].set(True)
    a, logp = ac.sample_action(key, logits, mask)
    assert set(np.asarray(a).tolist()) <= {7, 13}
    assert np.allclose(np.asarray(logp), np.log(0.5), atol=1e-5)


def test_masked_no_legal_row_passthrough():
    """Rows with no legal action are left unmasked to avoid NaN
    (ppo_splendor.py:33-36)."""
    key = jax.random.PRNGKey(1)
    logits = jnp.zeros((4, 45))
    mask = jnp.zeros((4, 45), bool)
    a, logp = ac.sample_action(key, logits, mask)
    assert np.isfinite(np.asarray(logp)).all()


def test_update_step_runs_and_learns_shapes():
    cfg = _tiny_cfg()
    ts = ppo.init_train_state(cfg)
    before = jax.tree.leaves(ts.params)[0].copy()
    ts2, metrics = ppo.update_step(cfg, ts)
    assert int(ts2.update_idx) == 1
    assert int(ts2.global_step) == cfg.num_envs * cfg.num_steps
    for k in ("loss", "pg_loss", "v_loss", "entropy", "approx_kl", "lr"):
        assert np.isfinite(float(metrics[k])), k
    after = jax.tree.leaves(ts2.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_update_step_heuristic_opponent():
    cfg = _tiny_cfg(self_play=False, train_opponent="basic")
    ts = ppo.init_train_state(cfg)
    ts2, metrics = ppo.update_step(cfg, ts)
    assert np.isfinite(float(metrics["loss"]))


def test_search_opponent_routing():
    """Non-sentinel games must get EXACTLY the base pool policy's action;
    only sentinel games (opp_idx == pool_size + 1) take the search path."""
    from splendax.env import core

    cfg = _tiny_cfg(search_opponent=True, search_m=4, search_k0=1,
                    search_horizon=1)
    params = ac.init_params(jax.random.PRNGKey(0), hidden=32)
    pool = pool_lib.init_pool(params, cfg.pool_size, 0.25)
    B = 16
    state, obs, mask = jax.vmap(core.reset)(
        jax.random.split(jax.random.PRNGKey(5), B)
    )
    opp_idx = jnp.asarray([cfg.pool_size + 1 if i % 2 else 0
                           for i in range(B)], jnp.int32)
    policy = ppo._opponent_policy(cfg, pool, opp_idx)
    base = pool_lib.pool_greedy_policy(pool, opp_idx)
    key = jax.random.PRNGKey(6)
    a = np.asarray(policy(obs, mask, state, key))
    b = np.asarray(base(obs, mask, state, key))
    non_sentinel = np.asarray(opp_idx) != cfg.pool_size + 1
    np.testing.assert_array_equal(a[non_sentinel], b[non_sentinel])
    # all actions legal either way
    assert np.asarray(jnp.take_along_axis(mask, jnp.asarray(a)[:, None], 1)).all()


def test_search_static_partition_routing():
    """search_static pins the sentinel to a static STRIDED set of
    round(p_search*num_envs) rows (every search_stride-th — dp-shard-even,
    ADVICE r4) and runs the search on that static slice; all other rows must
    get EXACTLY the base pool policy's action (same key)."""
    from splendax.env import core

    cfg = _tiny_cfg(search_opponent=True, search_static=True, p_search=0.25,
                    num_envs=16, search_m=4, search_k0=1, search_horizon=1)
    S, k = cfg.n_search_static, cfg.search_stride
    assert (S, k) == (4, 4)
    sent_rows = np.zeros(cfg.num_envs, bool)
    sent_rows[: S * k : k] = True
    params = ac.init_params(jax.random.PRNGKey(0), hidden=32)
    pool = pool_lib.init_pool(params, cfg.pool_size, 0.25)
    opp_idx = np.asarray(ppo._sample_opponents(
        cfg, pool, jax.random.PRNGKey(3), (cfg.num_envs,)))
    assert (opp_idx[sent_rows] == cfg.pool_size + 1).all()
    assert (opp_idx[~sent_rows] <= cfg.pool_size).all()

    state, obs, mask = jax.vmap(core.reset)(
        jax.random.split(jax.random.PRNGKey(5), cfg.num_envs)
    )
    policy = ppo._opponent_policy(cfg, pool, jnp.asarray(opp_idx))
    base = pool_lib.pool_greedy_policy(pool, jnp.asarray(opp_idx))
    key = jax.random.PRNGKey(6)
    a = np.asarray(policy(obs, mask, state, key))
    b = np.asarray(base(obs, mask, state, key))
    np.testing.assert_array_equal(a[~sent_rows], b[~sent_rows])
    assert np.asarray(jnp.take_along_axis(mask, jnp.asarray(a)[:, None], 1)).all()


def test_search_static_small_config_clamps_to_one_row():
    """round(0.125*4)=0 must not silently disable the league slot: the
    static row count clamps to 1 (ADVICE r4)."""
    cfg = _tiny_cfg(search_opponent=True, search_static=True, num_envs=4,
                    p_search=0.125, search_m=4, search_k0=1, search_horizon=1)
    assert cfg.n_search_static == 1
    ts = ppo.init_train_state(cfg)
    assert int(np.asarray(ts.opp_idx)[0]) == cfg.pool_size + 1


def test_search_static_sanitizes_resumed_bernoulli_opp_idx():
    """A checkpoint from a Bernoulli run resumed with --search-static may
    hold sentinel values on non-static rows — update_step must clamp them to
    a valid pool slot instead of letting them fall through to all-zero
    one-hot logits (ADVICE r4)."""
    cfg = _tiny_cfg(
        search_opponent=True, search_static=True, p_search=0.25,
        num_envs=16, search_m=4, search_k0=1, search_horizon=1,
    )
    ts = ppo.init_train_state(cfg)
    # Simulate the stale-resume state: sentinel everywhere.
    ts = ts.replace(opp_idx=jnp.full((cfg.num_envs,), cfg.pool_size + 1,
                                     jnp.int32))
    ts2, metrics = ppo.update_step(cfg, ts)
    assert np.isfinite(float(metrics["loss"]))
    idx = np.asarray(ts2.opp_idx)
    sent_rows = np.zeros(cfg.num_envs, bool)
    sent_rows[:: cfg.search_stride] = True
    assert (idx[~sent_rows] <= cfg.pool_size).all()
    assert (idx[sent_rows] == cfg.pool_size + 1).all()


def test_update_step_search_static():
    """Full jitted update with the static-slice league slot."""
    cfg = _tiny_cfg(
        search_opponent=True, search_static=True, p_search=0.25,
        search_m=4, search_k0=1, search_horizon=1,
    )
    ts = ppo.init_train_state(cfg)
    k = cfg.search_stride
    assert (np.asarray(ts.opp_idx)[: cfg.n_search_static * k : k]
            == cfg.pool_size + 1).all()
    ts2, metrics = ppo.update_step(cfg, ts)
    assert np.isfinite(float(metrics["loss"]))
    assert int(ts2.update_idx) == 1


def test_update_step_search_censored():
    """Information-fair league slot: the sentinel search runs in
    information-set mode (config.search_censored -> ismc.determinize) and
    the full jitted update still executes."""
    cfg = _tiny_cfg(
        search_opponent=True, search_static=True, search_censored=True,
        p_search=0.25, search_m=4, search_k0=1, search_horizon=1,
    )
    ts = ppo.init_train_state(cfg)
    ts2, metrics = ppo.update_step(cfg, ts)
    assert np.isfinite(float(metrics["loss"]))
    assert int(ts2.update_idx) == 1


def test_update_step_search_opponent():
    """Search-hardened league slot: the sentinel opp_idx (pool_size + 1)
    routes episodes to a gumbel-search-wrapped CURRENT snapshot inside the
    rollout scan (train/config.py `search_opponent`)."""
    cfg = _tiny_cfg(
        search_opponent=True, p_search=0.5, search_m=4, search_k0=1,
        search_horizon=1,
    )
    ts = ppo.init_train_state(cfg)
    # p_search=0.5 over 8 envs: sentinel slots must actually be sampled.
    idx = np.asarray(
        ppo._sample_opponents(
            cfg, ts.pool, jax.random.PRNGKey(3), (512,)
        )
    )
    assert (idx == cfg.pool_size + 1).any()
    assert idx.max() <= cfg.pool_size + 1
    ts2, metrics = ppo.update_step(cfg, ts)
    assert np.isfinite(float(metrics["loss"]))
    assert int(ts2.update_idx) == 1


def test_pool_fifo_and_sampling():
    params = ac.init_params(jax.random.PRNGKey(0))
    pool = pool_lib.init_pool(params, pool_size=3, p_current=0.5)
    assert pool.pool_size == 3
    for i in range(5):
        marked = jax.tree.map(lambda x: x + i + 1.0, params)
        pool = pool_lib.push_snapshot(pool, marked)
    assert int(pool.filled) == 3
    idx = pool_lib.sample_opponent_idx(pool, jax.random.PRNGKey(2), (512,))
    idx = np.asarray(idx)
    # current slot (= pool_size) sampled with p~=0.5, frozen slots otherwise
    frac_current = (idx == 3).mean()
    assert 0.3 < frac_current < 0.7
    assert set(idx.tolist()) <= {0, 1, 2, 3}


def test_checkpoint_roundtrip(tmp_path):
    cfg = _tiny_cfg()
    ts = ppo.init_train_state(cfg)
    ts, _ = ppo.update_step(cfg, ts)
    mgr = CheckpointManager(str(tmp_path))
    mgr.save_checkpoint(ts)
    assert mgr.has_checkpoint()
    fresh = ppo.init_train_state(cfg)
    restored = mgr.restore_checkpoint(jax.device_get(fresh))
    assert int(restored.update_idx) == 1
    for a, b in zip(jax.tree.leaves(ts.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_npz_export_import_roundtrip(tmp_path):
    params = ac.init_params(jax.random.PRNGKey(3))
    path = str(tmp_path / "p.npz")
    export_params_npz(jax.device_get(params), path)
    loaded = import_params_npz(path)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_lr_and_entropy_anneal():
    cfg = _tiny_cfg(lr_anneal=True, total_timesteps=64 * 10)
    lr0, ent0 = ppo._anneal(cfg, jnp.int32(0))
    lrN, entN = ppo._anneal(cfg, jnp.int32(cfg.num_updates - 1))
    assert float(lr0) == pytest.approx(cfg.lr)
    assert float(lrN) < float(lr0)
    assert float(ent0) == pytest.approx(cfg.ent_coef)
    assert float(entN) == pytest.approx(cfg.ent_coef_final)


def test_gae_matches_numpy_oracle():
    """_gae's reverse scan must equal the reference's explicit numpy loop
    (ppo_splendor.py:299-314): delta_t = r_t + g*V_{t+1}*(1-d_t) - V_t,
    A_t = delta_t + g*lam*(1-d_t)*A_{t+1}, bootstrapped from last_value."""
    cfg = _tiny_cfg(gamma=0.97, gae_lambda=0.9)
    rng = np.random.RandomState(0)
    T, N = 7, 5
    rewards = rng.randn(T, N).astype(np.float32)
    values = rng.randn(T, N).astype(np.float32)
    dones = (rng.rand(T, N) < 0.3).astype(np.float32)
    last_value = rng.randn(N).astype(np.float32)

    adv_np = np.zeros((T, N), np.float32)
    lastgaelam = np.zeros(N, np.float32)
    for t in reversed(range(T)):
        next_value = last_value if t == T - 1 else values[t + 1]
        nonterminal = 1.0 - dones[t]
        delta = rewards[t] + cfg.gamma * next_value * nonterminal - values[t]
        lastgaelam = delta + cfg.gamma * cfg.gae_lambda * nonterminal * lastgaelam
        adv_np[t] = lastgaelam

    traj = ppo.Rollout(
        obs=jnp.zeros((T, N, 297), jnp.int32), mask=jnp.ones((T, N, 45), bool),
        action=jnp.zeros((T, N), jnp.int32), logp=jnp.zeros((T, N)),
        value=jnp.asarray(values), reward=jnp.asarray(rewards),
        done=jnp.asarray(dones),
    )
    adv, returns = ppo._gae(cfg, traj, jnp.asarray(last_value))
    np.testing.assert_allclose(np.asarray(adv), adv_np, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(returns), adv_np + values, rtol=1e-5, atol=1e-5
    )


def test_resume_equivalence(tmp_path):
    """Training k updates, checkpointing, restoring into a fresh process
    state, and training m more must be bit-identical to training k+m straight
    through (the resume upgrade over the reference's save-only manager)."""
    cfg = _tiny_cfg(total_timesteps=8 * 8 * 4)
    ts = ppo.init_train_state(cfg)
    ts, _ = ppo.update_step(cfg, ts)

    mgr = CheckpointManager(str(tmp_path))
    mgr.save_checkpoint(ts)
    restored = mgr.restore_checkpoint(jax.device_get(ppo.init_train_state(cfg)))
    # Restore produces numpy leaves; shove back through the jitted step.
    ts2 = jax.tree.map(jnp.asarray, restored)

    for _ in range(2):
        ts, _ = ppo.update_step(cfg, ts)
        ts2, _ = ppo.update_step(cfg, ts2)
    for a, b in zip(jax.tree.leaves(ts.params), jax.tree.leaves(ts2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(ts2.update_idx) == 3


def test_target_kl_early_stop_limits_update():
    """With a tiny target KL every epoch stops after its first minibatch, so
    the parameters move strictly less than with the stop disabled
    (reference break semantics, ppo_splendor.py:358-361)."""
    def drift(target_kl):
        cfg = _tiny_cfg(target_kl=target_kl, update_epochs=4, minibatch_size=16,
                        lr=1e-2, seed=3)
        ts0 = ppo.init_train_state(cfg)
        ts1, _ = ppo.update_step(cfg, ts0)
        return sum(
            float(jnp.abs(a - b).sum())
            for a, b in zip(jax.tree.leaves(ts0.params), jax.tree.leaves(ts1.params))
        )

    assert drift(1e-9) < drift(0.0)  # 0 disables the stop


def test_eval_summary_ci_formula():
    """summarize() must reproduce the reference's statistics exactly:
    win-rate ± 1.96*sqrt(p(1-p)/n), draw accounting, illegal-action rate
    (eval_suite.py:195-208)."""
    from splendax.eval.suite import summarize

    final_r = np.asarray([1.0, 1.0, -1.0, 0.0, 1.0, -0.1, 1.0, 0.0])
    turns = np.asarray([30, 40, 25, 100, 33, 100, 28, 100])
    prestige = np.asarray([15, 16, 8, 5, 15, 3, 17, 6])
    illegal = np.asarray([0, 1, 0, 0, 2, 0, 0, 0])
    checks = np.asarray([30, 40, 25, 100, 33, 100, 28, 100])
    s = summarize(final_r, turns, prestige, illegal, checks)
    assert s["n"] == 8 and s["wins"] == 4 and s["losses"] == 2 and s["draws"] == 2
    p = 4 / 8
    assert s["win_rate"] == pytest.approx(p)
    assert s["win_rate_ci95"] == pytest.approx(1.96 * np.sqrt(p * (1 - p) / 8))
    assert s["avg_turns"] == pytest.approx(float(turns.mean()))
    assert s["avg_prestige"] == pytest.approx(float(prestige.mean()))
    assert s["illegal_action_rate"] == pytest.approx(3 / checks.sum())


def test_select_at_matches_take_along_axis():
    """The one-hot select+reduce (`ac._select_at`) must be bit-identical to
    the take_along_axis gather it replaced for perf (docs/PERF.md trace
    notes) — including on large-negative masked-logit values."""
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    logits = jax.random.normal(k1, (64, 45)) * 10.0
    logits = logits.at[:, ::7].set(ac.BIG_NEG)  # masked-logit magnitudes
    action = jax.random.randint(k2, (64,), 0, 45)
    got = ac._select_at(logits, action)
    want = jnp.take_along_axis(logits, action[:, None], axis=-1)[:, 0]
    assert (np.asarray(got) == np.asarray(want)).all()


def test_pool_policy_selects_sampled_entry_exactly():
    """pool_greedy_policy's one-hot contraction over the pool axis must pick
    each game's sampled entry bit-exactly (same action as indexing the
    stacked logits directly)."""
    params = ac.init_params(jax.random.PRNGKey(0))
    pool = pool_lib.init_pool(params, pool_size=3, p_current=0.5)
    for i in range(3):
        pool = pool_lib.push_snapshot(
            pool, jax.tree.map(lambda x: x * (0.5 + i), params)
        )
    pool = pool_lib.set_current(pool, jax.tree.map(lambda x: -x, params))
    B = 32
    key = jax.random.PRNGKey(7)
    obs = jax.random.randint(key, (B, 297), 0, 51, jnp.int32)
    mask = jnp.ones((B, 45), bool)
    opp_idx = jax.random.randint(jax.random.PRNGKey(8), (B,), 0, 4, jnp.int32)
    act = pool_lib.pool_greedy_policy(pool, opp_idx)(obs, mask, None, key)
    logits_all = jax.vmap(lambda p: ac.actor_logits(p, obs))(pool.stack)
    want = ac.greedy_action(logits_all[opp_idx, jnp.arange(B)], mask)
    assert (np.asarray(act) == np.asarray(want)).all()


def test_pfsp_sampling_prefers_hard_opponents():
    """PFSP mode: frozen snapshots the agent still loses to are sampled far
    more often than beaten ones; uniform mode ignores the stats."""
    from splendax.models.actor_critic import init_params
    from splendax.selfplay import pool as pool_mod

    params = init_params(jax.random.PRNGKey(0), hidden=32)
    p = pool_mod.init_pool(params, pool_size=4, p_current=0.0)
    for _ in range(2):
        p = pool_mod.push_snapshot(p, params)
    # slot 0: agent wins 90% (easy); slot 1: agent wins 10% (hard)
    p = p.replace(
        wins=jnp.asarray([90.0, 10.0, 0, 0, 0]),
        games=jnp.asarray([100.0, 100.0, 0, 0, 0]),
    )
    n = 20000
    idx_pfsp = pool_mod.sample_opponent_idx(
        p, jax.random.PRNGKey(1), (n,), "pfsp"
    )
    idx_uni = pool_mod.sample_opponent_idx(
        p, jax.random.PRNGKey(1), (n,), "uniform"
    )
    frac_hard_pfsp = float((idx_pfsp == 1).mean())
    frac_hard_uni = float((idx_uni == 1).mean())
    # weights: easy (1-0.9)^2+0.05 = 0.06, hard (1-0.1)^2+0.05 = 0.86
    assert 0.85 < frac_hard_pfsp < 0.99, frac_hard_pfsp
    assert 0.45 < frac_hard_uni < 0.55, frac_hard_uni
    # only filled slots are ever sampled
    assert int(jnp.max(idx_pfsp)) <= 1


def test_record_outcomes_accounting():
    from splendax.models.actor_critic import init_params
    from splendax.selfplay import pool as pool_mod

    p = pool_mod.init_pool(
        init_params(jax.random.PRNGKey(0), hidden=32), pool_size=2
    )
    opp_idx = jnp.asarray([0, 0, 1, 2, 2, 2], jnp.int32)
    done = jnp.asarray([True, False, True, True, True, False])
    won = jnp.asarray([True, True, False, True, False, True])
    p = pool_mod.record_outcomes(p, opp_idx, done, won)
    np.testing.assert_allclose(np.asarray(p.games), [1, 1, 2])
    np.testing.assert_allclose(np.asarray(p.wins), [1, 0, 1])


def test_update_step_pfsp_accumulates_stats():
    """A pfsp-mode update runs end to end and the pool stats account for
    every finished episode."""
    cfg = _tiny_cfg(num_steps=16, opponent_sampling="pfsp")
    ts = ppo.init_train_state(cfg)
    ts, metrics = ppo.update_step(cfg, ts)
    assert np.isfinite(float(metrics["loss"]))
    assert float(ts.pool.games.sum()) == float(metrics["episodes"])
    assert float(ts.pool.wins.sum()) <= float(ts.pool.games.sum())


def test_restore_old_checkpoint_without_pool_stats(tmp_path):
    """Forward compat: checkpoints saved before the PFSP stats fields existed
    restore with the new fields at their init values (train/checkpoint.py
    _merge_state)."""
    import orbax.checkpoint as ocp
    from flax import serialization

    cfg = _tiny_cfg()
    ts = ppo.init_train_state(cfg)
    ts, _ = ppo.update_step(cfg, ts)
    old = serialization.to_state_dict(jax.device_get(ts))
    del old["pool"]["wins"], old["pool"]["games"]  # simulate the old layout
    path = str(tmp_path / "old_ckpt")
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, old)

    mgr = CheckpointManager(str(tmp_path))
    restored = mgr.restore_checkpoint(
        jax.device_get(ppo.init_train_state(cfg)), path=path
    )
    assert float(np.asarray(restored.pool.games).sum()) == 0.0  # init values
    assert int(restored.update_idx) == 1  # saved fields restored
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(ts.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
