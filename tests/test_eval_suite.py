"""Batched eval harness (reference `eval_suite.eval_vs_opponent`:162-208).

Checks the stats contract (W+D+L=n, CI formula), sanity orderings between
heuristics, and that model policies run under the harness.
"""

import numpy as np
import pytest

import jax

from splendax.eval import suite
from splendax.models.actor_critic import init_params


def test_stats_contract():
    res = suite.eval_vs_opponent(
        suite.heuristic_policy("random"), suite.heuristic_policy("random"),
        n_games=32, seed=0,
    )
    assert res["wins"] + res["draws"] + res["losses"] == res["n"] == 32
    p = res["win_rate"]
    assert res["win_rate_ci95"] == pytest.approx(1.96 * np.sqrt(p * (1 - p) / 32))
    assert 10 < res["avg_turns"] <= 100
    assert res["illegal_action_rate"] == 0.0


def test_basic_beats_random():
    res = suite.eval_vs_opponent(
        suite.heuristic_policy("basic"), suite.heuristic_policy("random"),
        n_games=64, seed=1,
    )
    assert res["win_rate"] > 0.7, res


def test_greedy_v1_beats_random():
    res = suite.eval_vs_opponent(
        suite.heuristic_policy("greedy_v1"), suite.heuristic_policy("random"),
        n_games=64, seed=2,
    )
    assert res["win_rate"] > 0.6, res


def test_noble_policy_registered_and_wins():
    res = suite.eval_vs_opponent(
        suite.heuristic_policy("noble"), suite.heuristic_policy("random"),
        n_games=64, seed=3,
    )
    assert res["win_rate"] > 0.6, res


def test_model_policies_run():
    params = init_params(jax.random.PRNGKey(0))
    greedy = suite.eval_vs_opponent(
        suite.model_greedy_policy(params), suite.heuristic_policy("random"),
        n_games=16, seed=4,
    )
    sampling = suite.eval_vs_opponent(
        suite.model_sampling_policy(params), suite.heuristic_policy("random"),
        n_games=16, seed=5,
    )
    for res in (greedy, sampling):
        assert res["n"] == 16 and res["wins"] + res["draws"] + res["losses"] == 16


def test_run_evaluation_suite_roster():
    params = init_params(jax.random.PRNGKey(1))
    results = suite.run_evaluation_suite(params, n_games=8, seed=0)
    assert set(results) == {"random", "greedy_v1", "basic", "self"}


def test_bot_round_robin():
    results = suite.bot_round_robin([("basic", "greedy_v1")], n_games=16, seed=0)
    assert "basic:greedy_v1" in results
    assert results["basic:greedy_v1"]["n"] == 16


def test_vs_model_cli_head_to_head(tmp_path, capsys):
    """`vs-model` — model-vs-model head-to-head (the working version of the
    reference's unfinished eval_vs_checkpoint_pool stub)."""
    import jax

    from splendax.eval import cli
    from splendax.models.actor_critic import init_params
    from splendax.train.checkpoint import export_params_npz

    a = str(tmp_path / "a.npz")
    b = str(tmp_path / "b.npz")
    export_params_npz(jax.device_get(init_params(jax.random.PRNGKey(1))), a)
    export_params_npz(jax.device_get(init_params(jax.random.PRNGKey(2))), b)
    out_json = str(tmp_path / "r.json")
    cli.main(["vs-model", "--npz", a, "--opp-npz", b, "--games", "8",
              "--json-out", out_json])
    captured = capsys.readouterr().out
    assert "model_vs_model" in captured
    import json as _json

    res = _json.load(open(out_json))["model_vs_model"]
    assert res["n"] == 8
    assert res["wins"] + res["draws"] + res["losses"] == 8


def test_uniform_legal_action_distribution_and_edges():
    """uniform_legal_action: uniform over legal, batched==semantics, zero-mask->0."""
    import jax
    import jax.numpy as jnp

    from splendax.selfplay.opponents import uniform_legal_action

    mask = np.zeros(45, bool)
    mask[[3, 7, 20, 21, 44]] = True
    mask = jnp.asarray(mask)
    keys = jax.random.split(jax.random.PRNGKey(0), 20000)
    acts = np.asarray(jax.jit(jax.vmap(lambda k: uniform_legal_action(k, mask)))(keys))
    vals, counts = np.unique(acts, return_counts=True)
    assert set(vals) == {3, 7, 20, 21, 44}
    assert np.abs(counts / len(acts) - 0.2).max() < 0.02

    # Batched call: every pick legal; zero-mask rows return 0.
    bm = np.array(jax.random.bernoulli(jax.random.PRNGKey(1), 0.2, (128, 45)))
    bm[0] = False  # force a zero-mask row
    picks = np.asarray(uniform_legal_action(jax.random.PRNGKey(2), jnp.asarray(bm)))
    assert picks[0] == 0
    nz = bm.any(axis=1)
    assert bm[np.arange(128), picks][nz].all()


def test_bradley_terry_elo_ordering():
    """BT/Elo fit: transitive 75% winrates produce monotone ratings with the
    right spacing (75% ~ 191 Elo), and the gauge is mean 1000."""
    import numpy as np

    from splendax.eval.elo import bradley_terry_elo

    n_per_pair = 400.0
    score = np.array([
        [0.0, 300.0, 380.0],
        [100.0, 0.0, 300.0],
        [20.0, 100.0, 0.0],
    ])
    games = np.where(np.eye(3, dtype=bool), 0.0, n_per_pair)
    elo = bradley_terry_elo(score, games)
    assert elo[0] > elo[1] > elo[2]
    assert abs(float(np.mean(elo)) - 1000.0) < 1e-6
    assert 140 < elo[0] - elo[1] < 260  # ~191 for 75%, loose for smoothing


def test_pool_elo_cli_roundtrip(tmp_path, capsys):
    """pool-elo end to end: a training checkpoint's pool snapshots are
    round-robined on device and ranked (the working version of the
    reference's eval_vs_checkpoint_pool stub)."""
    import json

    import jax

    from splendax.eval import cli
    from splendax.models.actor_critic import init_params
    from splendax.selfplay import pool as pool_mod
    from splendax.train import ppo
    from splendax.train.checkpoint import CheckpointManager
    from splendax.train.config import PPOConfig

    cfg = PPOConfig(total_timesteps=256, num_envs=8, num_steps=4,
                    minibatch_size=16, pool_size=4, seed=0, hidden=32)
    ts = ppo.init_train_state(cfg)
    # Distinct snapshots (different random inits) so ratings can differ.
    p = ts.pool
    for i in range(2):
        p = pool_mod.push_snapshot(
            p, init_params(jax.random.PRNGKey(10 + i), hidden=cfg.hidden)
        )
    ts = ts.replace(pool=p)
    mgr = CheckpointManager(str(tmp_path))
    mgr.save_checkpoint(jax.device_get(ts))

    out_json = str(tmp_path / "league.json")
    cli.main(["pool-elo", "--checkpoint", mgr.latest_path,
              "--games", "8", "--json-out", out_json])
    out = capsys.readouterr().out
    assert "pool league (3 entries" in out  # 2 snapshots + current
    league = json.load(open(out_json))
    assert set(league["elo"]) == {"snap0", "snap1", "current"}
    assert len(league["pairs"]) == 6  # both orders of 3 choose 2
    ratings = list(league["elo"].values())
    assert ratings == sorted(ratings, reverse=True)  # printed best-first


def test_head_to_head_seat_averaged_contract():
    """head_to_head plays both seat orders and scores win=1/draw=0.5 from
    a's side (VERDICT r2: strength claims must be seat-averaged — first-mover
    advantage is ~0.65-0.69 for equal agents)."""
    res = suite.head_to_head(
        suite.heuristic_policy("basic"), suite.heuristic_policy("random"),
        n_games=48, seed=3,
    )
    assert res["n"] == 96
    assert res["wins"] + res["draws"] + res["losses"] == 96
    assert res["score"] == pytest.approx(
        (res["wins"] + 0.5 * res["draws"]) / 96)
    assert res["win_rate"] == res["wins"] / 96
    # per-seat splits account for every game
    for seat in ("first_seat", "second_seat"):
        s = res[seat]
        assert s["a_wins"] + s["a_draws"] + s["a_losses"] == 48
    assert res["wins"] == res["first_seat"]["a_wins"] + res["second_seat"]["a_wins"]
    # basic crushes random from either seat
    assert res["score"] > 0.8


def test_head_to_head_mirror_is_balanced():
    """With paired mirrored deals (r5), a self-mirror is EXACT: both seat
    orders replay the same games (same reset keys, same policy both sides),
    so every deal's paired mean is exactly 0.5 and the paired CI is 0 —
    the property that makes deal-difficulty variance cancel for real
    matchups (VERDICT r4 item 4)."""
    res = suite.head_to_head(
        suite.heuristic_policy("basic"), suite.heuristic_policy("basic"),
        n_games=64, seed=1,
    )
    assert res["paired_deals"] is True
    assert res["n_pairs"] == 64
    assert res["score"] == pytest.approx(0.5)
    assert res["score_ci95"] == pytest.approx(0.0)
    # ...even though the first seat alone wins well above 0.5
    assert res["first_seat"]["win_rate"] > 0.55


def test_head_to_head_both_orders_share_deals():
    """Paired mirrored deals: the two seat orders must consume the SAME
    reset key stream — a's first-seat match stats and b's first-seat match
    stats describe games on identical initial deals.  Observable via the
    lopsided basic-vs-greedy_v1 matchup: swapping (a, b) must produce the
    mirrored result table exactly (order 0 of one call == order 1 of the
    other), which only holds when both orders share one seed."""
    res_ab = suite.head_to_head(
        suite.heuristic_policy("basic"), suite.heuristic_policy("greedy_v1"),
        n_games=32, seed=2,
    )
    res_ba = suite.head_to_head(
        suite.heuristic_policy("greedy_v1"), suite.heuristic_policy("basic"),
        n_games=32, seed=2,
    )
    assert res_ab["score"] == pytest.approx(1.0 - res_ba["score"])
    assert res_ab["score_ci95"] == pytest.approx(res_ba["score_ci95"])
    # order 0 of ab and order 1 of ba are literally the same games
    # (basic as P0 on the same deals), so the P0-view stats match exactly
    assert res_ab["first_seat"]["wins"] == res_ba["second_seat"]["wins"]
    assert res_ab["second_seat"]["wins"] == res_ba["first_seat"]["wins"]


def test_vs_search_cli_gumbel(capsys):
    """vs-search --algo gumbel drives the Gumbel root search through the
    real CLI, seat-averaged via --both-seats."""
    from splendax.eval import cli

    cli.main([
        "vs-search", "--algo", "gumbel", "--agent", "basic", "--games", "4",
        "--gumbel-m", "4", "--gumbel-k0", "2", "--horizon", "2",
        "--both-seats",
    ])
    out = capsys.readouterr().out
    assert "basic_vs_gumbel(m4,k2,h2)" in out and "score=" in out
    # privileged flag surfaces in the printed line (gumbel reads GameState)
    assert "[privileged: b]" in out


def test_vs_search_cli_censored(capsys):
    """--algo cmc / cgumbel drive the information-set searches through the
    real CLI; censored bots are obs-only, so no privileged tag prints."""
    from splendax.eval import cli

    cli.main([
        "vs-search", "--algo", "cmc", "--agent", "basic", "--games", "4",
        "--rollouts", "2", "--horizon", "2",
    ])
    out = capsys.readouterr().out
    assert "basic_vs_cmc(r2,h2)" in out and "privileged" not in out

    cli.main([
        "vs-search", "--algo", "cgumbel", "--agent", "basic", "--games", "4",
        "--gumbel-m", "4", "--gumbel-k0", "2", "--horizon", "2",
        "--greedy-final",
    ])
    out = capsys.readouterr().out
    assert "basic_vs_cgumbel(m4,k2,h2)" in out and "privileged" not in out
