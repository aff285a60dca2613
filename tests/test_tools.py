"""Tooling layer: game logger formatting/decoding, rollout CLIs, CSV builder.

Mirrors the reference's human-verification tooling
(`scripts/game_logger.py`, `scripts/simple_game_test.py`,
`scripts/random_rollout.py`, `scripts/build_cards_from_csv.py`).
"""

import os

import numpy as np
import pytest

from splendax.engine.types import initial_state_parity
from splendax.tools.game_logger import decode_action, format_game_state, run_logged_game


def test_decode_action_all_families():
    state = initial_state_parity(0)
    texts = [decode_action(a, state) for a in range(45)]
    assert any("take" in t.lower() for t in texts[:10])
    assert any("2" in t for t in texts[10:15])
    assert any("buy" in t.lower() for t in texts[15:27])
    assert any("reserve" in t.lower() for t in texts[27:42])
    assert len(set(texts)) > 30  # mostly distinct, human-readable strings


def test_format_game_state_sections():
    out = format_game_state(initial_state_parity(1))
    low = out.lower()
    for needle in ("bank", "t1", "t2", "t3", "nobles", "p0", "p1"):
        assert needle in low, f"missing section {needle!r}"


def test_run_logged_game_random(tmp_path):
    path = str(tmp_path / "g.log")
    env, logger = run_logged_game("random", seed=3, save_path=path, verbose=False)
    assert os.path.exists(path) and os.path.getsize(path) > 1000
    assert len(logger.logs) > 10


def test_run_logged_game_first_legal(tmp_path):
    env, logger = run_logged_game("first", seed=5, verbose=False)
    assert len(logger.logs) > 10


def test_csv_builder_matches_shipped_tables(tmp_path):
    csv_path = "/root/reference/Splendor cards list.csv"
    if not os.path.exists(csv_path):
        pytest.skip("reference CSV not mounted")
    import json

    from splendax.engine import data as D
    from splendax.tools.build_cards_from_csv import parse_cards_csv

    built = parse_cards_csv(csv_path)
    np.testing.assert_array_equal(built["tier"], D.CARD_TIER)
    np.testing.assert_array_equal(built["points"], D.CARD_POINTS)
    np.testing.assert_array_equal(built["color"], D.CARD_COLOR)
    np.testing.assert_array_equal(built["cost"], D.CARD_COST)


@pytest.mark.slow
def test_ppo_generic_learns_cartpole():
    """The CleanRL-parity vanilla PPO improves CartPole returns."""
    gym = pytest.importorskip("gymnasium")
    from splendax.train.ppo_generic import main

    params, returns = main(["--total-timesteps", "16384", "--seed", "1"])
    assert len(returns) > 5
    # learning signal: late returns beat early returns
    early = np.mean(returns[:5])
    late = np.mean(returns[-5:])
    assert late > early, (early, late)


def test_run_logged_game_model_vs_random(tmp_path):
    """`--policy model` plays a greedy net from an exported .npz; with
    `opponent` set, it drives only player 0 (beyond the reference, whose
    logger has no model option)."""
    import jax

    from splendax.models.actor_critic import init_params
    from splendax.train.checkpoint import export_params_npz

    path = str(tmp_path / "p.npz")
    export_params_npz(init_params(jax.random.PRNGKey(0), hidden=32), path)
    env, logger = run_logged_game(
        "model", seed=2, npz=path, opponent="random", verbose=False
    )
    assert len(logger.logs) > 4
    # model policy without an npz is a usage error
    import pytest

    with pytest.raises(ValueError):
        run_logged_game("model", seed=2, verbose=False)
