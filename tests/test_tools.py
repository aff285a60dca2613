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


REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
COMMITTED_CSV = os.path.join(REPO_ROOT, "data", "splendor_cards.csv")


def _assert_tables_match(built):
    from splendax.engine import data as D

    np.testing.assert_array_equal(built["tier"], D.CARD_TIER)
    np.testing.assert_array_equal(built["points"], D.CARD_POINTS)
    np.testing.assert_array_equal(built["color"], D.CARD_COLOR)
    np.testing.assert_array_equal(built["cost"], D.CARD_COST)


def test_csv_builder_matches_shipped_tables():
    """The committed data source (data/splendor_cards.csv) regenerates the
    shipped card tables — self-contained, no reference mount needed."""
    from splendax.tools.build_cards_from_csv import parse_cards_csv

    _assert_tables_match(parse_cards_csv(COMMITTED_CSV))


def test_csv_builder_matches_reference_csv():
    """Cross-check: the reference's raw spreadsheet parses to the same data
    as our committed CSV (only runs with the reference mounted)."""
    csv_path = "/root/reference/Splendor cards list.csv"
    if not os.path.exists(csv_path):
        pytest.skip("reference CSV not mounted")
    from splendax.tools.build_cards_from_csv import parse_cards_csv

    _assert_tables_match(parse_cards_csv(csv_path))


def test_csv_export_import_cli_roundtrip(tmp_path, monkeypatch, capsys):
    """export_cards_to_csv -> build_cards_from_csv round-trips to a
    byte-identical cards.json (the shipped data pipeline is reproducible
    end to end, via the actual CLI entry points)."""
    import sys

    from splendax.tools import build_cards_from_csv, export_cards_to_csv

    csv_out = str(tmp_path / "cards.csv")
    monkeypatch.setattr(sys, "argv", ["export_cards_to_csv", "-o", csv_out])
    export_cards_to_csv.main()
    assert "Wrote 90 cards" in capsys.readouterr().out

    json_out = str(tmp_path / "cards.json")
    monkeypatch.setattr(
        sys, "argv", ["build_cards_from_csv", csv_out, "-o", json_out]
    )
    build_cards_from_csv.main()
    assert "Wrote 90 cards" in capsys.readouterr().out

    shipped = os.path.join(REPO_ROOT, "splendax", "engine", "data", "cards.json")
    with open(json_out, "rb") as f, open(shipped, "rb") as g:
        assert f.read() == g.read()

    # The committed CSV is itself the exporter's output (regenerable).
    with open(csv_out, "rb") as f, open(COMMITTED_CSV, "rb") as g:
        assert f.read() == g.read()


def test_random_rollout_host_cli(capsys):
    from splendax.tools.random_rollout import host_rollouts

    host_rollouts(2, seed=0)
    out = capsys.readouterr().out
    assert "episode 0:" in out and "episode 1:" in out
    assert "turns=" in out


def test_random_rollout_device_cli(capsys):
    from splendax.tools.random_rollout import device_rollouts

    device_rollouts(8, seed=0)
    out = capsys.readouterr().out
    assert "8 games" in out and "avg_turns=" in out


def test_simple_game_test_writes_logs(tmp_path, monkeypatch, capsys):
    import sys

    from splendax.tools import simple_game_test

    monkeypatch.setattr(
        sys, "argv", ["simple_game_test", "--out-dir", str(tmp_path)]
    )
    simple_game_test.main()
    out = capsys.readouterr().out
    for name, _, _ in simple_game_test.SCENARIOS:
        path = tmp_path / f"{name}.log"
        assert path.exists() and path.stat().st_size > 1000
        assert f"{name}:" in out


def test_take3_demo_combo_counts(capsys):
    """The demo prints the reduced-color semantics: 3 legal combos with 2
    bank colors left, 6 with 1 (reference test_take_reduced_colors.py:17,32),
    10 with a full bank, 0 with an empty bank."""
    from splendax.tools.take3_demo import main

    main()
    out = capsys.readouterr().out
    assert "10 legal combos" in out  # full bank
    assert "3 legal combos" in out  # two colors left
    assert "6 legal combos" in out  # one color left
    assert "0 legal combos" in out  # empty bank


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


def test_run_logged_game_search_opponent():
    """`--opponent search` drives player 1 with the PUCT bot (heuristic
    leaves without an npz) — watch-or-face-the-search capability.  Runs the
    real CLI in a SUBPROCESS — the right surface for a CLI test, and the
    historical in-process "segfault after the full suite" was root-caused
    in round 3 to cross-host XLA:CPU cache poisoning, now fixed by
    host-fingerprinted cache dirs (docs/DEFECTS.md, utils/cache.py)."""
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "splendax.tools.game_logger",
         "--policy", "random", "--opponent", "search", "--sims", "8",
         "--seed", "4", "--quiet"],
        capture_output=True, text=True, timeout=420, cwd=REPO_ROOT, env=env,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "GAME OVER" in r.stdout or "pts" in r.stdout
