"""Search distillation (beyond-parity; splendax/train/distill.py).

The reference has no mechanism to improve a trained policy other than more
PPO (`ppo_splendor.py` is its entire training surface); distill.py closes an
AlphaZero-style loop over the on-device MC search."""

import jax
import numpy as np
import pytest

from splendax.models.actor_critic import greedy_action, actor_logits, init_params
from splendax.train.distill import build_targets, distill_fit, generate_search_games


@pytest.fixture(scope="module")
def tiny_dataset():
    params = init_params(jax.random.PRNGKey(0), hidden=32)
    data, stats = generate_search_games(
        params, jax.random.PRNGKey(1), n_games=4,
        rollouts=2, horizon=2, max_plies=100,
    )
    return params, data, stats


def test_generate_shapes_and_targets(tiny_dataset):
    _, data, stats = tiny_dataset
    n = data["obs"].shape[0]
    assert data["obs"].shape == (n, 297)
    assert data["mask"].shape == (n, 45)
    assert data["action"].shape == (n,)
    assert stats["n_samples"] > 0, "no game finished within the ply budget"
    assert stats["n_samples"] == data["weight"].sum()

    w = data["weight"] > 0
    # Every weighted sample records a legal action...
    picked = data["mask"][np.arange(n), data["action"]]
    assert picked[w].all()
    # ...and an outcome target from the env's terminal-reward alphabet.
    assert np.isin(np.round(data["z"][w], 2), [-1.0, -0.1, 0.0, 1.0]).all()
    # Root Q-values: -inf exactly on illegal actions, argmax = recorded action.
    assert data["q"].shape == (n, 45) and data["logits"].shape == (n, 45)
    assert np.isneginf(data["q"][w][~data["mask"][w]]).all()
    assert np.isfinite(data["q"][w][data["mask"][w]]).all()
    assert (data["q"][w].argmax(-1) == data["action"][w]).all()


def test_generate_censored_teacher(tiny_dataset):
    """--censored swaps the teacher for the information-set search
    (search/ismc.py): same dataset contract — legal recorded actions,
    terminal-alphabet outcomes, Q -inf exactly on illegal actions."""
    params, _, _ = tiny_dataset
    data, stats = generate_search_games(
        params, jax.random.PRNGKey(2), n_games=4,
        rollouts=2, horizon=2, max_plies=100, censored=True,
    )
    n = data["obs"].shape[0]
    assert stats["n_samples"] > 0
    w = data["weight"] > 0
    picked = data["mask"][np.arange(n), data["action"]]
    assert picked[w].all()
    assert np.isin(np.round(data["z"][w], 2), [-1.0, -0.1, 0.0, 1.0]).all()
    assert np.isneginf(data["q"][~data["mask"]]).all()
    assert (data["action"][w] == data["q"].argmax(-1)[w]).all()


def test_build_targets_modes(tiny_dataset):
    _, data, _ = tiny_dataset
    w = data["weight"] > 0
    n_w = int(w.sum())
    for mode, kw in [("gumbel", {}), ("soft", {"tau": 0.2}), ("hard", {})]:
        t = build_targets(data, target=mode, **kw)[w]
        assert t.shape == (n_w, 45)
        np.testing.assert_allclose(t.sum(-1), 1.0, rtol=1e-5)
        assert (t[~data["mask"][w]] == 0).all(), f"{mode} leaks onto illegal"
    hard = build_targets(data, target="hard")[w]
    assert (hard.argmax(-1) == data["action"][w]).all() and (hard.max(-1) == 1).all()
    soft = build_targets(data, target="soft", tau=0.1)[w]
    assert (soft.argmax(-1) == data["action"][w]).all()
    # The gumbel target preserves the net's prior: with c_scale=0 it IS the
    # actor's own masked softmax.
    prior = build_targets(data, target="gumbel", c_scale=0.0)[w]
    ml = np.where(data["mask"][w], data["logits"][w], -1e9)
    ref = np.exp(ml - ml.max(-1, keepdims=True))
    ref /= ref.sum(-1, keepdims=True)
    np.testing.assert_allclose(prior, ref, atol=1e-5)


def test_generate_weights_are_per_game_prefixes(tiny_dataset):
    """A finished game contributes exactly its live plies: the [P, B] weight
    column for each game is 1s then 0s (frozen tail), never interleaved."""
    _, data, stats = tiny_dataset
    n_games = 4
    w = data["weight"].reshape(-1, n_games)
    for g in range(n_games):
        col = w[:, g]
        if col.sum() == 0:
            continue  # unfinished within max_plies: fully masked out
        last_live = np.max(np.nonzero(col)[0])
        assert col[: last_live + 1].all() and not col[last_live + 1 :].any()


def test_distill_moves_actor_toward_search(tiny_dataset):
    params, data, _ = tiny_dataset
    w = data["weight"] > 0
    obs = data["obs"][w].astype(np.float32)
    mask = data["mask"][w]
    act = data["action"][w]

    def agreement(p):
        pred = np.asarray(greedy_action(actor_logits(p, obs), mask))
        return (pred == act).mean()

    before = agreement(params)
    new_params, history = distill_fit(
        params, data, epochs=4, minibatch=64, lr=1e-3, seed=0, target="hard"
    )
    after = agreement(new_params)
    assert after > before
    assert history[-1]["ce"] < history[0]["ce"]
    # The critic was trained too (value_coef default 0.5) and its loss moved.
    assert history[-1]["v_loss"] < history[0]["v_loss"]


def test_distill_gumbel_target_trains(tiny_dataset):
    params, data, _ = tiny_dataset
    _, history = distill_fit(
        params, data, epochs=3, minibatch=64, lr=1e-3, seed=0, target="gumbel"
    )
    assert history[-1]["ce"] < history[0]["ce"]
    assert history[-1]["v_loss"] < history[0]["v_loss"]


def test_distill_cli_smoke(tmp_path):
    from splendax.train import checkpoint, distill

    params = init_params(jax.random.PRNGKey(2), hidden=32)
    src = tmp_path / "src.npz"
    checkpoint.export_params_npz(params, str(src))
    out = tmp_path / "out"
    distill.main([
        "--npz", str(src), "--out", str(out), "--games", "2",
        "--rollouts", "2", "--horizon", "2", "--max-plies", "100",
        "--epochs", "1", "--minibatch", "32",
    ])
    assert (out / "distilled_params.npz").exists()
    assert (out / "results.json").exists()


def test_generate_chunked_and_sampled(tiny_dataset):
    """gen_batch chunking + opening-move sampling (round-3 loop features):
    chunked generation concatenates per-chunk rows; sample_plies only changes
    PLAYED actions, so recorded actions stay the search argmax and legal."""
    params, _, _ = tiny_dataset
    data, stats = generate_search_games(
        params, jax.random.PRNGKey(5), n_games=4, rollouts=2, horizon=2,
        max_plies=80, sample_plies=6, gen_batch=2, drop_dead=True,
    )
    n = data["obs"].shape[0]
    assert n == stats["n_samples"] > 0  # drop_dead keeps only weighted rows
    assert (data["weight"] > 0).all()
    picked = data["mask"][np.arange(n), data["action"]]
    assert picked.all()
    assert (data["q"].argmax(-1) == data["action"]).all()


def test_distill_fit_rejects_empty_dataset(tiny_dataset):
    params, data, _ = tiny_dataset
    dead = {k: (np.zeros_like(v) if k == "weight" else v) for k, v in data.items()}
    with pytest.raises(ValueError, match="no usable samples"):
        distill_fit(params, dead, epochs=1, minibatch=32)


def test_distill_cli_gated_loop(tmp_path, capsys):
    """--iters with --gate-games: every iteration records a seat-averaged
    gate eval and a promoted flag; the final artifact exists either way."""
    import json as _json

    from splendax.train import checkpoint, distill

    params = init_params(jax.random.PRNGKey(3), hidden=32)
    src = tmp_path / "src.npz"
    checkpoint.export_params_npz(params, str(src))
    out = tmp_path / "out"
    distill.main([
        "--npz", str(src), "--out", str(out), "--games", "2",
        "--rollouts", "2", "--horizon", "2", "--max-plies", "80",
        "--epochs", "1", "--minibatch", "32", "--iters", "2",
        "--gate-games", "8", "--sample-plies", "4",
    ])
    res = _json.loads((out / "results.json").read_text())
    assert len(res["iterations"]) == 2
    for it in res["iterations"]:
        assert "promoted" in it
        assert 0.0 <= it["gate"]["score"] <= 1.0
    assert (out / "distilled_params.npz").exists()


def test_gate_passes_requires_ci_excluding_half():
    """The promotion gate is real only when its CI excludes 0.50: the r4
    mis-promotion (0.522 +/- 0.024 over gate_min 0.52 -> final eval 0.491)
    must fail under gate_passes (VERDICT r4 weak-spot 2)."""
    from splendax.train.distill import gate_passes

    # the r4 mis-promotion: threshold inside the CI
    assert not gate_passes({"score": 0.522, "score_ci95": 0.024}, 0.52)
    # a genuinely-better candidate passes
    assert gate_passes({"score": 0.58, "score_ci95": 0.03}, 0.55)
    # strong score but huge CI (too few games) still fails
    assert not gate_passes({"score": 0.60, "score_ci95": 0.15}, 0.55)
    # a mirror-exact candidate (paired deals: 0.500 +/- 0) can never pass
    assert not gate_passes({"score": 0.5, "score_ci95": 0.0}, 0.5)
