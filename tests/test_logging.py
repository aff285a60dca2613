"""TrainingLogger channel contract: JSONL always, TB and wandb gated.

The wandb channel is the reference's third tracking surface
(ppo_cleanRL.py:135-151); wandb is not installed in this image, so the
tests exercise it with an injected fake module and pin the graceful
degradation when import fails.
"""

from __future__ import annotations

import json
import sys
import types

from splendax.train.logging_utils import TrainingLogger


def _log_two_steps(logger):
    logger.log_training_metrics(100, 1e-3, 0.1, 0.2, 1.5, 0.01)
    logger.log_evaluation_results(
        {"basic": {"win_rate": 0.7, "win_rate_ci95": 0.05, "avg_turns": 30.0,
                   "draws": 1, "n": 100, "avg_prestige": 14.0,
                   "illegal_action_rate": 0.0}}, 100)
    logger.close()


def test_jsonl_always_written(tmp_path):
    d = str(tmp_path / "run")
    _log_two_steps(TrainingLogger(d, track=False))
    recs = [json.loads(l) for l in open(f"{d}/metrics.jsonl")]
    assert [r["type"] for r in recs] == ["train", "eval"]
    assert recs[1]["basic"]["win_rate"] == 0.7


def test_wandb_channel_logs_scalars(tmp_path, monkeypatch):
    calls = {"init": [], "log": [], "finish": 0}
    fake = types.ModuleType("wandb")
    fake.init = lambda **kw: calls["init"].append(kw)
    fake.log = lambda data, step=None: calls["log"].append((data, step))
    fake.finish = lambda: calls.__setitem__("finish", calls["finish"] + 1)
    monkeypatch.setitem(sys.modules, "wandb", fake)

    d = str(tmp_path / "run")
    logger = TrainingLogger(d, track=False, wandb_project="splendax-test",
                            wandb_entity=None, config={"seed": 7})
    assert logger._wandb is fake
    assert calls["init"][0]["project"] == "splendax-test"
    assert calls["init"][0]["config"] == {"seed": 7}
    _log_two_steps(logger)
    tags = {tag for data, _ in calls["log"] for tag in data}
    assert "losses/policy_loss" in tags
    assert "eval/basic/win_rate" in tags
    assert all(step == 100 for _, step in calls["log"])
    assert calls["finish"] == 1


def test_wandb_unavailable_degrades(tmp_path, monkeypatch):
    monkeypatch.setitem(sys.modules, "wandb", None)  # import -> ImportError
    d = str(tmp_path / "run")
    logger = TrainingLogger(d, track=False, wandb_project="p")
    assert logger._wandb is None
    _log_two_steps(logger)  # must not raise; JSONL still written
    assert len(open(f"{d}/metrics.jsonl").readlines()) == 2
