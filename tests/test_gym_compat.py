"""Gym-API conformance for the single-env shim.

Mirrors the reference suite `splendor_gym/tests/test_gym_compat.py`:
env_checker conformance (:11-15), shapes/dtypes (:18-27), determinism
(:44-76), step-after-terminal raises (:89-108), illegal-action penalty
(:111-124), render no-crash (:127-132) and a slow-marked throughput smoke
(:135-157).
"""

import numpy as np
import pytest

from splendax.env.gym_compat import SplendorEnv, make
from splendax.engine import OBSERVATION_DIM, TOTAL_ACTIONS


def _random_game(env, seed, max_steps=400):
    rng = np.random.RandomState(seed)
    obs, info = env.reset(seed=seed)
    traj = []
    for _ in range(max_steps):
        legal = np.flatnonzero(info["action_mask"])
        a = int(rng.choice(legal)) if len(legal) else 0
        obs, r, term, trunc, info = env.step(a)
        traj.append((a, float(r)))
        if term or trunc:
            break
    return obs, traj


def test_env_checker_conformance():
    gym = pytest.importorskip("gymnasium")
    from gymnasium.utils.env_checker import check_env

    check_env(SplendorEnv(), skip_render_check=True)


def test_shapes_and_dtypes():
    env = make()
    obs, info = env.reset(seed=0)
    assert obs.shape == (OBSERVATION_DIM,) and obs.dtype == np.int32
    assert info["action_mask"].shape == (TOTAL_ACTIONS,)
    assert info["action_mask"].dtype == np.int8
    assert env.action_space.n == TOTAL_ACTIONS
    a = int(np.flatnonzero(info["action_mask"])[0])
    obs, r, term, trunc, info = env.step(a)
    assert obs.shape == (OBSERVATION_DIM,) and isinstance(r, float)
    assert isinstance(term, bool) and isinstance(trunc, bool)


def test_same_seed_same_trajectory():
    o1, t1 = _random_game(SplendorEnv(), 123)
    o2, t2 = _random_game(SplendorEnv(), 123)
    assert t1 == t2
    assert np.array_equal(o1, o2)


def test_backends_bit_identical():
    """The C++ native backend and the JAX backend produce identical
    trajectories through the gym API for the same seed."""
    import splendax.native as native

    if not native.is_available():
        pytest.skip("no C++ toolchain")
    o1, t1 = _random_game(SplendorEnv(backend="jax"), 77)
    o2, t2 = _random_game(SplendorEnv(backend="native"), 77)
    assert t1 == t2
    assert np.array_equal(o1, o2)


def test_different_seeds_differ():
    _, t1 = _random_game(SplendorEnv(), 1)
    _, t2 = _random_game(SplendorEnv(), 2)
    assert t1 != t2


def test_step_after_terminal_raises():
    env = SplendorEnv()
    _random_game(env, 7)
    with pytest.raises(RuntimeError):
        env.step(0)


def test_illegal_action_penalty_not_crash():
    env = SplendorEnv()
    obs, info = env.reset(seed=3)
    illegal = np.flatnonzero(info["action_mask"] == 0)
    if len(illegal) == 0:
        pytest.skip("no illegal action in the fresh state")
    before = obs.copy()
    obs, r, term, trunc, info = env.step(int(illegal[0]))
    assert r == pytest.approx(-0.01)
    assert info.get("illegal_action") is True
    assert not term and not trunc
    assert np.array_equal(obs, before)  # state unchanged


def test_render_no_crash(capsys):
    env = SplendorEnv(render_mode="human")
    env.reset(seed=0)
    env.render()
    assert "bank" in capsys.readouterr().out.lower()


def test_final_rewards_sum_structure():
    env = SplendorEnv()
    _random_game(env, 11)
    fr = env.get_final_rewards()
    assert set(fr) == {0, 1}
    # win/loss sum to 0; draws are 0/-0.1 each
    assert fr[0] + fr[1] in (0.0, -0.2) or abs(fr[0] + fr[1]) < 1e-9


@pytest.mark.slow
def test_host_shim_throughput_smoke():
    """The reference asserts > 6000 steps/s for its pure-python engine
    (test_gym_compat.py:135-157).  The JAX shim pays a per-step dispatch,
    so the host-path bar is lower; the batched device path (bench.py) is
    the real throughput story (millions/s)."""
    import time

    env = SplendorEnv()
    obs, info = env.reset(seed=0)
    rng = np.random.RandomState(0)
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < 2.0:
        legal = np.flatnonzero(info["action_mask"])
        a = int(rng.choice(legal)) if len(legal) else 0  # 0-mask -> draw step
        obs, r, term, trunc, info = env.step(a)
        n += 1
        if term or trunc:
            obs, info = env.reset(seed=int(rng.randint(1 << 30)))
    sps = n / (time.perf_counter() - t0)
    assert sps > 300, f"host shim too slow: {sps:.0f} steps/s"


def test_box_bound_overflow_quirk():
    """Reference quirk replicated by the shim (docs/DEFECTS.md #11): the
    declared Box(0,50) is exceeded by the env's own move_count (obs slot 295,
    reaches 200 at the turn-limit draw).  The batched SplendaxVectorEnv
    declares the true bound (200) instead."""
    env = SplendorEnv()
    rng = np.random.RandomState(5)
    obs, info = env.reset(seed=9)
    for _ in range(450):
        legal = np.flatnonzero(info["action_mask"])
        takes = legal[legal < 15]
        reserves = legal[(legal >= 27) & (legal < 42)]  # never buy -> turn limit
        pick = takes if takes.size else (reserves if reserves.size else legal)
        obs, r, term, trunc, info = env.step(int(rng.choice(pick)))
        if term:
            break
    assert term and info.get("turn_limit")
    assert float(env.observation_space.high[295]) == 50.0  # replicated quirk
    assert int(obs[295]) >= 190  # move_count near 2*TURN_LIMIT, way past 50
    assert int(obs[293]) > 50  # turn_count also escapes the declared bound

    gym = pytest.importorskip("gymnasium")
    from splendax.env.vector import SplendaxVectorEnv

    venv = SplendaxVectorEnv(4)
    assert float(venv.single_observation_space.high[295]) == 200.0
    assert obs in venv.single_observation_space  # true bound contains it
