"""Native (C++) engine: trajectory parity with the JAX engine + throughput.

The native engine must be bit-identical to the JAX engine in parity mode
(same CPython-MT19937 shuffles and token returns), which in turn is
bit-identical to the reference — so these tests transitively pin all three.
"""

import numpy as np
import pytest

import splendax.native as native

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="no C++ toolchain for the native engine"
)


def test_initial_state_matches_parity_engine():
    import splendax as sx

    for seed in (0, 1, 42, 12345):
        ng = native.NativeGame(seed)
        js = sx.initial_state_parity(seed)
        np.testing.assert_array_equal(np.asarray(js.board), ng.field("board"))
        np.testing.assert_array_equal(np.asarray(js.deck_perm), ng.field("deck_perm"))
        np.testing.assert_array_equal(np.asarray(js.noble_ids), ng.field("noble_ids"))


def test_full_game_parity_with_jax_engine():
    """Random legal play; every ply: identical mask, obs, and state."""
    import jax
    import splendax as sx
    from splendax.engine import rules, encode

    cpu = jax.local_devices(backend="cpu")[0]
    step = jax.jit(lambda s, a: rules.apply_action(s, a, rng_mode="parity"))
    rng = np.random.RandomState(0)

    for seed in (7, 99):
        ng = native.NativeGame(seed)
        js = sx.initial_state_parity(seed, device=cpu)
        for ply in range(400):
            m_native = ng.legal_mask()
            m_jax = np.asarray(rules.legal_mask(js)).astype(np.int8)
            np.testing.assert_array_equal(m_native, m_jax, err_msg=f"mask ply {ply}")
            o_native = ng.observation()
            o_jax = np.asarray(encode.encode_observation(js))
            np.testing.assert_array_equal(o_native, o_jax, err_msg=f"obs ply {ply}")
            legal = np.flatnonzero(m_native)
            if len(legal) == 0 or ng.is_terminal():
                break
            a = int(rng.choice(legal))
            ng.env_step(a)
            js = step(js, np.int32(a))
        else:
            raise AssertionError("game did not terminate")


def test_env_step_contract():
    ng = native.NativeGame(3)
    mask = ng.legal_mask()
    illegal = np.flatnonzero(mask == 0)
    before = ng.state.copy()
    obs, r, flags, _ = ng.env_step(int(illegal[0]))
    assert r == pytest.approx(-0.01)
    assert flags & native.F_ILLEGAL
    np.testing.assert_array_equal(ng.state, before)  # no-op


def test_random_game_helper_and_final_rewards():
    plies, final = native.random_game(17)
    assert 10 < plies <= 400
    g = native.NativeGame(17)
    g.state[:] = final
    fr = g.final_rewards()
    assert fr[0] + fr[1] in (0.0, -0.2) or abs(fr[0] + fr[1]) < 1e-9


def test_to_game_state_roundtrip():
    ng = native.NativeGame(5)
    gs = ng.to_game_state()
    np.testing.assert_array_equal(np.asarray(gs.board), ng.field("board"))
    assert int(gs.to_play) == 0


@pytest.mark.slow
def test_native_throughput_beats_reference_bar():
    """The reference asserts > 6000 steps/s (test_gym_compat.py:135-157);
    the native host engine should clear it by ~100x."""
    import time

    t0 = time.perf_counter()
    plies = 0
    seed = 0
    while time.perf_counter() - t0 < 1.0:
        p, _ = native.random_game(seed, 400)
        plies += p
        seed += 1
    sps = plies / (time.perf_counter() - t0)
    assert sps > 60_000, f"native engine too slow: {sps:.0f} steps/s"
