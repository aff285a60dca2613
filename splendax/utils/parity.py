"""Reference-parity harness utilities.

Plays full games stepping the splendax engine (rng_mode="parity") and the
reference python engine in lockstep, asserting bit-identical legal masks,
observations and outcomes at every ply.  Requires the reference repo on
sys.path (guarded by callers; see tests/conftest.py:has_reference)."""

from __future__ import annotations

import numpy as np


def play_parity_game(seed: int, rng: np.random.RandomState, max_plies: int = 400) -> int:
    from splendor_gym.engine import (  # reference engine (sys.path injected)
        initial_state as ref_initial_state,
        legal_moves as ref_legal_moves,
        apply_action as ref_apply_action,
        is_terminal as ref_is_terminal,
    )
    from splendor_gym.engine.encode import encode_observation as ref_encode

    import jax
    import splendax as sx

    ref = ref_initial_state(num_players=2, seed=seed)
    # Pin to local CPU: host-driven single-game stepping over a tunneled TPU
    # pays a network RTT per dispatch.
    cpu = jax.local_devices(backend="cpu")[0]
    st = sx.initial_state_parity(seed, device=cpu)

    for ply in range(max_plies):
        ref_mask = np.array(ref_legal_moves(ref), dtype=np.int8)
        my_mask = np.asarray(sx.legal_mask(st), dtype=np.int8)
        assert (ref_mask == my_mask).all(), (
            f"seed={seed} ply={ply}: mask mismatch\nref ={np.flatnonzero(ref_mask)}"
            f"\nmine={np.flatnonzero(my_mask)}"
        )
        ref_obs = ref_encode(ref)
        my_obs = np.asarray(sx.encode_observation(st))
        diff = np.flatnonzero(ref_obs != my_obs)
        assert diff.size == 0, (
            f"seed={seed} ply={ply}: obs mismatch at offsets {diff[:20]}"
            f" ref={ref_obs[diff[:20]]} mine={my_obs[diff[:20]]}"
        )
        if ref_is_terminal(ref):
            assert bool(sx.is_terminal(st)), f"seed={seed} ply={ply}: terminal mismatch"
            ref_w = ref.winner_index
            assert (ref_w if ref_w is not None else -1) == int(st.winner), (
                f"seed={seed}: winner mismatch ref={ref_w} mine={int(st.winner)}"
            )
            return ply
        legal = np.flatnonzero(ref_mask)
        if legal.size == 0:
            return ply  # stalemate: handled at env layer; engine parity done
        a = int(rng.choice(legal))
        ref = ref_apply_action(ref, a)
        st = sx.apply_action(st, np.int32(a), rng_mode="parity")
    raise AssertionError(f"seed={seed}: game did not terminate in {max_plies} plies")


# --------------------------------------------------------------------------
# Env-layer lockstep parity: the gym adapters stepped side by side.
# --------------------------------------------------------------------------


def assert_step_equal(ref_out, my_out, ctx: str) -> None:
    """Assert two gym `step()` 5-tuples (or reset 2-tuples) are equivalent:
    obs bit-equal, reward within f32 rounding, flags equal, info dicts equal
    in KEYS and values (including the reference's key-presence quirks, e.g.
    no `final_rewards` on the stalemate-draw branch, splendor_env.py:56-61)."""
    if len(ref_out) == 2:  # reset
        ref_out = (ref_out[0], 0.0, False, False, ref_out[1])
        my_out = (my_out[0], 0.0, False, False, my_out[1])
    r_obs, r_rew, r_term, r_trunc, r_info = ref_out
    m_obs, m_rew, m_term, m_trunc, m_info = my_out
    diff = np.flatnonzero(np.asarray(r_obs) != np.asarray(m_obs))
    assert diff.size == 0, f"{ctx}: obs mismatch at offsets {diff[:10]}"
    assert abs(float(r_rew) - float(m_rew)) < 1e-6, (
        f"{ctx}: reward {r_rew} != {m_rew}"
    )
    assert bool(r_term) == bool(m_term), f"{ctx}: terminated {r_term}!={m_term}"
    assert bool(r_trunc) == bool(m_trunc), f"{ctx}: truncated mismatch"
    assert set(r_info) == set(m_info), (
        f"{ctx}: info keys {sorted(r_info)} != {sorted(m_info)}"
    )
    for k in r_info:
        rv, mv = r_info[k], m_info[k]
        if k == "action_mask":
            assert np.array_equal(np.asarray(rv), np.asarray(mv)), (
                f"{ctx}: action_mask mismatch\nref ={np.flatnonzero(rv)}"
                f"\nmine={np.flatnonzero(mv)}"
            )
        elif k == "final_rewards":
            assert set(rv) == set(mv), f"{ctx}: final_rewards players differ"
            for p in rv:
                assert abs(float(rv[p]) - float(mv[p])) < 1e-6, (
                    f"{ctx}: final_rewards[{p}] {rv[p]} != {mv[p]}"
                )
        else:
            assert rv == mv, f"{ctx}: info[{k!r}] {rv!r} != {mv!r}"


def play_env_parity_game(
    seed: int,
    rng: np.random.RandomState,
    max_plies: int = 450,
    illegal_prob: float = 0.0,
    action_picker=None,
    backend: str = "jax",
) -> int:
    """Step the splendax gym adapter against the reference `SplendorEnv`
    (splendor_env.py:41-115) with the same gym seed and actions, asserting
    the full step contract every ply: obs, reward (incl. -0.01 illegal and
    -0.1 turn-limit), terminated, and the complete info dict.

    `illegal_prob` deliberately injects masked-off actions; `action_picker`
    overrides the default uniform-random-legal policy with
    `f(rng, mask) -> action`.  Returns the ply count."""
    from splendor_gym.envs.splendor_env import SplendorEnv as RefEnv

    from splendax.env.gym_compat import SplendorEnv as SxEnv

    ref = RefEnv()
    mine = SxEnv(backend=backend)
    ref_out = ref.reset(seed=seed)
    my_out = mine.reset(seed=seed)
    assert_step_equal(ref_out, my_out, f"seed={seed} reset")
    info = ref_out[1]

    for ply in range(max_plies):
        mask = np.asarray(info["action_mask"])
        legal = np.flatnonzero(mask)
        illegal = np.flatnonzero(mask == 0)
        if legal.size == 0:
            a = 0  # zero-mask: any action triggers the draw branch
        elif illegal.size and rng.rand() < illegal_prob:
            a = int(rng.choice(illegal))
        elif action_picker is not None:
            a = int(action_picker(rng, mask))
        else:
            a = int(rng.choice(legal))
        ref_out = ref.step(a)
        my_out = mine.step(a)
        assert_step_equal(ref_out, my_out, f"seed={seed} ply={ply} a={a}")
        info = ref_out[4]
        if ref_out[2]:  # terminated
            return ply
    raise AssertionError(f"seed={seed}: no termination in {max_plies} plies")
