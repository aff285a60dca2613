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
