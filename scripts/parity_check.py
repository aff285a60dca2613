"""Step-for-step parity harness: splendax (parity RNG mode) vs the reference
python engine at /root/reference.

Plays N full games with a shared numpy action RNG choosing uniformly among
legal moves; at every ply asserts identical legal masks, observations, and
terminal outcomes.  This is the go/no-go gate from SURVEY.md §7 step 4.

Usage: python scripts/parity_check.py [n_games] [base_seed]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/reference")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax.numpy as jnp

from splendor_gym.engine import (  # reference engine
    initial_state as ref_initial_state,
    legal_moves as ref_legal_moves,
    apply_action as ref_apply_action,
    is_terminal as ref_is_terminal,
)
from splendor_gym.engine.encode import encode_observation as ref_encode

import splendax as sx


def play_parity_game(seed: int, rng: np.random.RandomState, max_plies: int = 400):
    ref = ref_initial_state(num_players=2, seed=seed)
    st = sx.initial_state_parity(seed)

    for ply in range(max_plies):
        ref_mask = np.array(ref_legal_moves(ref), dtype=np.int8)
        my_mask = np.asarray(sx.legal_mask(st), dtype=np.int8)
        assert (ref_mask == my_mask).all(), (
            f"seed={seed} ply={ply}: mask mismatch\nref={np.flatnonzero(ref_mask)}"
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
            my_w = int(st.winner)
            assert (ref_w if ref_w is not None else -1) == my_w, (
                f"seed={seed}: winner mismatch ref={ref_w} mine={my_w}"
            )
            return ply
        legal = np.flatnonzero(ref_mask)
        if legal.size == 0:
            return ply  # stalemate handled at env layer; engine parity done
        a = int(rng.choice(legal))
        ref = ref_apply_action(ref, a)
        st = sx.apply_action(st, jnp.int32(a), rng_mode="parity")
    raise AssertionError(f"seed={seed}: game did not terminate in {max_plies} plies")


def main():
    n_games = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    base_seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    rng = np.random.RandomState(base_seed)
    total = 0
    for g in range(n_games):
        seed = int(rng.randint(1_000_000_000))
        plies = play_parity_game(seed, rng)
        total += plies
        print(f"game {g}: seed={seed} OK after {plies} plies")
    print(f"PARITY OK: {n_games} games, {total} plies, bit-identical masks/obs/winners")


if __name__ == "__main__":
    main()
