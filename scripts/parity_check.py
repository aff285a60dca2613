"""Step-for-step parity sweep: splendax (parity RNG mode) vs the reference
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
# Repo root (scripts/ is not importable ground): sys.path, not PYTHONPATH —
# a PYTHONPATH prefix breaks jax_plugins discovery (docs/ENVIRONMENT.md).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from splendax.utils.parity import play_parity_game


def main():
    n_games = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    base_seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    rng = np.random.RandomState(base_seed)
    total = 0
    for g in range(n_games):
        seed = int(rng.randint(1_000_000_000))
        plies = play_parity_game(seed, rng)
        total += plies
        print(f"game {g}: seed={seed} OK after {plies} plies", flush=True)
    print(f"PARITY OK: {n_games} games, {total} plies, bit-identical masks/obs/winners")


if __name__ == "__main__":
    main()
