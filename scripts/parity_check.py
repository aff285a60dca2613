"""Step-for-step parity sweep: splendax (parity RNG mode) vs the reference
python engine at /root/reference.

Plays N full games with a shared numpy action RNG choosing uniformly among
legal moves; at every ply asserts identical legal masks, observations, and
terminal outcomes.  This is the go/no-go gate from SURVEY.md §7 step 4.

Usage: python scripts/parity_check.py [--games N] [--seed S]
       (legacy positional form `parity_check.py N S` still accepted)

The wide-sweep runbook target (docs/RUNBOOK.md "Reference parity"):
`python scripts/parity_check.py --games 100`; record the result in
PARITY.md "Latest wide sweep" whenever the engine changes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/reference")
# Repo root (scripts/ is not importable ground): sys.path, not PYTHONPATH —
# a PYTHONPATH prefix breaks jax_plugins discovery (docs/ENVIRONMENT.md).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

# The image exports JAX_PLATFORMS=axon globally and the tunneled axon plugin
# ignores the env var — pin the platform via jax.config BEFORE importing any
# splendax module (docs/ENVIRONMENT.md); a parity sweep is pure CPU work.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from splendax.utils.parity import play_parity_game


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("games", nargs="?", type=int, default=None)
    ap.add_argument("seed", nargs="?", type=int, default=None)
    ap.add_argument("--games", dest="games_kw", type=int, default=5)
    ap.add_argument("--seed", dest="seed_kw", type=int, default=0)
    args = ap.parse_args()
    n_games = args.games if args.games is not None else args.games_kw
    base_seed = args.seed if args.seed is not None else args.seed_kw
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
