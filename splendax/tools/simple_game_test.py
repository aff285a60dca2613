"""Scripted verification games saved under game_logs/ for manual rule checks
(reference `scripts/simple_game_test.py:16-58`)."""

from __future__ import annotations

import argparse
import os

from ..utils.cache import setup_runtime

if __name__ == "__main__":
    # Pin platform + compile cache BEFORE the imports below create
    # device-resident constant tables (see utils/cache.py).
    setup_runtime()

from .game_logger import run_logged_game


SCENARIOS = [
    ("random_game", "random", 42),
    ("first_legal_game", "first", 7),
    ("random_game_2", "random", 1234),
]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out-dir", default="game_logs")
    args = ap.parse_args()
    from ..utils.cache import setup_runtime

    setup_runtime()
    os.makedirs(args.out_dir, exist_ok=True)
    for name, policy, seed in SCENARIOS:
        path = os.path.join(args.out_dir, f"{name}.log")
        env, logger = run_logged_game(policy, seed, save_path=path)
        st = env.state
        result = "draw" if int(st.winner) < 0 else f"P{int(st.winner)} wins"
        print(f"{name}: {len(logger.logs)} plies, turns={int(st.turn_count)},"
              f" {result} -> {path}")


if __name__ == "__main__":
    main()
