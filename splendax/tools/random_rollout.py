"""Random-rollout smoke CLI (reference `scripts/random_rollout.py:13-30`).

Plays N episodes of uniform-random legal play and prints per-episode stats.
`--device` runs the episodes batched on-device instead of via the gym shim.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def host_rollouts(episodes: int, seed: int, max_steps: int = 500) -> None:
    from ..env.gym_compat import SplendorEnv

    rng = np.random.RandomState(seed)
    env = SplendorEnv()
    for ep in range(episodes):
        obs, info = env.reset(seed=int(rng.randint(1_000_000_000)))
        total_r, steps = 0.0, 0
        for _ in range(max_steps):
            legal = np.flatnonzero(info["action_mask"])
            if legal.size == 0:
                a = 0
            else:
                a = int(rng.choice(legal))
            obs, r, term, trunc, info = env.step(a)
            total_r += r
            steps += 1
            if term or trunc:
                break
        print(f"episode {ep}: steps={steps} reward={total_r:+.2f}"
              f" turns={int(env.state.turn_count)}")


def device_rollouts(episodes: int, seed: int) -> None:
    import jax

    from ..eval.suite import eval_vs_opponent, heuristic_policy

    t0 = time.time()
    res = eval_vs_opponent(
        heuristic_policy("random"), heuristic_policy("random"), episodes, seed
    )
    dt = time.time() - t0
    print(f"{episodes} games on {jax.default_backend()} in {dt:.2f}s: "
          f"p0 wr={res['win_rate']:.3f} avg_turns={res['avg_turns']:.1f} "
          f"draws={res['draws']}")


def main() -> None:
    ap = argparse.ArgumentParser(description="random legal-play rollouts")
    ap.add_argument("--episodes", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--device", action="store_true", help="batched on-device run")
    args = ap.parse_args()
    from ..utils.cache import setup_runtime

    setup_runtime()
    if args.device:
        device_rollouts(args.episodes, args.seed)
    else:
        host_rollouts(args.episodes, args.seed)


if __name__ == "__main__":
    main()
