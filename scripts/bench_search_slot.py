"""Cost of the search-hardened league slot: none vs branchless vs static.

Times `ppo.update_step` (rollout + GAE + epochs, one jit) for three league
configurations at the same batch:

  none       — plain pool opponents (baseline)
  bernoulli  — --search-opponent: Bernoulli(p_search) sentinel episodes,
               search runs branchlessly for the WHOLE batch every opponent
               move (XLA cannot dynamically gather the sentinel subset)
  static     — --search-opponent --search-static: sentinel pinned to a
               static strided set of round(p_search*num_envs) rows, search
               runs on that static slice only
  static_cens— static + --search-censored: the sentinel search in
               information-set mode (ismc.py determinization)

Variants are interleaved best-of-N from ONE process (PERF rule 7).  On CPU
this measures the structural cost model (search work proportional to the
searched rows); absolute TPU numbers differ but the ratio carries.

Usage:
  JAX_PLATFORMS=cpu python scripts/bench_search_slot.py [--num-envs 1024]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from splendax.utils.cache import setup_runtime  # noqa: E402

setup_runtime()

import jax  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=1024)
    ap.add_argument("--num-steps", type=int, default=16)
    ap.add_argument("--p-search", type=float, default=0.125)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from splendax.train import ppo
    from splendax.train.config import PPOConfig
    from splendax.utils.sync import sync

    base = dict(
        total_timesteps=args.num_envs * args.num_steps * 10,
        num_envs=args.num_envs,
        num_steps=args.num_steps,
        minibatch_size=args.num_envs * args.num_steps,
        eval_games=8,
        seed=0,
        search_m=8,
        search_k0=4,
        search_horizon=2,
        p_search=args.p_search,
    )
    variants = {
        "none": PPOConfig(**base),
        "bernoulli": PPOConfig(**base, search_opponent=True),
        "static": PPOConfig(**base, search_opponent=True, search_static=True),
        # --search-censored on top of static: the sentinel search runs in
        # information-set mode (per-playout determinization, search/ismc.py)
        # — the extra cost of an information-FAIR sparring partner.
        "static_cens": PPOConfig(**base, search_opponent=True,
                                 search_static=True, search_censored=True),
    }

    steps = {}
    states = {}
    for name, cfg in variants.items():
        ts = ppo.init_train_state(cfg)
        step = jax.jit(lambda ts, cfg=cfg: ppo.update_step(cfg, ts))
        ts, m = step(ts)  # compile + warm
        sync(m)
        steps[name], states[name] = step, ts

    best = {name: float("inf") for name in variants}
    for _ in range(args.reps):  # interleaved best-of-N
        for name in variants:
            t0 = time.perf_counter()
            states[name], m = steps[name](states[name])
            sync(m)
            best[name] = min(best[name], time.perf_counter() - t0)

    turns = args.num_envs * args.num_steps
    print(f"# B={args.num_envs} T={args.num_steps} p={args.p_search} "
          f"m8 k4 h2, best of {args.reps}, platform={jax.default_backend()}")
    for name, sec in best.items():
        print(f"{name:>10s}: {sec*1e3:8.1f} ms/update  "
              f"{turns/sec/1e3:8.1f}k turns/s  "
              f"slowdown vs none: {sec/best['none']:.2f}x")


if __name__ == "__main__":
    main()
