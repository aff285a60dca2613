"""Phase-level timing of the PPO update_step on the real chip.

Times (per call, after compile): full update_step, rollout-only, and the
isolated forward variants (agent single-params vs 13-entry pooled stacked
forward vs pallas fused) at the training batch size, to locate the
training-throughput levers.  Prints one JSON line per phase.
"""

from __future__ import annotations

import json
import os
import sys
import time

# NOTE: do NOT use PYTHONPATH for this — prepending to PYTHONPATH breaks the
# tunneled axon plugin's jax_plugins namespace-package discovery on this image.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from splendax.utils.cache import setup_runtime

setup_runtime()

import jax
from splendax.utils.sync import sync
import jax.numpy as jnp

from splendax.models import actor_critic as ac
from splendax.ops.fused_actor_critic import fused_masked_forward
from splendax.selfplay import pool as pool_lib
from splendax.train import ppo
from splendax.train.config import PPOConfig


def timeit(name, fn, *args, reps=10, **kw):
    out = fn(*args, **kw)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({"phase": name, "ms_per_call": round(dt * 1e3, 3)}))
    return dt


def main():
    cfg = PPOConfig(
        num_envs=4096, num_steps=64, minibatch_size=16384,
        total_timesteps=4096 * 64 * 10, pool_size=12,
    )
    ts = ppo.init_train_state(cfg)

    full = timeit("update_step", ppo.update_step, cfg, ts, reps=5)

    @jax.jit
    def rollout_only(ts):
        ts2, traj = ppo._rollout(cfg, ts)
        return traj.reward.sum()

    roll = timeit("rollout_only(64 turns)", rollout_only, ts, reps=5)

    obs, mask = ts.obs, ts.mask

    @jax.jit
    def agent_fwd(params, obs, mask):
        logits, value = ac.forward(params, obs)
        return ac.masked_logits(logits, mask), value

    a = timeit("agent_forward B=4096", agent_fwd, ts.params, obs, mask, reps=50)

    pool = pool_lib.set_current(ts.pool, ts.params)
    opp_idx = ts.opp_idx

    @jax.jit
    def pooled_fwd(stack, obs, mask, opp_idx):
        logits_all = jax.vmap(lambda p: ac.actor_logits(p, obs))(stack)
        logits = logits_all[opp_idx, jnp.arange(obs.shape[0])]
        return ac.greedy_action(logits, mask)

    p = timeit("pooled_forward(13x) B=4096", pooled_fwd, pool.stack, obs, mask,
               opp_idx, reps=50)

    f = timeit("pallas_fused_forward B=4096", fused_masked_forward, ts.params,
               obs, mask, reps=50)

    print(json.dumps({
        "summary": {
            "update_ms": round(full * 1e3, 2),
            "rollout_ms": round(roll * 1e3, 2),
            "update_phase_ms": round((full - roll) * 1e3, 2),
            "per_turn_ms": round(roll / cfg.num_steps * 1e3, 4),
            "agent_fwd_ms": round(a * 1e3, 4),
            "pooled_fwd_ms": round(p * 1e3, 4),
            "fused_fwd_ms": round(f * 1e3, 4),
            "fwd_share_of_turn": round((a + p) / (roll / cfg.num_steps), 3),
        }
    }))


if __name__ == "__main__" and "--env-pieces" not in sys.argv:
    main()


def profile_env_pieces():
    """Isolate env-ply vs reset cost inside the rollout turn."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from splendax.env import core

    B = 4096
    key = jax.random.PRNGKey(0)
    states, obs, mask = core.reset_batch(jax.random.split(key, B))

    step_b = jax.jit(jax.vmap(partial(core.step, rng_mode="fast")))
    acts = jnp.zeros((B,), jnp.int32)

    timeit("env_ply(step) B=4096", step_b, states, acts, reps=50)

    reset_b = jax.jit(lambda ks: core.reset_batch(ks))
    keys = jax.random.split(key, B)
    timeit("reset_batch B=4096", reset_b, keys, reps=50)


if __name__ == "__main__" and "--env-pieces" in sys.argv:
    profile_env_pieces()
