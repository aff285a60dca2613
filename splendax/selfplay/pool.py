"""On-device opponent pool: stacked parameter snapshots.

The reference keeps a python list of `state_dict` snapshots and rebuilds a
frozen torch net per episode (`ppo_splendor.py:135-143,367-370`,
`training_utils.py:263-276`).  Here the pool is a single pytree whose leaves
have a leading axis of `pool_size + 1`:

  * slots `0..pool_size-1`: FIFO ring of frozen snapshots
  * slot `pool_size` (CURRENT_SLOT): refreshed with the live params at the
    start of every rollout, so "face the current policy with p_current"
    (ppo_splendor.py:139-140) is just sampling that index.

Per-game opponent selection is an int32 index; the opponent forward computes
logits under ALL pool entries with one stacked (dense, MXU-friendly) matmul
batch and gathers each game's row — avoiding a per-game parameter gather
that would materialize params × batch memory.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..models import actor_critic as ac


@struct.dataclass
class OpponentPool:
    stack: dict  # pytree, leaves [pool_size+1, ...]
    n_snapshots: jnp.ndarray  # int32, total snapshots ever pushed
    p_current: jnp.ndarray  # f32
    # Per-slot outcome stats from the AGENT's POV (slot = opponent), fed by
    # rollout episode results; drive PFSP sampling and reset when a slot is
    # overwritten.  Beyond the reference (whose supplier is always uniform,
    # ppo_splendor.py:137-143).
    wins: jnp.ndarray  # f32[pool_size+1]
    games: jnp.ndarray  # f32[pool_size+1]

    @property
    def pool_size(self) -> int:
        return jax.tree.leaves(self.stack)[0].shape[0] - 1

    @property
    def filled(self) -> jnp.ndarray:
        return jnp.minimum(self.n_snapshots, self.pool_size)

    @property
    def win_rates(self) -> jnp.ndarray:
        """Agent win-rate per slot; 0.5 prior below 8 games of evidence."""
        return jnp.where(
            self.games >= 8, self.wins / jnp.maximum(self.games, 1.0), 0.5
        )


def init_pool(params, pool_size: int, p_current: float = 0.25) -> OpponentPool:
    stack = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (pool_size + 1,) + x.shape).copy(), params
    )
    return OpponentPool(
        stack=stack,
        n_snapshots=jnp.int32(0),
        p_current=jnp.float32(p_current),
        wins=jnp.zeros(pool_size + 1, jnp.float32),
        games=jnp.zeros(pool_size + 1, jnp.float32),
    )


def set_current(pool: OpponentPool, params) -> OpponentPool:
    """Write the live params into the CURRENT slot (last index).  Its stats
    reset: each rollout faces a NEW current policy."""
    idx = pool.pool_size
    stack = jax.tree.map(lambda s, p: s.at[idx].set(p), pool.stack, params)
    return pool.replace(
        stack=stack,
        wins=pool.wins.at[idx].set(0.0),
        games=pool.games.at[idx].set(0.0),
    )


def push_snapshot(pool: OpponentPool, params) -> OpponentPool:
    """FIFO ring append (reference: append + pop(0) at cap,
    ppo_splendor.py:367-370).  The overwritten slot's stats reset."""
    slot = pool.n_snapshots % pool.pool_size
    stack = jax.tree.map(lambda s, p: s.at[slot].set(p), pool.stack, params)
    return pool.replace(
        stack=stack,
        n_snapshots=pool.n_snapshots + 1,
        wins=pool.wins.at[slot].set(0.0),
        games=pool.games.at[slot].set(0.0),
    )


def record_outcomes(pool: OpponentPool, opp_idx, done, won) -> OpponentPool:
    """Accumulate finished-episode outcomes into per-slot stats.

    `opp_idx` int32[B] slot per game, `done`/`won` bool[B].  One [B, P+1]
    one-hot contraction — no scatters (engine perf rule 1)."""
    P1 = pool.pool_size + 1
    oh = (jnp.arange(P1)[None, :] == opp_idx[:, None]).astype(jnp.float32)
    d = done.astype(jnp.float32)[:, None]
    w = (done & won).astype(jnp.float32)[:, None]
    return pool.replace(
        wins=pool.wins + (oh * w).sum(0), games=pool.games + (oh * d).sum(0)
    )


def sample_opponent_idx(
    pool: OpponentPool, key, shape, mode: str = "uniform"
) -> jnp.ndarray:
    """Per-episode opponent sampling: CURRENT with probability p_current
    (always, if the pool is empty) — reference semantics
    (ppo_splendor.py:137-143) — else a frozen snapshot:

      * mode="uniform": uniform over filled slots (the reference supplier)
      * mode="pfsp": prioritized fictitious self-play — slot weight
        (1 - winrate)^2 + 0.05, so opponents the agent still loses to are
        replayed preferentially and beaten ones fade (AlphaStar-style
        "hard" weighting); unbeaten stats default to the 0.5 prior.
    """
    k1, k2 = jax.random.split(key)
    filled = pool.filled
    use_current = (filled == 0) | (
        jax.random.uniform(k1, shape) < pool.p_current
    )
    if mode == "uniform":
        frozen = jax.random.randint(k2, shape, 0, jnp.maximum(filled, 1))
    elif mode == "pfsp":
        P1 = pool.pool_size + 1
        in_pool = jnp.arange(P1) < filled
        hard = (1.0 - pool.win_rates) ** 2 + 0.05
        logits = jnp.where(in_pool, jnp.log(hard), -jnp.inf)
        # zero filled slots (fresh pool) -> all -inf logits would NaN; the
        # use_current branch wins in that case, any index works.
        logits = jnp.where(filled == 0, 0.0, logits)
        frozen = jax.random.categorical(k2, logits, shape=shape)
    else:
        raise ValueError(f"unknown opponent sampling mode {mode!r}")
    return jnp.where(use_current, pool.pool_size, frozen).astype(jnp.int32)


def pool_greedy_policy(pool: OpponentPool, opp_idx):
    """Opponent policy closure for `dual_step`: greedy argmax of masked
    logits under each game's sampled pool entry (the reference's
    model_greedy_policy_from / frozen_policy_from semantics)."""

    def policy(obs, mask, state, key):
        # [P+1, B, 45] stacked forward, then a one-hot contraction over the
        # pool axis — NOT logits_all[opp_idx, arange(B)]: that per-game row
        # gather cost ~2.5 ms/update on v5e (docs/PERF.md trace notes), the
        # contraction is exact (one nonzero term) and fuses.
        logits_all = jax.vmap(lambda p: ac.actor_logits(p, obs))(pool.stack)
        P = logits_all.shape[0]
        oh = jnp.arange(P)[:, None] == opp_idx[None, :]  # [P+1, B]
        # Elementwise select+reduce (NOT einsum/dot: TPU default matmul
        # precision is bf16, which would round the selected logits).
        logits = jnp.where(oh[:, :, None], logits_all, 0.0).sum(axis=0)
        return ac.greedy_action(logits, mask)

    return policy
