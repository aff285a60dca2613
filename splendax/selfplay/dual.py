"""On-device dual-step self-play combinator.

The TPU-native equivalent of `DualStepNativeWrapper.dual_step`
(`splendor_gym/wrappers/dual_step_native.py:90-193`): one call advances a
complete turn — agent (player 0) move, then opponent (player 1) move — for a
whole batch of games inside one fused XLA program.  The reference stepped
each env in a python loop with a batch-1 torch forward per opponent move
(`ppo_splendor.py:233-268`); here the opponent acts via a single batched
forward / vectorized heuristic.

Reward contract (dual_step_native.py:150-193):
  * game ends on the agent's move  -> agent gets that step's reward,
    opponent gets final_rewards[1]
  * game ends on the opponent's move -> agent gets final_rewards[0],
    opponent gets that step's reward
  * turn completes, game continues -> both get 0
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct

from ..engine.types import GameState
from ..env import core


@struct.dataclass
class DualStepOutput:
    agent_obs: jnp.ndarray  # int32[B, 297] after the complete turn
    agent_reward: jnp.ndarray  # f32[B]
    opp_obs: jnp.ndarray  # int32[B, 297]
    opp_reward: jnp.ndarray  # f32[B]
    done: jnp.ndarray  # bool[B]
    action_mask: jnp.ndarray  # bool[B, 45] agent's next mask (zeros if done)
    opp_action: jnp.ndarray  # int32[B]
    ended_on_agent: jnp.ndarray  # bool[B]
    illegal_agent: jnp.ndarray  # bool[B]
    turn_limit: jnp.ndarray  # bool[B]


def dual_step(
    state: GameState,
    agent_action: jnp.ndarray,
    opponent_policy: Callable,
    key: jnp.ndarray,
    rng_mode: str = "fast",
) -> tuple[GameState, DualStepOutput]:
    """Batched complete turn.  `opponent_policy(obs, mask, state, key) -> a`
    operates on full [B, ...] batches (vmap heuristics or batched nets)."""
    B = agent_action.shape[0]
    step_b = jax.vmap(partial(core.step, rng_mode=rng_mode))

    # Phase 1: agent moves.
    state1, out_a = step_b(state, agent_action)
    done_a = out_a.terminated

    # Phase 2 runs only if the game continues AND it is really the
    # opponent's turn.  After an illegal agent action the reference wrappers
    # raise (`dual_step_native.py:158-160`); masked policies never trigger
    # that, and here the turn simply ends as a -0.01 no-op, which is the
    # robust batched equivalent.
    opp_phase = ~done_a & (state1.to_play == 1)

    # Speculative opponent move (discarded where ~opp_phase).
    opp_action = opponent_policy(out_a.obs, out_a.action_mask, state1, key)
    state2, out_b = step_b(state1, opp_action)

    done = done_a | (opp_phase & out_b.terminated)

    def sel(one_move, two_move):
        d = opp_phase.reshape((B,) + (1,) * (one_move.ndim - 1))
        return jnp.where(d, two_move, one_move)

    next_state = jax.tree.map(sel, state1, state2)
    agent_obs = sel(out_a.obs, out_b.obs)
    mask = jnp.where(done[:, None], False, sel(out_a.action_mask, out_b.action_mask))
    agent_reward = jnp.where(
        opp_phase,
        jnp.where(out_b.terminated, out_b.final_rewards[:, 0], 0.0),
        out_a.reward,  # terminal POV reward, or the -0.01 illegal penalty
    )
    opp_reward = jnp.where(opp_phase, out_b.reward, out_a.final_rewards[:, 1])

    out = DualStepOutput(
        agent_obs=agent_obs,
        agent_reward=agent_reward.astype(jnp.float32),
        opp_obs=agent_obs,  # same board; encoding is perspective-driven
        opp_reward=opp_reward.astype(jnp.float32),
        done=done,
        action_mask=mask,
        opp_action=opp_action,
        ended_on_agent=done_a,
        illegal_agent=out_a.illegal_action,
        turn_limit=sel(out_a.turn_limit, out_b.turn_limit),
    )
    return next_state, out


def dual_step_autoreset_ring(
    state: GameState,
    agent_action: jnp.ndarray,
    opponent_policy: Callable,
    key: jnp.ndarray,
    ring,
    rng_mode: str = "fast",
):
    """`dual_step_autoreset` with ring-amortized resets (env/ring.py): fresh
    games come from a pre-generated FreshGameRing instead of a full-batch
    reset every turn.  Returns (carry, out, obs_next, mask_next, done, ring).
    """
    from ..env import ring as ring_lib

    B = agent_action.shape[0]
    next_state, out = dual_step(state, agent_action, opponent_policy, key, rng_mode)
    fresh_state, _fresh_mask, ring = ring_lib.take(ring, out.done)

    done = out.done

    def pick(fresh, cur):
        d = done.reshape((B,) + (1,) * (cur.ndim - 1))
        return jnp.where(d, fresh, cur)

    carry = jax.tree.map(pick, fresh_state, next_state)
    # Re-encode obs and rebuild the mask from the selected carry — exactly
    # equal to selecting fresh vs stepped values per lane (encode/legal_mask
    # are pure per-game functions; see env/ring.py module docstring).  This
    # also makes the phase-2 obs/mask inside `out` dead code in the training
    # rollout, which only consumes rewards/done from `out`.
    from ..engine import rules
    from ..engine.encode import encode_observation

    obs_next = jax.vmap(encode_observation)(carry)
    mask_next = jax.vmap(rules.legal_mask)(carry)
    return carry, out, obs_next, mask_next, done, ring


def dual_step_autoreset(
    state: GameState,
    agent_action: jnp.ndarray,
    opponent_policy: Callable,
    key: jnp.ndarray,
    rng_mode: str = "fast",
):
    """dual_step + fresh games where done (the on-device analogue of the
    training loop's reset-on-done, ppo_splendor.py:245-250).

    Returns (carry_state, out, obs_next, mask_next, reset_mask): `out` keeps
    terminal data for GAE; obs/mask_next feed the next policy call.
    """
    B = agent_action.shape[0]
    k_opp, k_reset = jax.random.split(key)
    next_state, out = dual_step(state, agent_action, opponent_policy, k_opp, rng_mode)
    fresh_state, fresh_obs, fresh_mask = jax.vmap(core.reset)(
        jax.random.split(k_reset, B)
    )

    done = out.done

    def pick(fresh, cur):
        d = done.reshape((B,) + (1,) * (cur.ndim - 1))
        return jnp.where(d, fresh, cur)

    carry = jax.tree.map(pick, fresh_state, next_state)
    obs_next = pick(fresh_obs, out.agent_obs)
    mask_next = pick(fresh_mask, out.action_mask)
    return carry, out, obs_next, mask_next, done
