"""Batched functional Splendor environment.

TPU-first replacement for the reference Gym adapter
(`splendor_gym/envs/splendor_env.py:41-115`): instead of a stateful object
stepping one python game, the environment is a pure function
`(GameState, action) -> (GameState, StepOutput)` that `vmap` lifts to
thousands of lockstep games and `lax.scan` rolls out entirely on device.

Reference edge-case contract reproduced exactly:
  * no legal moves  -> declare draw: reward 0, `draw=True`, game over with
    winner None and `to_play=0` (splendor_env.py:56-61)
  * illegal (masked-off) action -> reward -0.01, state unchanged,
    `illegal_action=True` (splendor_env.py:64-66)
  * terminal reward from the POV of the player who JUST moved: +1/-1/0,
    except -0.1 for a turn-limit draw (splendor_env.py:71-80)
  * `final_rewards` for both players on termination (splendor_env.py:92-115)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from ..engine import rules
from ..engine.encode import encode_observation, OBSERVATION_DIM
from ..engine.rules import TOTAL_ACTIONS
from ..engine.types import GameState, initial_state


@struct.dataclass
class StepOutput:
    """Everything the reference `step()` returns via obs/reward/info."""

    obs: jnp.ndarray  # int32[297], next observation (current player POV)
    reward: jnp.ndarray  # f32, just-moved player's reward
    terminated: jnp.ndarray  # bool
    action_mask: jnp.ndarray  # bool[45] for the next state (zeros if terminal)
    to_play: jnp.ndarray  # int32
    illegal_action: jnp.ndarray  # bool
    draw: jnp.ndarray  # bool (stalemate: no legal moves)
    turn_limit: jnp.ndarray  # bool
    final_rewards: jnp.ndarray  # f32[2], zeros until terminal


def reset(key: jnp.ndarray):
    """Fresh game -> (state, obs, mask)."""
    state = initial_state(key)
    return state, encode_observation(state), rules.legal_mask(state)


def final_rewards_of(state: GameState) -> jnp.ndarray:
    """Per-player terminal rewards (reference get_final_rewards,
    splendor_env.py:92-115); zeros if the game simply isn't over."""
    w = state.winner
    draw_r = jnp.where(state.turn_limit_reached, -0.1, 0.0)
    per = jnp.where(
        w < 0,
        jnp.full(2, draw_r),
        jnp.where(jnp.arange(2) == w, 1.0, -1.0),
    )
    return per.astype(jnp.float32)


def step_core(state: GameState, action, rng_mode: str = "fast", mask=None):
    """State transition + reward/termination flags, WITHOUT the observation
    encode or the next legality mask.

    Autoreset paths build obs/mask from the post-reset carry instead (one
    encode + one mask build per step, not two of each — see
    `step_autoreset_ring`); `step` wraps this with the encodes for the plain
    single-transition API.  Returns (next_state, fields) where `fields` are
    the StepOutput kwargs except obs/action_mask.
    """
    action = jnp.clip(jnp.asarray(action, jnp.int32), 0, TOTAL_ACTIONS - 1)
    if mask is None:
        mask = rules.legal_mask(state)
    any_legal = mask.any()
    # One-hot contraction, NOT mask[action]: a traced-index read lowers to a
    # per-row gather under vmap that alone cost ~0.34 ms/step at batch 32768
    # (~29% of the whole step body, engine perf rule 2 / docs/PERF.md).
    legal = (mask & (jnp.arange(TOTAL_ACTIONS) == action)).any() & any_legal

    # Branch A: stalemate -> draw (splendor_env.py:56-61).
    drawn = state.replace(
        game_over=jnp.asarray(True), winner=jnp.int32(-1), to_play=jnp.int32(0)
    )
    # Branch C: legal action applied (runs speculatively; discarded otherwise).
    applied = rules.apply_action(state, action, rng_mode=rng_mode)

    next_state = jax.tree.map(
        lambda a, b, c: jnp.where(~any_legal, a, jnp.where(legal, c, b)),
        drawn,
        state,
        applied,
    )

    terminated = rules.is_terminal(next_state)

    w = next_state.winner
    just_moved = (next_state.to_play - 1) % 2
    win_reward = jnp.where(
        (w < 0) & next_state.turn_limit_reached,
        -0.1,
        jnp.where(w < 0, 0.0, jnp.where(w == just_moved, 1.0, -1.0)),
    )
    reward = jnp.where(
        ~any_legal, 0.0, jnp.where(legal, jnp.where(terminated, win_reward, 0.0), -0.01)
    ).astype(jnp.float32)

    fields = dict(
        reward=reward,
        terminated=terminated,
        to_play=next_state.to_play,
        illegal_action=any_legal & ~legal,
        draw=~any_legal,
        turn_limit=terminated & next_state.turn_limit_reached,
        final_rewards=jnp.where(terminated, final_rewards_of(next_state), 0.0),
    )
    return next_state, fields


@partial(jax.jit, static_argnames=("rng_mode",))
def step(state: GameState, action, rng_mode: str = "fast", mask=None):
    """One env transition for one game; all three reference branches fused.

    `mask` may pass in this state's legality mask if the caller already has
    it (it is returned by reset/step), saving a rebuild in the hot loop.
    """
    next_state, fields = step_core(state, action, rng_mode=rng_mode, mask=mask)
    obs = encode_observation(next_state)
    next_mask = jnp.where(fields["terminated"], False, rules.legal_mask(next_state))
    return next_state, StepOutput(obs=obs, action_mask=next_mask, **fields)


# Batched variants -----------------------------------------------------------

reset_batch = jax.jit(jax.vmap(reset))
step_batch = jax.jit(jax.vmap(step, in_axes=(0, 0)), static_argnames=())


@partial(jax.jit, static_argnames=("rng_mode",))
def step_autoreset(state: GameState, action, key, rng_mode: str = "fast", mask=None):
    """Batched step with per-game auto-reset.

    Where a game terminates, the carried state becomes a fresh game (seeded by
    folding `key` with the lane index) and `obs_next`/`mask_next` come from the
    reset, while `out` keeps the terminal observation, reward and
    final_rewards — the pattern the reference training loop implements in
    python (`ppo_splendor.py:245-250`).
    """
    B = action.shape[0]
    if mask is None:
        next_state, out = jax.vmap(partial(step, rng_mode=rng_mode))(state, action)
    else:
        next_state, out = jax.vmap(
            lambda s, a, m: step(s, a, rng_mode=rng_mode, mask=m)
        )(state, action, mask)
    keys = jax.random.split(key, B)
    fresh_state, fresh_obs, fresh_mask = jax.vmap(reset)(keys)

    done = out.terminated

    def pick(fresh, cur):
        d = done.reshape((B,) + (1,) * (cur.ndim - 1))
        return jnp.where(d, fresh, cur)

    carry = jax.tree.map(pick, fresh_state, next_state)
    obs_next = pick(fresh_obs, out.obs)
    mask_next = pick(fresh_mask, out.action_mask)
    return carry, out, obs_next, mask_next
