"""Noble-rush heuristic opponent.

The reference ships `eval_vs_noble.py` importing
`splendor_gym.strategies.noble_strategy` — a module that does not exist
anywhere in its tree (reference eval_vs_noble.py:9; recorded in
docs/DEFECTS.md).  This implements the capability the script intends: an
opponent that races the visible nobles by buying/collecting the bonus colors
nobles require.

Strategy (device-jittable, operates on the true state):
  1. Buy any affordable card whose bonus color is still needed by the most
     attainable visible noble; otherwise any affordable card with points.
  2. Otherwise take tokens weighted toward colors of cards of the needed
     bonus colors: take-3 maximizing overlap with needed colors.
  3. Otherwise reserve / first legal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..engine import data as D
from ..engine import rules as R
from ..selfplay.opponents import (
    DEVICE_POLICIES,
    GROUP_BUY_RES,
    GROUP_BUY_VIS,
    GROUP_RESERVE,
    GROUP_TAKE2,
    GROUP_TAKE3,
    first_legal,
)

_COLOR = jnp.asarray(D.CARD_COLOR_PAD)
_NOBLE_REQ = jnp.asarray(D.NOBLE_REQ)
_COMBO = jnp.asarray(D.COMBO_MASK)


def _noble_needs(state, p):
    """[5] how much bonus per color the closest visible noble still needs."""
    vis = state.noble_ids
    req = _NOBLE_REQ[jnp.maximum(vis, 0)] * (vis >= 0)[:, None]  # [3,5]
    deficit = jnp.maximum(req - state.bonuses[p][None, :], 0)  # [3,5]
    total = deficit.sum(axis=1) + jnp.where(vis >= 0, 0, 1_000)
    closest = jnp.argmin(total)
    return deficit[closest]  # [5]


def _noble_single(obs, mask, state, key):
    p = state.to_play
    needs = _noble_needs(state, p)  # [5]

    # Score visible buys: needed-bonus-color cards first, then points.
    board = state.board.reshape(12)
    colors = _COLOR[board + 1]
    pts = jnp.asarray(D.CARD_POINTS_PAD)[board + 1]
    buy_score = needs[colors] * 10 + pts  # [12]
    buy_vis = mask[15:27]
    best_vis = jnp.argmax(jnp.where(buy_vis, buy_score, -1))
    has_vis = buy_vis.any()

    has_res = (mask & GROUP_BUY_RES).any()
    a_res = jnp.argmax(mask & GROUP_BUY_RES).astype(jnp.int32)

    # Take-3 maximizing overlap with needed colors.
    t3 = mask & GROUP_TAKE3
    overlap = (_COMBO * (needs > 0)[None, :]).sum(axis=1)  # [10]
    a_t3 = jnp.argmax(jnp.where(t3[:10], overlap, -1)).astype(jnp.int32)
    has_t3 = t3.any()

    has_t2 = (mask & GROUP_TAKE2).any()
    a_t2 = jnp.argmax(mask & GROUP_TAKE2).astype(jnp.int32)
    has_rsv = (mask & GROUP_RESERVE).any()
    a_rsv = jnp.argmax(mask & GROUP_RESERVE).astype(jnp.int32)

    return jnp.where(
        has_vis, 15 + best_vis,
        jnp.where(has_res, a_res,
                  jnp.where(has_t3, a_t3,
                            jnp.where(has_t2, a_t2,
                                      jnp.where(has_rsv, a_rsv, first_legal(mask))))),
    ).astype(jnp.int32)


def noble_policy(ctx, obs, mask, state, key):
    """Batched PolicySpec fn for eval harness use."""
    keys = jax.random.split(key, obs.shape[0])
    return jax.vmap(_noble_single)(obs, mask, state, keys)


# Register as a named device policy so `bots`/`--train-opponent` specs and
# `heuristic_policy("noble")` can use it like the other heuristics.
DEVICE_POLICIES["noble"] = _noble_single
