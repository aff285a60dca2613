"""Observation encoder: GameState -> int32[297].

Exact layout of the reference encoder (`splendor_gym/engine/encode.py:62-187`),
re-built as table gathers + one concatenate instead of 297 python appends:

  | offset | size | content                                                  |
  |--------|------|----------------------------------------------------------|
  |   0    |   6  | bank (W,B,G,R,K,gold)                                    |
  |   6    |  13  | current player: tokens(6), bonuses(5), prestige, res_cnt |
  |  19    |  13  | opponent: same summary                                   |
  |  32    | 156  | board: 12 x [present,tier,points,color1hot(5),cost(5)]   |
  | 188    |  42  | own reserved: 3 x 14 (card13 + revealed, always 1)       |
  | 230    |  42  | opp reserved: 3 x 14; ALL-ZERO while reserved blind      |
  | 272    |  18  | nobles: 3 x [present, req(5)]                            |
  | 290    |   3  | deck sizes (tiers 1..3)                                  |
  | 293    |   4  | turn_count, to_play, move_count, round_over_flag         |

The hidden-information censoring (blind reserves invisible to the opponent,
reference encode.py:157-168) is a single `where` on the revealed flag.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import data as D
from .types import GameState, NUM_PLAYERS

OBSERVATION_DIM = 297

_FEAT13 = jnp.asarray(D.CARD_FEAT13)  # [91, 13], row 0 = absent
_NOBLE6 = jnp.asarray(D.NOBLE_FEAT6)  # [11, 6]


def _player_summary(state: GameState, p) -> jnp.ndarray:
    return jnp.concatenate(
        [
            state.tokens[p],
            state.bonuses[p],
            state.prestige[p][None],
            state.reserved_count[p][None],
        ]
    )


def _reserved_block(ids, revealed_in_obs, count) -> jnp.ndarray:
    """3 x 14 reserved-card block. `revealed_in_obs[i]` gates visibility AND
    provides the 14th element; invisible or empty slots are all-zeros."""
    feat = _FEAT13[ids + 1]  # [3, 13]
    present = (ids >= 0) & (jnp.arange(3) < count)
    rows = jnp.concatenate([feat, revealed_in_obs[:, None].astype(jnp.int32)], axis=1)
    visible = present & (revealed_in_obs > 0)
    return jnp.where(visible[:, None], rows, 0).reshape(-1)


@jax.jit
def encode_observation(state: GameState) -> jnp.ndarray:
    p = state.to_play
    o = (state.to_play + 1) % NUM_PLAYERS

    board_feats = _FEAT13[state.board.reshape(12) + 1].reshape(-1)  # [156]

    # Own reserved: always fully visible with revealed=1 (encode.py:151-155).
    own = _reserved_block(
        state.reserved_ids[p], jnp.ones(3, jnp.int32), state.reserved_count[p]
    )
    # Opponent reserved: censored unless revealed (encode.py:157-168).
    opp = _reserved_block(
        state.reserved_ids[o], state.reserved_revealed[o], state.reserved_count[o]
    )

    nobles = _NOBLE6[state.noble_ids + 1].reshape(-1)  # [18]

    round_over = (state.game_over & (state.to_play == 0)).astype(jnp.int32)
    misc = jnp.stack(
        [state.turn_count, state.to_play, state.move_count, round_over]
    ).astype(jnp.int32)

    return jnp.concatenate(
        [
            state.bank,
            _player_summary(state, p),
            _player_summary(state, o),
            board_feats,
            own,
            opp,
            nobles,
            state.deck_count,
            misc,
        ]
    ).astype(jnp.int32)
