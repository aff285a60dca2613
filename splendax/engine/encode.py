"""Observation encoder: GameState -> int32[297].

Exact layout of the reference encoder (`splendor_gym/engine/encode.py:62-187`),
re-built as one-hot MXU contractions + one concatenate instead of 297 python
appends:

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

TPU notes (measured in-scan at batch 32768 on v5e; see docs/PERF.md):
  * per-player rows are read with a two-way select (`_sel2`), never `arr[p]`
    with traced p — each such dynamic gather costs a fixed ~0.2 ms;
  * card/noble feature lookups use one-hot bf16 matmuls against the constant
    feature tables instead of row gathers — the one-hot compare fuses into
    the MXU operand and measures ~free, vs ~1 ms for the 12-card gather.
    Table values are small integers (< 256), so bf16 products with f32
    accumulation are exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import data as D
from .types import GameState, NUM_PLAYERS

OBSERVATION_DIM = 297

# ensure_compile_time_eval: the module may be imported lazily from inside an
# active jit trace; without it these constants would be staged into the open
# jaxpr and escape as leaked tracers (see rules.py's table block).
with jax.ensure_compile_time_eval():
    _FEAT13 = jnp.asarray(D.CARD_FEAT13)  # [91, 13], row 0 = absent
    _NOBLE6 = jnp.asarray(D.NOBLE_FEAT6)  # [11, 6]
    _FEAT13_BF = _FEAT13.astype(jnp.bfloat16)
    _NOBLE6_BF = _NOBLE6.astype(jnp.bfloat16)


from .rules import _onehot_rows as _onehot_lookup  # shared MXU table lookup


def _sel2(arr: jnp.ndarray, p) -> jnp.ndarray:
    """Row p of a [2, ...] per-player array, p traced in {0, 1}.

    A traced-index read `arr[p]` lowers to a dynamic gather that costs a
    fixed ~0.2 ms per op under vmap on TPU (PERF rule #2); a two-way select
    against static rows fuses for free."""
    return jnp.where(p == 0, arr[0], arr[1])


def _player_summary(state: GameState, p) -> jnp.ndarray:
    return jnp.concatenate(
        [
            _sel2(state.tokens, p),
            _sel2(state.bonuses, p),
            _sel2(state.prestige, p)[None],
            _sel2(state.reserved_count, p)[None],
        ]
    )


def _reserved_block(feat, ids, revealed_in_obs, count) -> jnp.ndarray:
    """3 x 14 reserved-card block from pre-looked-up card features [3, 13].
    `revealed_in_obs[i]` gates visibility AND provides the 14th element;
    invisible or empty slots are all-zeros."""
    present = (ids >= 0) & (jnp.arange(3) < count)
    rows = jnp.concatenate([feat, revealed_in_obs[:, None].astype(jnp.int32)], axis=1)
    visible = present & (revealed_in_obs > 0)
    return jnp.where(visible[:, None], rows, 0).reshape(-1)


@jax.jit
def encode_observation(state: GameState) -> jnp.ndarray:
    p = state.to_play
    o = (state.to_play + 1) % NUM_PLAYERS

    res_p = _sel2(state.reserved_ids, p)
    res_o = _sel2(state.reserved_ids, o)

    # One fused lookup for all 18 card slots: board 12 + own 3 + opp 3.
    all_ids = jnp.concatenate([state.board.reshape(12), res_p, res_o]) + 1
    all_feats = _onehot_lookup(all_ids, _FEAT13_BF)  # [18, 13]
    board_feats = all_feats[:12].reshape(-1)  # [156]

    # Own reserved: always fully visible with revealed=1 (encode.py:151-155).
    own = _reserved_block(
        all_feats[12:15], res_p, jnp.ones(3, jnp.int32), _sel2(state.reserved_count, p)
    )
    # Opponent reserved: censored unless revealed (encode.py:157-168).
    opp = _reserved_block(
        all_feats[15:18],
        res_o,
        _sel2(state.reserved_revealed, o),
        _sel2(state.reserved_count, o),
    )

    nobles = _onehot_lookup(state.noble_ids + 1, _NOBLE6_BF).reshape(-1)  # [18]

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
