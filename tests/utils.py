"""Test helpers: functional state surgery, the JAX analogue of the
reference's fixture pattern (`splendor_gym/tests/utils.py:11-54` mutates
`env.state` in place; here we `replace()` fields on the GameState pytree)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from splendax.engine import GameState, initial_state_parity, legal_mask


def make_state(seed: int = 0) -> GameState:
    return initial_state_parity(seed)


def set_bank(state: GameState, w=0, b=0, g=0, r=0, k=0, gold=0) -> GameState:
    return state.replace(bank=jnp.asarray([w, b, g, r, k, gold], jnp.int32))


def set_player_tokens(state: GameState, p: int, w=0, b=0, g=0, r=0, k=0, gold=0):
    return state.replace(
        tokens=state.tokens.at[p].set(jnp.asarray([w, b, g, r, k, gold], jnp.int32))
    )


def set_player_bonuses(state: GameState, p: int, w=0, b=0, g=0, r=0, k=0):
    return state.replace(
        bonuses=state.bonuses.at[p].set(jnp.asarray([w, b, g, r, k], jnp.int32))
    )


def clear_board(state: GameState) -> GameState:
    return state.replace(board=jnp.full((3, 4), -1, jnp.int32))


def place_card(state: GameState, tier: int, slot: int, card_id: int) -> GameState:
    """tier is 1-based like the reference."""
    return state.replace(board=state.board.at[tier - 1, slot].set(card_id))


def empty_decks(state: GameState) -> GameState:
    return state.replace(deck_count=jnp.zeros(3, jnp.int32))


def reserve_card(state: GameState, p: int, card_id: int, revealed: bool) -> GameState:
    cnt = int(state.reserved_count[p])
    return state.replace(
        reserved_ids=state.reserved_ids.at[p, cnt].set(card_id),
        reserved_revealed=state.reserved_revealed.at[p, cnt].set(int(revealed)),
        reserved_count=state.reserved_count.at[p].add(1),
    )


def mask_np(state: GameState) -> np.ndarray:
    return np.asarray(legal_mask(state), dtype=np.int8)
