"""Pure-functional JAX Splendor rules engine.

Public surface mirrors the reference engine package
(`splendor_gym/engine/__init__.py:1-14`) with JAX-native signatures:
states are `GameState` pytrees, masks are bool[45] arrays, and the
transition is a pure function.
"""

from .types import (
    GameState,
    initial_state,
    initial_state_parity,
    NUM_PLAYERS,
    TURN_LIMIT,
    TOKEN_CAP,
)
from .rules import (
    legal_mask,
    apply_action,
    is_terminal,
    compute_winner,
    TOTAL_ACTIONS,
    TAKE3_OFFSET,
    TAKE3_COUNT,
    TAKE2_OFFSET,
    TAKE2_COUNT,
    BUY_VISIBLE_OFFSET,
    BUY_VISIBLE_COUNT,
    RESERVE_VISIBLE_OFFSET,
    RESERVE_VISIBLE_COUNT,
    RESERVE_BLIND_OFFSET,
    RESERVE_BLIND_COUNT,
    BUY_RESERVED_OFFSET,
    BUY_RESERVED_COUNT,
)
from .encode import encode_observation, OBSERVATION_DIM
from .data import TAKE3_COMBOS, TOKEN_COLORS, STANDARD_COLORS

__all__ = [
    "GameState",
    "initial_state",
    "initial_state_parity",
    "legal_mask",
    "apply_action",
    "is_terminal",
    "compute_winner",
    "encode_observation",
    "NUM_PLAYERS",
    "TURN_LIMIT",
    "TOKEN_CAP",
    "TOTAL_ACTIONS",
    "OBSERVATION_DIM",
    "TAKE3_COMBOS",
    "TOKEN_COLORS",
    "STANDARD_COLORS",
]
