"""GameState pytree: struct-of-arrays Splendor state for JAX.

TPU-first replacement for the reference's object graph
(`splendor_gym/engine/state.py:36-104`: dataclasses with python lists/dicts).
Everything is a fixed-width int32 array so a batch of games is just a leading
axis added by `vmap`, and `lax` control flow stays branchless.

Design notes (vs reference):
  * decks: the reference keeps `List[Card]` and pops from the END
    (`rules.py:125-127,244`; `state.py:188-191`).  We store the full shuffled
    permutation per tier (`deck_perm[t, :]`, padded to 40) plus a live-count
    `deck_count[t]`; "pop" = read `deck_perm[t, deck_count-1]`, decrement.
  * reserved cards: fixed 3-slot id arrays + per-slot revealed flags +
    a count, mirroring list append/pop-with-shift semantics.
  * winner: -1 encodes the reference's `winner_index=None` (draw / unset).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from . import data as D

NUM_PLAYERS = 2  # reference env is 2-player only (splendor_env.py:28-29)
NUM_NOBLES_VISIBLE = 3  # min(num_players + 1, 10) for 2 players (state.py:194)
TURN_LIMIT = 100  # full rounds; reaching it is a draw (rules.py:274-279)
TOKEN_CAP = 10  # max tokens in hand after end of turn (rules.py:188-193)


@struct.dataclass
class GameState:
    """Complete state of one 2-player Splendor game (all int32 unless noted)."""

    bank: jnp.ndarray  # [6] tokens by W,B,G,R,K,gold
    tokens: jnp.ndarray  # [2, 6] per-player tokens
    bonuses: jnp.ndarray  # [2, 5] per-player card bonuses
    prestige: jnp.ndarray  # [2]
    reserved_ids: jnp.ndarray  # [2, 3] card id or -1
    reserved_revealed: jnp.ndarray  # [2, 3] 1 if reserved from board (public)
    reserved_count: jnp.ndarray  # [2]
    player_nobles: jnp.ndarray  # [2, 3] noble id or -1 (won nobles, render only)
    noble_ids: jnp.ndarray  # [3] visible noble id or -1
    board: jnp.ndarray  # [3, 4] card id or -1 (tier-1 row 0)
    deck_perm: jnp.ndarray  # [3, 40] shuffled card ids, -1 padded
    deck_count: jnp.ndarray  # [3] cards remaining in each deck
    to_play: jnp.ndarray  # [] 0 or 1
    turn_count: jnp.ndarray  # [] full rounds, starts at 1
    move_count: jnp.ndarray  # [] total moves made
    game_over: jnp.ndarray  # [] bool
    winner: jnp.ndarray  # [] -1 none/draw, else player index
    turn_limit_reached: jnp.ndarray  # [] bool


def _blank_state_np() -> dict:
    return dict(
        bank=D.DEFAULT_BANK.copy(),
        tokens=np.zeros((NUM_PLAYERS, 6), np.int32),
        bonuses=np.zeros((NUM_PLAYERS, 5), np.int32),
        prestige=np.zeros(NUM_PLAYERS, np.int32),
        reserved_ids=np.full((NUM_PLAYERS, 3), -1, np.int32),
        reserved_revealed=np.zeros((NUM_PLAYERS, 3), np.int32),
        reserved_count=np.zeros(NUM_PLAYERS, np.int32),
        player_nobles=np.full((NUM_PLAYERS, 3), -1, np.int32),
        noble_ids=np.full(NUM_NOBLES_VISIBLE, -1, np.int32),
        board=np.full((3, 4), -1, np.int32),
        deck_perm=np.full((3, D.MAX_DECK), -1, np.int32),
        deck_count=np.zeros(3, np.int32),
        to_play=np.int32(0),
        turn_count=np.int32(1),
        move_count=np.int32(0),
        game_over=np.bool_(False),
        winner=np.int32(-1),
        turn_limit_reached=np.bool_(False),
    )


def initial_state(key: jnp.ndarray) -> GameState:
    """Device-side initial state: decks/nobles shuffled with JAX threefry.

    Semantics match reference `initial_state` (state.py:181-211): per-tier
    shuffle, board slot i takes the i-th pop from the deck END, 3 nobles
    revealed.  RNG stream differs from CPython's Mersenne-Twister by design
    (fast mode); use `initial_state_parity` for bit-exact reference resets.
    """
    import jax

    keys = jax.random.split(key, 4)
    deck_perm = jnp.full((3, D.MAX_DECK), -1, dtype=jnp.int32)
    board = jnp.full((3, 4), -1, dtype=jnp.int32)
    sizes = jnp.asarray(D.TIER_SIZES)
    for t in range(3):
        n = int(D.TIER_SIZES[t])
        ids = jnp.arange(D.TIER_OFFSETS[t], D.TIER_OFFSETS[t] + n, dtype=jnp.int32)
        perm = jax.random.permutation(keys[t], ids)
        deck_perm = deck_perm.at[t, :n].set(perm)
        # board slot i = i-th pop from the end (state.py:188-191)
        board = board.at[t].set(perm[n - 1 : n - 5 : -1])
    noble_perm = jax.random.permutation(keys[3], jnp.arange(D.NUM_NOBLES, dtype=jnp.int32))
    b = _blank_state_np()
    return GameState(
        bank=jnp.asarray(b["bank"]),
        tokens=jnp.asarray(b["tokens"]),
        bonuses=jnp.asarray(b["bonuses"]),
        prestige=jnp.asarray(b["prestige"]),
        reserved_ids=jnp.asarray(b["reserved_ids"]),
        reserved_revealed=jnp.asarray(b["reserved_revealed"]),
        reserved_count=jnp.asarray(b["reserved_count"]),
        player_nobles=jnp.asarray(b["player_nobles"]),
        noble_ids=noble_perm[:NUM_NOBLES_VISIBLE],
        board=board,
        deck_perm=deck_perm,
        deck_count=sizes - 4,
        to_play=jnp.int32(0),
        turn_count=jnp.int32(1),
        move_count=jnp.int32(0),
        game_over=jnp.asarray(False),
        winner=jnp.int32(-1),
        turn_limit_reached=jnp.asarray(False),
    )


def initial_state_parity(seed: int, device=None) -> GameState:
    """Host-side initial state bit-identical to the reference for `seed`.

    Reproduces the exact CPython `random.Random(seed)` shuffle sequence of
    reference `initial_state` (state.py:181-195): shuffle tier-1 deck, pop 4
    to board slots 0..3, same for tiers 2 and 3, then shuffle the noble list
    and reveal the first 3 — all consuming one shared MT19937 stream.
    """
    import random

    rng = random.Random(seed)
    b = _blank_state_np()
    for t in range(3):
        n = int(D.TIER_SIZES[t])
        ids = list(range(int(D.TIER_OFFSETS[t]), int(D.TIER_OFFSETS[t]) + n))
        rng.shuffle(ids)
        for slot in range(4):
            b["board"][t, slot] = ids.pop()
        b["deck_perm"][t, : n - 4] = ids
        b["deck_count"][t] = n - 4
    nobles = list(range(D.NUM_NOBLES))
    rng.shuffle(nobles)
    b["noble_ids"] = np.asarray(nobles[:NUM_NOBLES_VISIBLE], np.int32)
    if device is not None:
        import jax

        return GameState(**{k: jax.device_put(v, device) for k, v in b.items()})
    return GameState(**{k: jnp.asarray(v) for k, v in b.items()})
