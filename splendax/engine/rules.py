"""Branchless Splendor rules kernel: legal mask + state transition.

TPU-first re-design of the reference rules engine
(`splendor_gym/engine/rules.py`).  The reference walks python lists and
dataclasses; here every rule is vectorized integer arithmetic over the
struct-of-arrays `GameState`, so the whole step compiles to one fused XLA
program and `vmap` turns it into thousands of lockstep games.

Semantics reproduced exactly (file:line cites into the reference):
  * reduced-color Take-3 legality and execution (rules.py:48-58,201-210)
  * Take-2 needs bank >= 4 (rules.py:61-63)
  * buy payment: color tokens first, shortfall from gold (rules.py:101-117)
  * reserve cap 3, +1 gold if available, blind = hidden (rules.py:74-86,226-249)
  * exactly-one noble grant in display order (rules.py:132-147)
  * deterministic token return to the 10-token cap, seeded by the state hash
    (rules.py:150-193) — `rng_mode="parity"` is bit-exact CPython MT19937,
    `rng_mode="fast"` is threefry with identical selection semantics
  * end/turn-limit/winner logic incl. tie-breaks (rules.py:263-303)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from . import data as D
from . import mt19937 as mt
from .types import GameState, NUM_PLAYERS, TOKEN_CAP, TURN_LIMIT

# ---------------------------------------------------------------------------
# Action layout (reference encode.py:12-32)
# ---------------------------------------------------------------------------
TAKE3_OFFSET, TAKE3_COUNT = 0, 10
TAKE2_OFFSET, TAKE2_COUNT = 10, 5
BUY_VISIBLE_OFFSET, BUY_VISIBLE_COUNT = 15, 12
RESERVE_VISIBLE_OFFSET, RESERVE_VISIBLE_COUNT = 27, 12
RESERVE_BLIND_OFFSET, RESERVE_BLIND_COUNT = 39, 3
BUY_RESERVED_OFFSET, BUY_RESERVED_COUNT = 42, 3
TOTAL_ACTIONS = 45

_MAX_RETURNS = 12  # unroll bound for fast-mode token return (hand <= 22)
# ensure_compile_time_eval: this module may be imported lazily from inside an
# active jit trace (splendax's package exports and several functions defer
# imports); without it these table constants would be STAGED into whatever
# jaxpr happens to be open and escape it as leaked tracers.
with jax.ensure_compile_time_eval():
    _COMBO = jnp.asarray(D.COMBO_MASK)  # [10, 5] 0/1
    _COST = jnp.asarray(D.CARD_COST_PAD)  # [91, 5], row 0 = sentinel
    _COST_BF = _COST.astype(jnp.bfloat16)
    _COLOR = jnp.asarray(D.CARD_COLOR_PAD)  # [91]
    _POINTS = jnp.asarray(D.CARD_POINTS_PAD)  # [91]
    # [91, 7] = cost(5) | color | points, for the single-card buy lookup.
    _CARD7_BF = jnp.concatenate(
        [_COST, _COLOR[:, None], _POINTS[:, None]], axis=1
    ).astype(jnp.bfloat16)
    _NOBLE_REQ = jnp.asarray(D.NOBLE_REQ)  # [10, 5]
    _NOBLE_PTS = jnp.asarray(D.NOBLE_POINTS)  # [10]


def _onehot_rows(ids0, table_bf):
    """table[ids0] via one-hot MXU contraction (ids0 already 0-based into the
    table).  Constant-table GATHERS with per-game index vectors cost ~1 ms
    per 12-wide lookup at batch 32768 under vmap; the one-hot bf16 matmul
    fuses and measures ~free.  Exact: tables hold small ints (< 256)."""
    oh = (ids0[:, None] == jnp.arange(table_bf.shape[0])).astype(jnp.bfloat16)
    rows = jax.lax.dot_general(
        oh, table_bf, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return rows.astype(jnp.int32)


def _gold_shortfall(tokens6, bonuses5, cost):
    """Per-card gold shortfall after discounts and color tokens.

    Vectorized `PlayerState.can_afford` (reference state.py:61-71):
    discounted = max(0, cost - bonus); shortfall = max(0, discounted - tokens);
    affordable iff gold >= sum(shortfall).  `cost` [..., 5] pre-looked-up.
    """
    discounted = jnp.maximum(cost - bonuses5, 0)
    short = jnp.maximum(discounted - tokens6[:5], 0)
    return short.sum(axis=-1)


@jax.jit
def legal_mask(state: GameState) -> jnp.ndarray:
    """bool[45] legality mask; mirrors reference legal_moves (rules.py:40-93)."""
    p = state.to_play
    oh_p = _oh(p, NUM_PLAYERS)
    tokens = _row(state.tokens, oh_p)
    bonuses = _row(state.bonuses, oh_p)
    cnt_res = (state.reserved_count * oh_p).sum()
    bank = state.bank

    # Take-3 with the reduced-color rule (rules.py:45-58).
    avail = (bank[:5] >= 1).astype(jnp.int32)  # [5]
    n_avail = avail.sum()
    combo_sub_avail = (_COMBO * (1 - avail) == 0).all(axis=1)  # combo ⊆ avail
    avail_sub_combo = (avail * (1 - _COMBO) == 0).all(axis=1)  # avail ⊆ combo
    take3 = jnp.where(
        n_avail >= 3, combo_sub_avail, jnp.where(n_avail >= 1, avail_sub_combo, False)
    )  # [10]

    # Take-2 same color: bank >= 4 (rules.py:61-63).
    take2 = bank[:5] >= 4  # [5]

    # Costs of all 15 relevant cards (12 board + 3 reserved) in ONE one-hot
    # MXU lookup (rules.py:66-71,88-91).
    board_flat = state.board.reshape(12)
    res_ids = _row(state.reserved_ids, oh_p)
    cost15 = _onehot_rows(
        jnp.concatenate([board_flat, res_ids]) + 1, _COST_BF
    )  # [15, 5]

    # Buy visible: present & affordable (rules.py:66-71).
    present = board_flat >= 0
    gold = tokens[D.GOLD]
    buy_vis = present & (gold >= _gold_shortfall(tokens, bonuses, cost15[:12]))

    # Reserve visible / blind: reserved < 3 (rules.py:73-86).
    can_reserve = cnt_res < 3
    res_vis = can_reserve & present  # [12]
    res_blind = can_reserve & (state.deck_count > 0)  # [3]

    # Buy reserved: slot < count & affordable (rules.py:88-91).
    in_range = jnp.arange(3) < cnt_res
    buy_res = in_range & (gold >= _gold_shortfall(tokens, bonuses, cost15[12:]))

    return jnp.concatenate([take3, take2, buy_vis, res_vis, res_blind, buy_res])


# ---------------------------------------------------------------------------
# Action application
# ---------------------------------------------------------------------------


# Dense-update helpers.  IMPORTANT TPU performance rules, measured on v5e at
# batch 32768 per step:
#   * never update state arrays through traced indices (`x.at[p, ...]`) —
#     XLA lowers those to scatters that run ~100x slower than one-hot
#     arithmetic on these tiny arrays (26 ms vs 0.3 ms for take-3 alone);
#   * never READ a per-game array at a traced index either
#     (`state.board[tier, slot]`), and never branch with `lax.switch` —
#     under vmap these lower to general gathers / per-branch select chains
#     that cost milliseconds (the old switch-based step: 13 ms; the
#     branchless one-hot step below: ~0.4 ms);
#   * constant-table gathers with per-game index vectors (`_COST[ids]`) are
#     NOT fine either: each lowers to a dynamic gather costing 0.2-1 ms per
#     step at batch 32768.  Use `_onehot_rows` (one-hot bf16 MXU matmul,
#     measures ~free and is exact for small-int tables) or an elementwise
#     one-hot contraction for single rows.
# Everything per-game-indexed is a one-hot contraction.


def _oh(i, n):
    """One-hot bool[n] of a traced index."""
    return jnp.arange(n, dtype=jnp.int32) == i


def _ohi(i, n):
    """One-hot int32[n] of a traced index."""
    return (jnp.arange(n, dtype=jnp.int32) == i).astype(jnp.int32)


def _row(arr2, oh_p):
    """Read row p of arr[2, K] as a one-hot contraction (no dynamic slice)."""
    return (arr2 * oh_p[:, None]).sum(axis=0)


with jax.ensure_compile_time_eval():  # see the table-constant block above
    _GOLD_ROW = jnp.zeros(6, jnp.int32).at[D.GOLD].set(1)  # static index: fine


def _apply_move_dense(state: GameState, action) -> GameState:
    """All six action families as ONE pass of masked dense arithmetic.

    Families are mutually exclusive, so each effect group is simply multiplied
    by its family flag and summed — no `lax.switch`, no per-game dynamic
    indexing.  Mirrors the reference dispatch (rules.py:196-257) exactly for
    legal actions; total (never faults) for illegal ones.
    """
    p = state.to_play
    oh_p = _oh(p, NUM_PLAYERS)
    is_t3 = action < TAKE2_OFFSET
    is_t2 = (action >= TAKE2_OFFSET) & (action < BUY_VISIBLE_OFFSET)
    is_bv = (action >= BUY_VISIBLE_OFFSET) & (action < RESERVE_VISIBLE_OFFSET)
    is_rv = (action >= RESERVE_VISIBLE_OFFSET) & (action < RESERVE_BLIND_OFFSET)
    is_rb = (action >= RESERVE_BLIND_OFFSET) & (action < BUY_RESERVED_OFFSET)
    is_br = action >= BUY_RESERVED_OFFSET

    tokens_p = _row(state.tokens, oh_p)  # [6]
    bonuses_p = _row(state.bonuses, oh_p)  # [5]

    # --- Token takes (rules.py:201-215) ----------------------------------
    combo = (_ohi(jnp.clip(action, 0, 9), 10)[:, None] * _COMBO).sum(0)  # [5]
    take5 = combo * (state.bank[:5] >= 1) * is_t3
    take5 = take5 + 2 * _ohi(action - TAKE2_OFFSET, 5) * is_t2
    take6 = jnp.concatenate([take5, jnp.zeros(1, jnp.int32)])

    # --- Visible-slot addressing (buy/reserve visible) --------------------
    vis_active = is_bv | is_rv
    off = jnp.clip(
        jnp.where(is_bv, action - BUY_VISIBLE_OFFSET, action - RESERVE_VISIBLE_OFFSET),
        0, 11,
    )
    oh_slot12 = _ohi(off, 12) * vis_active  # [12]
    board_flat = state.board.reshape(12)
    vis_card = (board_flat * oh_slot12).sum()  # valid when vis_active
    tier_oh = _ohi(off // 4, 3) * vis_active  # [3]

    # --- Deck pop: refill source (bv/rv) or blind reserve (rb) -----------
    deck_tier_oh = tier_oh + _ohi(action - RESERVE_BLIND_OFFSET, 3) * is_rb  # [3]
    cnt = (state.deck_count * deck_tier_oh).sum()
    top_oh = _ohi(jnp.maximum(cnt - 1, 0), D.MAX_DECK)  # [40]
    top = (state.deck_perm * deck_tier_oh[:, None] * top_oh[None, :]).sum()
    pop = (vis_active | is_rb) & (cnt > 0)
    deck_count = state.deck_count - deck_tier_oh * pop

    # --- Board refill (rules.py:125-129) ----------------------------------
    refill = jnp.where(cnt > 0, top, jnp.int32(-1))
    board = jnp.where(
        (oh_slot12 > 0).reshape(3, 4), refill, state.board
    )

    # --- Buy payment (visible or reserved card; rules.py:101-122) ---------
    oh_res3 = _ohi(action - BUY_RESERVED_OFFSET, 3) * is_br  # [3]
    res_card = (state.reserved_ids * oh_p[:, None].astype(jnp.int32)
                * oh_res3[None, :]).sum()
    buy_active = is_bv | is_br
    bought = jnp.where(is_bv, vis_card, jnp.where(is_br, res_card, -1))
    # cost|color|points of the bought card in one one-hot lookup (sentinel
    # row 0 for bought = -1).
    card7 = _onehot_rows(bought[None] + 1, _CARD7_BF)[0]  # [7]
    cost = card7[:5]
    discounted = jnp.maximum(cost - bonuses_p, 0)
    spend = jnp.minimum(tokens_p[:5], discounted)
    gold_spent = (discounted - spend).sum()
    pay6 = jnp.concatenate([spend, gold_spent[None]]) * buy_active
    bonus_inc = _ohi(card7[5], 5) * buy_active
    pts = card7[6] * buy_active

    # --- Reserve bookkeeping (rules.py:226-249) ---------------------------
    res_active = is_rv | is_rb
    new_res = jnp.where(is_rv, vis_card, top)  # rb: mask guarantees cnt > 0
    cnt_res = (state.reserved_count * oh_p).sum()
    res_cell = (oh_p[:, None] & _oh(jnp.minimum(cnt_res, 2), 3)[None, :]) & res_active
    reserved_ids = jnp.where(res_cell, new_res, state.reserved_ids)
    reserved_revealed = jnp.where(
        res_cell, is_rv.astype(jnp.int32), state.reserved_revealed
    )
    gold_take6 = _GOLD_ROW * (res_active & (state.bank[D.GOLD] > 0))

    # --- Buy-reserved left shift (list pop semantics, rules.py:253-254) ---
    pos = jnp.arange(3, dtype=jnp.int32)
    src = jnp.where(pos >= jnp.clip(action - BUY_RESERVED_OFFSET, 0, 2),
                    jnp.minimum(pos + 1, 2), pos)
    shift = (src[:, None] == pos[None, :]).astype(jnp.int32)  # [3(dst),3(src)]
    last = pos == 2
    ids_row = _row(reserved_ids, oh_p)
    rev_row = _row(reserved_revealed, oh_p)
    ids_shift = jnp.where(last, -1, (shift * ids_row[None, :]).sum(axis=1))
    rev_shift = jnp.where(last, 0, (shift * rev_row[None, :]).sum(axis=1))
    shift_cell = oh_p[:, None] & jnp.ones((1, 3), bool) & is_br
    reserved_ids = jnp.where(shift_cell, ids_shift[None, :], reserved_ids)
    reserved_revealed = jnp.where(shift_cell, rev_shift[None, :], reserved_revealed)

    # --- Merge token / bank / scoring updates -----------------------------
    player_delta = take6 + gold_take6 - pay6
    return state.replace(
        tokens=state.tokens + player_delta[None, :] * oh_p[:, None],
        bank=state.bank - take6 - gold_take6 + pay6,
        bonuses=state.bonuses + bonus_inc[None, :] * oh_p[:, None],
        prestige=state.prestige + pts * oh_p,
        board=board,
        deck_count=deck_count,
        reserved_ids=reserved_ids,
        reserved_revealed=reserved_revealed,
        reserved_count=state.reserved_count
        + oh_p * (res_active.astype(jnp.int32) - is_br.astype(jnp.int32)),
    )


# ---------------------------------------------------------------------------
# End of turn
# ---------------------------------------------------------------------------


def _grant_noble(state: GameState) -> GameState:
    """Grant at most one noble, first in display order (rules.py:132-147).

    One-hot contractions throughout — no per-game dynamic indexing (see the
    TPU performance note above; the dynamic-index version cost 2 ms per
    32768-game step, this one fuses into the surrounding step).
    """
    p = state.to_play
    oh_p = _oh(p, NUM_PLAYERS)
    vis = state.noble_ids  # [3]
    bonuses_p = _row(state.bonuses, oh_p)  # [5]
    # Requirement check against ALL 10 nobles, then contract with the
    # visible-id one-hots — no per-game table gather.
    meets_all = (bonuses_p[None, :] >= _NOBLE_REQ).all(axis=1)  # [10]
    oh_vis = vis[:, None] == jnp.arange(D.NUM_NOBLES)  # [3, 10]; vis=-1 -> 0s
    meets = (oh_vis & meets_all[None, :]).any(axis=1)  # [3]
    any_meets = meets.any()
    first_oh = _ohi(jnp.argmax(meets), 3)  # first True (display order)
    nid = (vis * first_oh).sum()
    won_slot = jnp.minimum((_row(state.player_nobles, oh_p) >= 0).sum(), 2)
    won_cell = any_meets & oh_p[:, None] & _oh(won_slot, 3)[None, :]
    pts = (_NOBLE_PTS * _ohi(nid, D.NUM_NOBLES)).sum() * any_meets
    return state.replace(
        noble_ids=jnp.where(any_meets & (first_oh > 0), -1, state.noble_ids),
        prestige=state.prestige + pts * oh_p,
        player_nobles=jnp.where(won_cell, nid, state.player_nobles),
    )


def _state_hash_seed(state: GameState, tokens_p):
    """The reference's integer seed for token return, as (lo32, hi32).

    seed = (turn_count*1315423911) ^ (to_play*2654435761)
         ^ (sum(player.tokens)*97531) ^ (sum(bank)*31337)   (rules.py:159-166)

    turn_count*1315423911 can exceed 2**32, so it is computed exactly in
    split 16-bit limbs; all other terms fit in uint32 and only XOR the low
    word (python ints XOR little-endian words independently).
    """
    t = state.turn_count.astype(jnp.uint32)
    C_HI = jnp.uint32(1315423911 >> 16)
    C_LO = jnp.uint32(1315423911 & 0xFFFF)
    a = t * C_HI  # < 2**22 for t <= 100
    b = t * C_LO
    lo = (a << 16) + b  # wrapping uint32 == (t*C) mod 2**32
    hi = (a + (b >> 16)) >> 16
    lo = lo ^ (state.to_play.astype(jnp.uint32) * jnp.uint32(2654435761))
    lo = lo ^ (tokens_p.sum().astype(jnp.uint32) * jnp.uint32(97531))
    lo = lo ^ (state.bank.sum().astype(jnp.uint32) * jnp.uint32(31337))
    return lo, hi


def _auto_return_tokens(state: GameState, p, rng_mode: str) -> GameState:
    """Enforce the 10-token cap by deterministic random return
    (rules.py:150-193).

    The draw loop mirrors the reference's `while remaining > 0` exactly via
    `lax.while_loop` (under `vmap` the loop runs only as long as ANY lane is
    over the cap — in legal play at most 3 iterations — with finished lanes'
    carries frozen automatically, which also freezes their RNG streams, so
    per-lane stream consumption matches the reference draw-for-draw).
    Gold is only returned if no non-gold tokens remain.
    """
    oh_p = _oh(p, NUM_PLAYERS)
    tokens_p = _row(state.tokens, oh_p)
    total = tokens_p.sum()
    k = jnp.maximum(total - TOKEN_CAP, 0)
    lo, hi = _state_hash_seed(state, tokens_p)

    if rng_mode == "parity":
        # Exact CPython draw-for-draw reproduction needs the data-dependent
        # loop; `lax.while_loop` freezes finished lanes' streams under vmap.
        # The whole MT19937 setup is guarded by cond(k > 0): in single-game
        # jit (the gym shim) it only runs on the rare over-cap plies.
        def _mt_return(args):
            tokens, bank = args
            stream = mt.init_from_seed_words(lo, hi)

            def cond(carry):
                tokens, _, _, returned = carry
                return (returned < k) & (tokens[:5] > 0).any()

            def body(carry):
                tokens, bank, stream, returned = carry
                nonzero = tokens[:5] > 0
                n = nonzero.sum().astype(jnp.int32)
                stream, r = mt.randbelow(stream, jnp.maximum(n, 1))
                cum = jnp.cumsum(nonzero.astype(jnp.int32))
                color = jnp.argmax(cum == (r + 1))  # (r+1)-th nonzero color
                delta = _oh(color, 6).astype(jnp.int32)
                return tokens - delta, bank + delta, stream, returned + 1

            tokens, bank, _, returned = lax.while_loop(
                cond, body, (tokens, bank, stream, jnp.int32(0))
            )
            return tokens, bank, returned

        tokens, bank, returned = lax.cond(
            k > 0,
            _mt_return,
            lambda args: (args[0], args[1], jnp.int32(0)),
            (tokens_p, state.bank),
        )
    else:
        # Fast mode: same seeding rule and uniform-over-nonzero-colors
        # procedure, but fully UNROLLED with masked iterations — a
        # `while_loop` is a fusion barrier costing ~30us/step on TPU, while
        # the unrolled form fuses into the surrounding step.  One threefry
        # call yields all draws.  _MAX_RETURNS bounds any reachable state
        # (hand <= 10 + take-3 in legal play; fixtures up to 22 tokens).
        # impl pinned: under a different jax_default_prng_impl (e.g. 'rbg')
        # wrap_key_data would reject the 2-word key at trace time.
        key = jax.random.wrap_key_data(jnp.stack([hi, lo]), impl="threefry2x32")
        u = jax.random.uniform(key, (_MAX_RETURNS,))
        tokens = tokens_p
        bank = state.bank
        returned = jnp.int32(0)
        for i in range(_MAX_RETURNS):
            nonzero = tokens[:5] > 0
            n = nonzero.sum().astype(jnp.int32)
            active = (returned < k) & (n > 0)
            r = jnp.minimum((u[i] * n).astype(jnp.int32), jnp.maximum(n - 1, 0))
            cum = jnp.cumsum(nonzero.astype(jnp.int32))
            color = jnp.argmax(cum == (r + 1))
            delta = _oh(color, 6).astype(jnp.int32) * active
            tokens = tokens - delta
            bank = bank + delta
            returned = returned + active
    # Gold as last resort (rules.py:179-184).
    give = jnp.clip(k - returned, 0, tokens[D.GOLD])
    tokens = tokens - _GOLD_ROW * give
    bank = bank + _GOLD_ROW * give
    prow = oh_p[:, None]
    return state.replace(
        tokens=jnp.where(prow, tokens[None, :], state.tokens), bank=bank
    )


def compute_winner(state: GameState) -> jnp.ndarray:
    """Winner by (prestige, fewer bonuses, fewer reserved); exact tie -> -1
    (reference compute_winner, rules.py:290-303)."""
    a = state.prestige
    b = -state.bonuses.sum(axis=1)
    c = -state.reserved_count
    gt = (a[0] > a[1]) | (
        (a[0] == a[1]) & ((b[0] > b[1]) | ((b[0] == b[1]) & (c[0] > c[1])))
    )
    eq = (a[0] == a[1]) & (b[0] == b[1]) & (c[0] == c[1])
    return jnp.where(eq, jnp.int32(-1), jnp.where(gt, jnp.int32(0), jnp.int32(1)))


@partial(jax.jit, static_argnames=("rng_mode",))
def apply_action(state: GameState, action, rng_mode: str = "fast") -> GameState:
    """Pure transition for a LEGAL action; mirrors reference apply_action
    (rules.py:196-287).  Illegal actions must be filtered by the caller (the
    env layer reproduces the reference's -0.01 no-op there); this function is
    total (never faults) so it can run speculatively under `vmap`+`where`.
    """
    action = jnp.asarray(action, jnp.int32)
    p = state.to_play

    state = _apply_move_dense(state, action)

    # End-of-turn procedure (rules.py:259-287).
    state = _grant_noble(state)
    state = _auto_return_tokens(state, p, rng_mode)

    game_over = state.game_over | ((state.prestige * _oh(p, NUM_PLAYERS)).sum() >= 15)
    move_count = state.move_count + 1
    to_play = (state.to_play + 1) % NUM_PLAYERS
    turn_count = move_count // 2 + 1

    hit_limit = turn_count >= TURN_LIMIT
    round_done = to_play == 0
    finished = game_over & round_done
    # Turn limit overrides the normal winner computation (rules.py:274-279).
    winner = jnp.where(
        hit_limit,
        jnp.int32(-1),
        jnp.where(finished, compute_winner(state), state.winner),
    )
    return state.replace(
        move_count=move_count,
        to_play=to_play,
        turn_count=turn_count,
        game_over=game_over | hit_limit,
        turn_limit_reached=state.turn_limit_reached | hit_limit,
        winner=winner,
    )


def is_terminal(state: GameState) -> jnp.ndarray:
    """Terminal once the round completed after game_over (rules.py:306-308)."""
    return state.game_over & (state.to_play == 0)
