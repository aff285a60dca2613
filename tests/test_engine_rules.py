"""Engine invariants, mirroring the reference suites `test_rules.py`,
`test_take_reduced_colors.py`, `test_afford_nobles_obs.py`, `test_draw_rule.py`."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import splendax as sx
from splendax.engine import rules as R
from splendax.engine import data as D

from utils import (
    make_state,
    set_bank,
    set_player_tokens,
    set_player_bonuses,
    clear_board,
    empty_decks,
    reserve_card,
    mask_np,
)


def test_initial_mask_nonempty():
    m = mask_np(make_state(0))
    assert m.sum() > 0
    # Fresh game: all 10 take-3 combos and no take-2 (bank=4 each... bank>=4 so
    # take-2 IS legal), all 12 reserves legal, 3 blind reserves legal.
    assert m[R.TAKE3_OFFSET : R.TAKE3_OFFSET + 10].sum() == 10
    assert m[R.TAKE2_OFFSET : R.TAKE2_OFFSET + 5].sum() == 5
    assert m[R.RESERVE_VISIBLE_OFFSET : R.RESERVE_VISIBLE_OFFSET + 12].sum() == 12
    assert m[R.RESERVE_BLIND_OFFSET : R.RESERVE_BLIND_OFFSET + 3].sum() == 3


def test_take3_bank_delta_and_turn_bookkeeping():
    st = make_state(1)
    a = R.TAKE3_OFFSET  # combo (0,1,2)
    st2 = sx.apply_action(st, a)
    assert np.asarray(st2.bank)[:3].tolist() == (np.asarray(st.bank)[:3] - 1).tolist()
    assert np.asarray(st2.tokens)[0, :3].tolist() == [1, 1, 1]
    assert int(st2.move_count) == 1
    assert int(st2.to_play) == 1
    assert int(st2.turn_count) == 1  # move_count//2 + 1


def test_take2_requires_bank_ge_4():
    st = set_bank(make_state(2), w=3, b=4, g=0, r=4, k=4, gold=5)
    m = mask_np(st)
    assert m[R.TAKE2_OFFSET + 0] == 0  # white: 3 < 4
    assert m[R.TAKE2_OFFSET + 1] == 1
    assert m[R.TAKE2_OFFSET + 2] == 0
    st2 = sx.apply_action(st, R.TAKE2_OFFSET + 1)
    assert int(st2.bank[1]) == 2
    assert int(st2.tokens[0, 1]) == 2


def test_reduced_take3_two_colors_available():
    # 2 colors available -> exactly the 3 combos containing both are legal
    # (reference test_take_reduced_colors.py:17).
    st = set_bank(make_state(3), w=1, b=1, g=0, r=0, k=0, gold=0)
    m = mask_np(st)
    take3 = m[R.TAKE3_OFFSET : R.TAKE3_OFFSET + 10]
    assert take3.sum() == 3
    for i, combo in enumerate(D.TAKE3_COMBOS):
        expect = 1 if {0, 1}.issubset(set(combo)) else 0
        assert take3[i] == expect, (i, combo)
    # Execution takes only the available subset.
    legal_idx = int(np.flatnonzero(take3)[0])
    st2 = sx.apply_action(st, R.TAKE3_OFFSET + legal_idx)
    assert np.asarray(st2.tokens)[0, :5].sum() == 2
    assert np.asarray(st2.bank)[:5].sum() == 0


def test_reduced_take3_one_color_available():
    # 1 color -> the 6 combos containing it are legal (ref test:32).
    st = set_bank(make_state(4), w=0, b=0, g=2, r=0, k=0, gold=0)
    m = mask_np(st)
    take3 = m[R.TAKE3_OFFSET : R.TAKE3_OFFSET + 10]
    assert take3.sum() == 6
    legal_idx = int(np.flatnonzero(take3)[0])
    st2 = sx.apply_action(st, R.TAKE3_OFFSET + legal_idx)
    assert int(st2.tokens[0, 2]) == 1  # takes exactly the 1 available
    assert int(st2.bank[2]) == 1


def test_token_cap_enforced_to_exactly_10():
    st = set_player_tokens(make_state(5), 0, w=2, b=2, g=2, r=2, k=1, gold=0)  # 9
    st = set_bank(st, w=4, b=4, g=4, r=4, k=4, gold=5)
    before_bank = int(np.asarray(st.bank).sum())
    st2 = sx.apply_action(st, R.TAKE3_OFFSET)  # 9 + 3 = 12 -> return 2
    assert int(np.asarray(st2.tokens)[0].sum()) == 10
    assert int(np.asarray(st2.bank).sum()) == before_bank - 3 + 2


def test_gold_payment_and_affordability():
    # Card 7 (tier 1): cost 4 blue, 1 point, black bonus (reference data).
    st = clear_board(make_state(6))
    st = st.replace(board=st.board.at[0, 0].set(7))
    st = set_player_tokens(st, 0, b=2, gold=2)
    m = mask_np(st)
    assert m[R.BUY_VISIBLE_OFFSET + 0] == 1  # 2 blue + 2 gold covers 4 blue
    st2 = sx.apply_action(st, R.BUY_VISIBLE_OFFSET + 0)
    tok = np.asarray(st2.tokens)[0]
    assert tok[1] == 0 and tok[5] == 0  # color first, then gold
    assert int(st2.prestige[0]) == 1
    assert int(st2.bonuses[0, 4]) == 1  # black bonus
    assert (np.asarray(st2.tokens) >= 0).all()
    # With only 1 gold it must be unaffordable.
    st3 = set_player_tokens(st, 0, b=2, gold=1)
    assert mask_np(st3)[R.BUY_VISIBLE_OFFSET + 0] == 0


def test_discounts_reduce_cost():
    st = clear_board(make_state(7))
    st = st.replace(board=st.board.at[0, 0].set(7))  # 4 blue
    st = set_player_bonuses(st, 0, b=4)
    assert mask_np(st)[R.BUY_VISIBLE_OFFSET + 0] == 1  # free after discount
    st2 = sx.apply_action(st, R.BUY_VISIBLE_OFFSET + 0)
    assert int(np.asarray(st2.tokens)[0].sum()) == 0


def test_exactly_one_noble_granted():
    st = make_state(8)
    # Qualify for ALL visible nobles.
    st = set_player_bonuses(st, 0, w=4, b=4, g=4, r=4, k=4)
    st2 = sx.apply_action(st, R.TAKE3_OFFSET)
    assert int(st2.prestige[0]) == 3  # exactly one noble's 3 points
    assert int((np.asarray(st2.noble_ids) >= 0).sum()) == 2
    # First in display order was taken.
    assert int(st2.noble_ids[0]) == -1
    assert int(st2.player_nobles[0, 0]) == int(st.noble_ids[0])


def test_reserve_semantics():
    st = make_state(9)
    st2 = sx.apply_action(st, R.RESERVE_VISIBLE_OFFSET + 0)  # tier1 slot0
    assert int(st2.reserved_count[0]) == 1
    assert int(st2.reserved_revealed[0, 0]) == 1  # board reserve is public
    assert int(st2.tokens[0, 5]) == 1  # gold granted
    assert int(st2.reserved_ids[0, 0]) == int(st.board[0, 0])
    # Blind reserve is hidden and pops the deck top.
    st3 = sx.apply_action(st, R.RESERVE_BLIND_OFFSET + 0)
    top = int(st.deck_perm[0, int(st.deck_count[0]) - 1])
    assert int(st3.reserved_ids[0, 0]) == top
    assert int(st3.reserved_revealed[0, 0]) == 0
    assert int(st3.deck_count[0]) == int(st.deck_count[0]) - 1


def test_reserve_cap_three():
    st = make_state(10)
    for i in range(3):
        st = reserve_card(st, 0, i, True)
    m = mask_np(st)
    assert m[R.RESERVE_VISIBLE_OFFSET : R.RESERVE_VISIBLE_OFFSET + 12].sum() == 0
    assert m[R.RESERVE_BLIND_OFFSET : R.RESERVE_BLIND_OFFSET + 3].sum() == 0


def test_buy_reserved_pops_and_shifts():
    st = make_state(11)
    st = reserve_card(st, 0, 7, True)  # 4 blue
    st = reserve_card(st, 0, 3, False)
    st = set_player_tokens(st, 0, b=4)
    m = mask_np(st)
    assert m[R.BUY_RESERVED_OFFSET + 0] == 1
    assert m[R.BUY_RESERVED_OFFSET + 2] == 0  # no third card
    st2 = sx.apply_action(st, R.BUY_RESERVED_OFFSET + 0)
    assert int(st2.reserved_count[0]) == 1
    assert int(st2.reserved_ids[0, 0]) == 3  # shifted left
    assert int(st2.reserved_ids[0, 1]) == -1
    assert int(st2.reserved_revealed[0, 0]) == 0


def test_board_refill_from_deck_top():
    st = make_state(12)
    top = int(st.deck_perm[0, int(st.deck_count[0]) - 1])
    st = set_player_bonuses(st, 0, w=9, b=9, g=9, r=9, k=9)  # afford anything
    st2 = sx.apply_action(st, R.BUY_VISIBLE_OFFSET + 0)
    assert int(st2.board[0, 0]) == top
    assert int(st2.deck_count[0]) == int(st.deck_count[0]) - 1
    # Empty deck -> slot left empty.
    st3 = empty_decks(st)
    st4 = sx.apply_action(st3, R.BUY_VISIBLE_OFFSET + 0)
    assert int(st4.board[0, 0]) == -1


def test_win_condition_and_terminality():
    st = make_state(13)
    st = st.replace(prestige=st.prestige.at[0].set(15))
    st2 = sx.apply_action(st, R.TAKE3_OFFSET)
    assert bool(st2.game_over)
    assert not bool(sx.is_terminal(st2))  # opponent still gets a reply
    st3 = sx.apply_action(st2, int(np.flatnonzero(mask_np(st2))[0]))
    assert bool(sx.is_terminal(st3))
    assert int(st3.winner) == 0


def test_winner_tiebreaks():
    st = make_state(14)
    # Equal prestige; player 1 has fewer bonuses -> player 1 wins.
    st = st.replace(
        prestige=jnp.asarray([15, 15], jnp.int32),
        bonuses=st.bonuses.at[0].set(jnp.asarray([2, 0, 0, 0, 0], jnp.int32)),
    )
    assert int(R.compute_winner(st)) == 1
    # Exact stat tie -> draw.
    st_eq = st.replace(bonuses=jnp.zeros((2, 5), jnp.int32))
    assert int(R.compute_winner(st_eq)) == -1


def test_turn_limit_draw():
    st = make_state(15).replace(move_count=jnp.int32(197))  # next move -> 199//2+1=100
    st2 = sx.apply_action(st, R.TAKE3_OFFSET)
    assert bool(st2.game_over) and bool(st2.turn_limit_reached)
    assert int(st2.winner) == -1


def test_stalemate_draw_via_env():
    # Empty bank + 10 tokens + 3 reserves (unaffordable) + empty board
    # -> zero mask -> env declares draw (reference test_draw_rule.py).
    st = clear_board(empty_decks(make_state(16)))
    st = set_bank(st, 0, 0, 0, 0, 0, 0)
    st = set_player_tokens(st, 0, w=2, b=2, g=2, r=2, k=2)
    for cid in (86, 87, 88):  # tier-3 cards, unaffordable with 10 tokens
        st = reserve_card(st, 0, cid, True)
    assert mask_np(st).sum() == 0
    _, out = sx.step(st, jnp.int32(0))
    assert bool(out.draw) and bool(out.terminated)
    assert float(out.reward) == 0.0


def test_illegal_action_is_penalized_noop():
    st = make_state(17)
    m = mask_np(st)
    illegal = int(np.flatnonzero(m == 0)[0])
    st2, out = sx.step(st, jnp.int32(illegal))
    assert bool(out.illegal_action)
    assert float(out.reward) == pytest.approx(-0.01)
    assert not bool(out.terminated)
    assert (np.asarray(st2.bank) == np.asarray(st.bank)).all()
    assert int(st2.move_count) == int(st.move_count)


def test_fast_and_parity_modes_agree_on_selection_semantics():
    # Both modes return to exactly 10 tokens from the same over-cap state;
    # streams differ but the count/cap semantics must match.
    st = set_player_tokens(make_state(18), 0, w=3, b=3, g=3, r=2, k=1, gold=0)  # 12
    st = st.replace(bank=jnp.asarray([1, 1, 1, 1, 1, 5], jnp.int32))
    for mode in ("fast", "parity"):
        st2 = sx.apply_action(st, R.TAKE3_OFFSET, rng_mode=mode)
        assert int(np.asarray(st2.tokens)[0].sum()) == 10, mode


def test_gold_last_resort_return():
    # Player holds mostly gold; non-gold exhausted -> gold returned.
    st = set_player_tokens(make_state(19), 0, w=1, gold=9)  # 10 tokens
    st = st.replace(bank=jnp.asarray([1, 1, 0, 0, 0, 5], jnp.int32))
    st2 = sx.apply_action(st, R.TAKE3_OFFSET)  # takes w,b -> 12 tokens
    tok = np.asarray(st2.tokens)[0]
    assert tok.sum() == 10
    assert tok[5] < 9 or tok[:5].sum() < 4  # some gold returned if needed
