"""Observation layout + hidden-information tests, mirroring the reference's
largest suite (`test_reserved_card_observation.py`) and `test_afford_nobles_obs`."""

import jax.numpy as jnp
import numpy as np

import splendax as sx
from splendax.engine import rules as R
from splendax.engine import data as D

from utils import make_state, reserve_card, set_player_tokens

# Canonical section offsets (reference test_reserved_card_observation.py:19-36).
BANK = 0
CUR = 6
OPP = 19
BOARD = 32
OWN_RES = 188
OPP_RES = 230
NOBLES = 272
DECKS = 290
MISC = 293


def obs_np(state):
    return np.asarray(sx.encode_observation(state))


def test_obs_shape_dtype_ranges():
    o = obs_np(make_state(0))
    assert o.shape == (sx.OBSERVATION_DIM,) == (297,)
    assert o.dtype == np.int32
    assert (o >= 0).all() and (o <= 50).all()


def test_obs_sections_fresh_game():
    st = make_state(1)
    o = obs_np(st)
    assert o[BANK : BANK + 6].tolist() == [4, 4, 4, 4, 4, 5]
    assert o[CUR : CUR + 13].tolist() == [0] * 13  # no tokens/bonuses yet
    assert o[OPP : OPP + 13].tolist() == [0] * 13
    # All 12 board cards present with sane fields.
    board = o[BOARD : BOARD + 156].reshape(12, 13)
    assert (board[:, 0] == 1).all()
    assert (board[:4, 1] == 1).all() and (board[8:, 1] == 3).all()
    assert (board[:, 3:8].sum(axis=1) == 1).all()  # one-hot color
    assert o[OWN_RES : OWN_RES + 84].tolist() == [0] * 84
    nobles = o[NOBLES : NOBLES + 18].reshape(3, 6)
    assert (nobles[:, 0] == 1).all()
    assert o[DECKS : DECKS + 3].tolist() == [36, 26, 16]
    assert o[MISC : MISC + 4].tolist() == [1, 0, 0, 0]


def test_board_card_features_match_tables():
    st = make_state(2)
    o = obs_np(st)
    ids = np.asarray(st.board).reshape(12)
    feats = o[BOARD : BOARD + 156].reshape(12, 13)
    for i, cid in enumerate(ids):
        assert feats[i, 1] == D.CARD_TIER[cid]
        assert feats[i, 2] == D.CARD_POINTS[cid]
        assert feats[i, 3 + D.CARD_COLOR[cid]] == 1
        assert feats[i, 8:13].tolist() == D.CARD_COST[cid].tolist()


def test_own_reserved_always_visible_with_revealed_flag():
    st = reserve_card(make_state(3), 0, 7, False)  # blind-reserved by self
    o = obs_np(st)
    row = o[OWN_RES : OWN_RES + 14]
    assert row[0] == 1  # present, fully visible to owner
    assert row[13] == 1  # revealed flag always 1 for own cards
    assert row[8:13].tolist() == D.CARD_COST[7].tolist()
    assert o[CUR + 12] == 1  # reserved_count in summary


def test_opponent_blind_reserved_is_censored():
    st = reserve_card(make_state(4), 1, 7, False)  # opponent reserved blind
    o = obs_np(st)  # viewed by player 0
    assert o[OPP_RES : OPP_RES + 14].tolist() == [0] * 14  # hidden info
    assert o[OPP + 12] == 1  # but the COUNT is public


def test_opponent_board_reserved_is_visible():
    st = reserve_card(make_state(5), 1, 7, True)
    o = obs_np(st)
    row = o[OPP_RES : OPP_RES + 14]
    assert row[0] == 1 and row[13] == 1
    assert row[8:13].tolist() == D.CARD_COST[7].tolist()


def test_perspective_flips_with_to_play():
    st = reserve_card(make_state(6), 0, 7, False)
    st_p1 = st.replace(to_play=jnp.int32(1))
    o = obs_np(st_p1)  # player 1's view: player 0 is now the opponent
    assert o[OPP_RES : OPP_RES + 14].tolist() == [0] * 14  # censored
    assert o[MISC + 1] == 1  # to_play


def test_buy_reserved_removes_from_observation():
    st = reserve_card(make_state(7), 0, 7, True)  # 4-blue card
    st = set_player_tokens(st, 0, b=4)
    st2 = sx.apply_action(st, R.BUY_RESERVED_OFFSET + 0)
    # Next player's view shows opponent (p0) with zero reserved.
    o = obs_np(st2)
    assert o[OPP + 12] == 0
    assert o[OPP_RES : OPP_RES + 42].tolist() == [0] * 42


def test_determinism_same_seed_same_obs():
    a, b = make_state(99), make_state(99)
    assert (obs_np(a) == obs_np(b)).all()
    key = jnp.asarray(np.array([0, 123], dtype=np.uint32))
    import jax

    k = jax.random.PRNGKey(7)
    s1, o1, m1 = sx.reset(k)
    s2, o2, m2 = sx.reset(k)
    assert (np.asarray(o1) == np.asarray(o2)).all()
    assert (np.asarray(m1) == np.asarray(m2)).all()


def test_scripted_trajectory_determinism():
    # Same seed + same 20 scripted moves -> identical obs (reference
    # test_gym_compat.py:44-76).
    def run(seed):
        st = make_state(seed)
        traj = []
        rng = np.random.RandomState(5)
        for _ in range(20):
            m = np.asarray(sx.legal_mask(st))
            a = int(rng.choice(np.flatnonzero(m)))
            st = sx.apply_action(st, jnp.int32(a))
            traj.append(obs_np(st))
        return np.stack(traj)

    assert (run(11) == run(11)).all()
