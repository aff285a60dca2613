"""Information-set (censored-observation) search: determinized hidden info
(splendax/search/ismc.py) plus the round-4 Gumbel candidate-set fix.

The determinization contract: everything the mover can know is preserved
bit-exactly — the full 297-obs (censoring contract: reference
engine/encode.py:157-168), the legal mask, and the per-tier card pools —
while the deck order and the opponent's blind reserve identities are
resampled uniformly from the pool.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import splendax as sx
from splendax.engine import rules as R
from splendax.search.ismc import censored_mc_policy, censored_gumbel_policy, determinize
from utils import clear_board, empty_decks, make_state, place_card, set_player_tokens


def _random_playout_states(n_games=16, plies=14, seed=0):
    """Batch of mid-game states reached by uniform-random legal play (real
    reachable states: blind/revealed reserves, refilled boards, spent
    decks)."""
    from splendax.env import core
    from splendax.selfplay.opponents import uniform_legal_action

    key = jax.random.PRNGKey(seed)
    state, obs, mask = jax.vmap(core.reset)(jax.random.split(key, n_games))
    for i in range(plies):
        k = jax.random.fold_in(key, 1000 + i)
        a = uniform_legal_action(k, mask)
        term = jax.vmap(R.is_terminal)(state)
        nxt, _ = jax.vmap(lambda s, aa, mm: core.step_core(s, aa, mask=mm))(
            state, a, mask
        )
        state = jax.tree.map(
            lambda n, c: jnp.where(
                term.reshape((n_games,) + (1,) * (n.ndim - 1)), c, n
            ),
            nxt,
            state,
        )
        mask = jax.vmap(R.legal_mask)(state)
    return state


def test_determinize_preserves_observation_and_mask():
    state = _random_playout_states(n_games=16, plies=14)
    obs0 = jax.vmap(sx.encode_observation)(state)
    mask0 = jax.vmap(R.legal_mask)(state)
    for ks in range(3):
        keys = jax.random.split(jax.random.PRNGKey(100 + ks), 16)
        det = jax.vmap(determinize)(state, keys)
        np.testing.assert_array_equal(
            np.asarray(jax.vmap(sx.encode_observation)(det)), np.asarray(obs0)
        )
        np.testing.assert_array_equal(
            np.asarray(jax.vmap(R.legal_mask)(det)), np.asarray(mask0)
        )


def test_determinize_preserves_visible_state_and_pools():
    state = _random_playout_states(n_games=12, plies=20, seed=3)
    keys = jax.random.split(jax.random.PRNGKey(7), 12)
    det = jax.vmap(determinize)(state, keys)

    # Every leaf except deck_perm / reserved_ids must be bit-identical.
    for name in state.__dataclass_fields__:
        if name in ("deck_perm", "reserved_ids"):
            continue
        np.testing.assert_array_equal(
            np.asarray(getattr(det, name)), np.asarray(getattr(state, name)),
            err_msg=f"leaf {name} changed",
        )

    for b in range(12):
        me = int(state.to_play[b])
        opp = 1 - me
        # Mover's own reserves and the opponent's REVEALED reserves unchanged.
        np.testing.assert_array_equal(
            np.asarray(det.reserved_ids[b, me]),
            np.asarray(state.reserved_ids[b, me]),
        )
        for slot in range(3):
            if int(state.reserved_revealed[b, opp, slot]):
                assert int(det.reserved_ids[b, opp, slot]) == int(
                    state.reserved_ids[b, opp, slot]
                )
        # Per tier: multiset {live deck cards} U {blind opp reserves of that
        # tier} is invariant; -1 padding of dead deck slots stays in place.
        for t in range(3):
            n = int(state.deck_count[b, t])
            np.testing.assert_array_equal(
                np.asarray(det.deck_perm[b, t, n:]),
                np.asarray(state.deck_perm[b, t, n:]),
            )

            def pool(st):
                deck = [int(x) for x in np.asarray(st.deck_perm[b, t, :n])]
                for slot in range(3):
                    cid = int(st.reserved_ids[b, opp, slot])
                    if (
                        cid >= 0
                        and slot < int(st.reserved_count[b, opp])
                        and not int(st.reserved_revealed[b, opp, slot])
                        and _tier_of_int(cid) == t
                    ):
                        deck.append(cid)
                return sorted(deck)

            assert pool(det) == pool(state)


def _tier_of_int(cid: int) -> int:
    from splendax.engine import data as D

    return int(cid >= int(D.TIER_OFFSETS[1])) + int(cid >= int(D.TIER_OFFSETS[2]))


def test_determinize_identity_without_hidden_info():
    """With an exhausted deck and no blind reserves there is nothing to
    resample: determinize must be a bit-exact identity."""
    st = empty_decks(make_state(5))
    st = st.replace(deck_perm=jnp.full((3, 40), -1, jnp.int32))
    det = determinize(st, jax.random.PRNGKey(0))
    for name in st.__dataclass_fields__:
        np.testing.assert_array_equal(
            np.asarray(getattr(det, name)), np.asarray(getattr(st, name)),
            err_msg=f"leaf {name} changed",
        )


def test_determinize_shuffles_deck_order():
    st = make_state(1)  # 36/26/16 face-down cards
    d1 = determinize(st, jax.random.PRNGKey(1))
    d2 = determinize(st, jax.random.PRNGKey(2))
    # Different keys give different orders; both differ from the truth
    # (36! orderings — collision probability is negligible).
    assert not np.array_equal(np.asarray(d1.deck_perm), np.asarray(st.deck_perm))
    assert not np.array_equal(np.asarray(d1.deck_perm), np.asarray(d2.deck_perm))
    # Multiset per tier invariant.
    for t in range(3):
        n = int(st.deck_count[t])
        assert sorted(np.asarray(d1.deck_perm[t, :n]).tolist()) == sorted(
            np.asarray(st.deck_perm[t, :n]).tolist()
        )


def test_determinize_resamples_blind_reserve():
    """After P0 reserves from the tier-1 deck top, P1's determinization must
    treat that card as exchangeable with the whole tier-1 deck suffix."""
    st = make_state(2)
    mask = np.asarray(R.legal_mask(st))
    a_deck_reserve = 39  # reserve tier-1 deck top (27 + 12 board slots)
    assert mask[a_deck_reserve], "deck-top reserve should be legal at reset"
    nxt = R.apply_action(st, jnp.int32(a_deck_reserve))
    assert int(nxt.to_play) == 1
    assert int(nxt.reserved_count[0]) == 1
    assert int(nxt.reserved_revealed[0, 0]) == 0  # blind
    true_id = int(nxt.reserved_ids[0, 0])

    seen = set()
    for k in range(12):
        det = determinize(nxt, jax.random.PRNGKey(50 + k))
        rid = int(det.reserved_ids[0, 0])
        seen.add(rid)
        # The resampled reserve + deck must still form the original pool.
        pool0 = sorted(
            np.asarray(nxt.deck_perm[0, : int(nxt.deck_count[0])]).tolist()
            + [true_id]
        )
        pool1 = sorted(
            np.asarray(det.deck_perm[0, : int(det.deck_count[0])]).tolist()
            + [rid]
        )
        assert pool0 == pool1
        assert _tier_of_int(rid) == 0
    # 12 uniform draws from a 36-card pool: essentially surely > 1 identity.
    assert len(seen) > 1


def _forced_win_state():
    st = make_state(3)
    st = st.replace(prestige=jnp.asarray([14, 0], jnp.int32))
    st = set_player_tokens(st, 0, w=7, b=7, g=7, r=7, k=7, gold=3)
    st = clear_board(st)
    st = place_card(st, 1, 0, 7)
    return st


def _policy_action(spec, state):
    fn, ctx = spec
    b = jax.tree.map(lambda x: jnp.asarray(x)[None], state)
    obs = sx.encode_observation(state)[None]
    mask = R.legal_mask(state)[None]
    return int(fn(ctx, obs, mask, b, jax.random.PRNGKey(0))[0])


def test_censored_mc_picks_forced_win():
    """The winning buy is visible information; censorship must not lose it."""
    st = _forced_win_state()
    assert int(R.legal_mask(st)[15]) == 1
    assert _policy_action(censored_mc_policy(rollouts=1, horizon=1), st) == 15


def test_censored_gumbel_picks_forced_win():
    st = _forced_win_state()
    spec = censored_gumbel_policy(m=16, k0=2, horizon=1, c_scale=100.0)
    assert _policy_action(spec, st) == 15


def test_gumbel_greedy_final_picks_forced_win():
    """greedy_final: the final argmax drops the Gumbel acting noise and
    compares the last survivors by q̂ alone — a proven terminal win (q̂=1,
    live leaves clipped to 0.95) must always convert."""
    from splendax.search import gumbel_search_policy

    st = _forced_win_state()
    spec = gumbel_search_policy(
        m=16, k0=2, horizon=1, c_scale=100.0, greedy_final=True
    )
    assert _policy_action(spec, st) == 15


def test_censored_policies_return_legal_actions():
    from splendax.env import core

    state, obs, mask = jax.vmap(core.reset)(
        jax.random.split(jax.random.PRNGKey(11), 8)
    )
    for spec in (
        censored_mc_policy(rollouts=2, horizon=2),
        censored_gumbel_policy(m=4, k0=2, horizon=2),
    ):
        fn, ctx = spec
        a = fn(ctx, obs, mask, state, jax.random.PRNGKey(12))
        picked = np.asarray(
            jnp.take_along_axis(mask, a[:, None], axis=1)[:, 0]
        )
        assert picked.all()
        assert not fn.privileged


def test_privileged_flags():
    from splendax.eval import suite
    from splendax.search import gumbel_search_policy, mc_search_policy

    assert suite.is_privileged(mc_search_policy(rollouts=1, horizon=1))
    assert suite.is_privileged(gumbel_search_policy(m=4, k0=1, horizon=1))
    assert suite.is_privileged(suite.heuristic_policy("greedy_v2"))
    assert not suite.is_privileged(censored_mc_policy(rollouts=1, horizon=1))
    assert not suite.is_privileged(censored_gumbel_policy(m=4, k0=1))
    assert not suite.is_privileged(suite.heuristic_policy("basic"))
    assert not suite.is_privileged(suite.model_greedy_policy(None))


def test_eval_results_carry_privileged_flags():
    from splendax.eval import suite

    res = suite.eval_vs_opponent(
        censored_mc_policy(rollouts=1, horizon=2),
        suite.heuristic_policy("random"),
        n_games=8,
        seed=0,
    )
    assert res["privileged"] == {"agent": False, "opponent": False}
    h2h = suite.head_to_head(
        suite.heuristic_policy("greedy_v2"),
        suite.heuristic_policy("basic"),
        n_games=4,
        seed=0,
    )
    assert h2h["privileged"] == {"a": True, "b": False}


def test_gumbel_candidates_force_include_prior_argmax():
    """r3 weak-spot 1: Gumbel-top-m could drop the prior's argmax when more
    than m actions were legal, silently excluding it from the search."""
    from splendax.search.gumbel import _root_candidates

    key = jax.random.PRNGKey(4)
    B, A = 64, 45
    logits = jax.random.normal(jax.random.fold_in(key, 0), (B, A)) * 2.0
    mask = jax.random.uniform(jax.random.fold_in(key, 1), (B, A)) < 0.7
    mask = mask.at[:, 0].set(True)  # at least one legal everywhere
    g = jax.random.gumbel(jax.random.fold_in(key, 2), (B, A))
    gscore = jnp.where(mask, g + logits, -jnp.inf)
    for m in (2, 4, 8):
        cand = np.asarray(_root_candidates(gscore, logits, mask, m))
        amax = np.asarray(
            jnp.argmax(jnp.where(mask, logits, -jnp.inf), axis=-1)
        )
        assert (cand[:, 0] == amax).all()  # slot 0 IS the argmax
        # slots are distinct actions
        assert all(len(set(row)) == m for row in cand)


def test_gumbel_m_validation():
    from splendax.search.gumbel import gumbel_search_fn

    with pytest.raises(ValueError):
        gumbel_search_fn(m=64)  # > TOTAL_ACTIONS
    with pytest.raises(ValueError):
        gumbel_search_fn(m=6)  # not a power of two
