"""On-device Monte-Carlo search policy (beyond-parity capability;
splendax/search/mc.py).  The reference has no lookahead at all — its
strongest bots are one-ply obs heuristics (eval_suite.py:10-128)."""

import jax
import jax.numpy as jnp
import numpy as np

import splendax as sx
from splendax.search import mc_search_policy
from splendax.search.mc import leaf_values, playout_ply
from utils import clear_board, make_state, place_card, set_player_tokens


def _batched(state):
    return jax.tree.map(lambda x: jnp.asarray(x)[None], state)


def _forced_win_state():
    """P0 at 14 prestige with exactly one 1-point card on the board and the
    tokens to buy it: buying (action 15) wins on the spot — every playout
    from that child is a terminal +1."""
    st = make_state(3)
    st = st.replace(prestige=jnp.asarray([14, 0], jnp.int32))
    st = set_player_tokens(st, 0, w=7, b=7, g=7, r=7, k=7, gold=3)
    st = clear_board(st)
    st = place_card(st, 1, 0, 7)  # tier-1 card id 7: 1 point (the 4-cost card)
    return st


def _policy_action(spec, state):
    fn, ctx = spec
    b = _batched(state)
    obs = sx.encode_observation(state)[None]
    mask = sx.legal_mask(state)[None]
    a = fn(ctx, obs, mask, b, jax.random.PRNGKey(0))
    return int(a[0])


def test_search_picks_forced_win_heuristic_leaves():
    """horizon=1: after the root action the opponent replies once.  Only the
    winning buy yields a PROVEN terminal +1; every other root action leaves a
    live leaf clipped below it (0.95) — so the pick is deterministic.  (At
    longer horizons random playouts can also stumble into the win and tie.)"""
    st = _forced_win_state()
    assert int(sx.legal_mask(st)[15]) == 1
    assert _policy_action(mc_search_policy(rollouts=1, horizon=1), st) == 15


def test_search_picks_forced_win_critic_leaves():
    from splendax.models.actor_critic import init_params

    st = _forced_win_state()
    params = init_params(jax.random.PRNGKey(1), hidden=32)
    spec = mc_search_policy(rollouts=1, horizon=1, params=params)
    assert _policy_action(spec, st) == 15


def test_playout_freezes_terminal_states():
    """Once a playout reaches a terminal state, further plies are no-ops
    (scores keep the exact terminal reward)."""
    st = _forced_win_state()
    won = sx.apply_action(st, jnp.int32(15))  # P0 buys to 15
    won = sx.apply_action(won, sx.legal_mask(won).argmax().astype(jnp.int32))
    assert bool(sx.is_terminal(won))
    frozen = won
    for i in range(3):
        frozen = playout_ply(frozen, jax.random.PRNGKey(i))
    for a, b in zip(jax.tree.leaves(frozen), jax.tree.leaves(won)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    v = leaf_values(_batched(won), jnp.asarray([0]))
    assert float(v[0]) == 1.0  # exact terminal reward for the winner
    v = leaf_values(_batched(won), jnp.asarray([1]))
    assert float(v[0]) == -1.0


def test_live_leaf_values_bounded_below_terminal():
    """Live (non-terminal) leaves are squashed into (-0.95, 0.95) so proven
    terminal outcomes always dominate estimates — with and without a critic."""
    from splendax.models.actor_critic import init_params

    st = _batched(make_state(0))
    me = jnp.asarray([0])
    for params in (None, init_params(jax.random.PRNGKey(2), hidden=32)):
        v = leaf_values(st, me, params)
        assert abs(float(v[0])) <= 0.95


def test_search_beats_random():
    from splendax.eval.suite import eval_vs_opponent, heuristic_policy

    res = eval_vs_opponent(
        mc_search_policy(rollouts=4, horizon=12),
        heuristic_policy("random"),
        n_games=16, seed=0,
    )
    assert res["wins"] > res["losses"], res


# --- PUCT tree search (splendax/search/uct.py) ---


def test_uct_picks_forced_win():
    from splendax.search import uct_search_policy

    st = _forced_win_state()
    assert _policy_action(uct_search_policy(simulations=24), st) == 15


def test_uct_picks_forced_win_with_net():
    from splendax.models.actor_critic import init_params
    from splendax.search import uct_search_policy

    st = _forced_win_state()
    params = init_params(jax.random.PRNGKey(1), hidden=32)
    assert _policy_action(uct_search_policy(24, params=params), st) == 15


def test_uct_denies_opponent_forced_win():
    """Deep sign correctness: P1 sits at 14 prestige with an affordable
    1-point card on the board; every P0 move EXCEPT reserving that card
    (action 27) lets P1 buy and win on its reply (value -1 at depth 2).
    The search must discover each refutation and concentrate visits on the
    only non-losing move."""
    from splendax.search import uct_search_policy
    from utils import empty_decks

    st = make_state(3)
    st = st.replace(prestige=jnp.asarray([0, 14], jnp.int32))
    st = set_player_tokens(st, 1, w=7, b=7, g=7, r=7, k=7)
    st = clear_board(st)
    st = place_card(st, 1, 0, 7)
    st = empty_decks(st)  # no refill: reserving really denies the card
    mask = np.asarray(sx.legal_mask(st))
    assert mask[27] == 1 and mask[39] == 0  # reserve visible yes, blind no
    a = _policy_action(uct_search_policy(simulations=512, max_depth=8), st)
    assert a == 27, a


def test_uct_visit_accounting():
    from splendax.search.uct import _uct_one_game

    st = make_state(0)
    root_n, root_q = _uct_one_game(st, None, 32, 16, 1.5)
    mask = np.asarray(sx.legal_mask(st))
    assert float(root_n.sum()) == 32  # every sim backs up through the root
    assert not np.any((np.asarray(root_n) > 0) & (mask == 0))  # legal only


def test_uct_turn_limit_draw_not_flipped_for_second_seat():
    """Regression: the turn-limit draw is -0.1 for BOTH seats
    (core.final_rewards_of) — NOT zero-sum — so the backup must not flip it
    into +0.1 when the searcher is the second seat.  Here P1 is to move on
    the game's last ply: every root action ends in the turn-limit draw, and
    every root Q must be exactly -0.1 (a sign-flipping backup reported
    +0.1, making second-seat search PREFER forcing the draw)."""
    from splendax.search.uct import _leaf_eval, _uct_one_game

    st = make_state(0).replace(
        move_count=jnp.int32(199),
        turn_count=jnp.int32(100),
        to_play=jnp.int32(1),
    )
    nxt = sx.apply_action(st, sx.legal_mask(st).argmax().astype(jnp.int32))
    assert bool(nxt.turn_limit_reached) and bool(sx.is_terminal(nxt))
    _, value2, term, _ = _leaf_eval(nxt, None)
    assert bool(term)
    np.testing.assert_allclose(np.asarray(value2), [-0.1, -0.1])

    root_n, root_q = _uct_one_game(st, None, 16, 8, 1.5)
    q = np.asarray(root_q)
    visited = np.asarray(root_n) > 0
    assert visited.any()
    np.testing.assert_allclose(q[visited], -0.1, atol=1e-6)


def test_uct_with_flagship_beats_basic():
    """The committed flagship's nets inside PUCT beat the basic heuristic
    decisively even at a small simulation budget (CPU-sized check; TPU
    numbers in docs/PERF.md)."""
    from splendax.eval.suite import eval_vs_opponent, heuristic_policy
    from splendax.search import uct_search_policy
    from splendax.train.checkpoint import import_params_npz

    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    flag = import_params_npz(
        os.path.join(repo, "runs", "ppo_splendor_2b_h512",
                     "ppo_splendor_params.npz")
    )
    res = eval_vs_opponent(
        uct_search_policy(48, params=flag), heuristic_policy("basic"),
        n_games=8, seed=0,
    )
    assert res["wins"] >= 6, res


# --------------------------------------------------------------------------
# Gumbel sequential-halving root search (splendax/search/gumbel.py)
# --------------------------------------------------------------------------

def test_gumbel_picks_forced_win():
    """With m >= the state's legal-action count (20 here) every legal action
    is a candidate; the winning buy is a proven terminal +1 from every
    playout while live leaves clip at 0.95, so at c_scale=1000 the 0.05 value
    margin (50 score points) dwarfs the Gumbel noise and the pick is
    deterministic (heuristic prior = uniform over legal)."""
    from splendax.search import gumbel_search_policy

    st = _forced_win_state()
    spec = gumbel_search_policy(m=32, k0=2, horizon=1, c_scale=1000.0)
    assert _policy_action(spec, st) == 15


def test_gumbel_picks_forced_win_with_net():
    from splendax.models.actor_critic import init_params
    from splendax.search import gumbel_search_policy

    st = _forced_win_state()
    params = init_params(jax.random.PRNGKey(1), hidden=32)
    spec = gumbel_search_policy(m=32, k0=2, horizon=1, params=params,
                                c_scale=1000.0)
    assert _policy_action(spec, st) == 15


def test_gumbel_actions_always_legal():
    """Batched search over fresh states: every chosen action is legal, for
    both power-of-two candidate counts exceeding and below the legal count."""
    from splendax.search import gumbel_search_policy

    keys = jax.random.split(jax.random.PRNGKey(4), 16)
    state, obs, mask = jax.vmap(sx.reset)(keys)
    for m in (4, 32):
        fn, ctx = gumbel_search_policy(m=m, k0=2, horizon=2)
        a = fn(ctx, obs, mask, state, jax.random.PRNGKey(7))
        assert bool(mask[jnp.arange(16), a].all()), f"illegal pick at m={m}"


def test_gumbel_rejects_bad_m():
    import pytest

    from splendax.search import gumbel_search_policy

    for bad in (0, 1, 3, 12):
        with pytest.raises(ValueError):
            gumbel_search_policy(m=bad)


def test_gumbel_beats_random():
    """Net-free gumbel search (prestige-lead leaves) must still crush a
    uniform-random opponent."""
    from splendax.eval import suite
    from splendax.search import gumbel_search_policy

    res = suite.eval_vs_opponent(
        gumbel_search_policy(m=8, k0=2, horizon=6),
        suite.heuristic_policy("random"), n_games=24, seed=2,
    )
    assert res["win_rate"] > 0.7
