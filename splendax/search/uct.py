"""PUCT Monte-Carlo tree search, fully on device (mctx-style fixed arrays).

AlphaZero-grade search over the real rules kernel: every game in the batch
grows its own tree of `num_simulations` nodes stored as fixed-size arrays
(states, children, visit counts, priors), with PUCT selection, one-node
expansion per simulation, trained actor priors + critic leaf values (exact
terminal rewards when a leaf ends the game), and per-seat value-pair
backup — Splendor's `to_play` alternates every action (reference
rules.py:268-272), so the tree is strictly alternating minimax; the pair
(not a sign flip) keeps the NON-zero-sum turn-limit draw (-0.1 both seats)
correct at every depth.

No dynamic allocation, no host in the loop: one jitted program per
(batch, sims, depth) shape, vmapped over games.  Scatters (`at[].set`) are
fine here — search is an eval-tier workload, not the rollout hot loop
(docs/PERF.md rules are about the env step).

The reference has no search of any kind; see splendax/search/__init__.py
and mc.py for the cheaper flat-MC variant.  Plugs into the eval harness:

    from splendax.search import uct_search_policy
    eval_vs_opponent(uct_search_policy(64, params=net), opponent, ...)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..engine import rules as R
from ..engine.encode import encode_observation
from ..env import core
from ..models import actor_critic as ac

A = R.TOTAL_ACTIONS
_NEG = -jnp.inf


def _leaf_eval(state, params):
    """(prior[45], value2[2], terminal, mask) for ONE state.

    `value2 = [v for the player to move at this state, v for the other
    seat]`.  Live leaves are critic-estimated for the mover and assumed
    zero-sum (`[-v]` for the other seat, clipped into (-0.95, 0.95));
    terminal leaves carry each seat's EXACT env reward — this matters
    because the turn-limit draw is -0.1 for BOTH seats
    (core.final_rewards_of), which a naive sign-flipping backup would turn
    into +0.1 for one of them."""
    mask = R.legal_mask(state)
    term = R.is_terminal(state) | ~mask.any()
    obs = encode_observation(state)
    if params is None:
        logits = jnp.zeros(A)  # uniform prior over legal moves
        me = state.to_play
        lead = (
            jnp.where(me == 0, state.prestige[0], state.prestige[1])
            - jnp.where(me == 0, state.prestige[1], state.prestige[0])
        ).astype(jnp.float32)
        v_live = jnp.clip(lead / 15.0, -0.95, 0.95)
    else:
        logits = ac.actor_logits(params, obs[None])[0]
        v_live = jnp.clip(ac.critic_value(params, obs[None])[0], -0.95, 0.95)
    prior = jax.nn.softmax(jnp.where(mask, logits, _NEG))
    prior = jnp.where(mask, prior, 0.0)
    fr = core.final_rewards_of(state)  # [2] exact terminal rewards by seat
    me = state.to_play
    v_term_me = jnp.where(me == 0, fr[0], fr[1])
    v_term_other = jnp.where(me == 0, fr[1], fr[0])
    value2 = jnp.where(
        term,
        jnp.stack([v_term_me, v_term_other]),
        jnp.stack([v_live, -v_live]),
    )
    return prior, value2, term, mask


def _puct_scores(prior, n_sa, w_sa, mask, c_puct, fpu):
    """PUCT action scores at one node; illegal actions -inf.

    First-play urgency: unvisited edges take the NODE's own value estimate
    as Q (the actor's current view) instead of 0 — with Q spanning [-1, 1]
    and flat priors, a 0-initialized Q lets one early positive edge starve
    all exploration (observed: 24/24 sims down one take-3 while a winning
    buy sat unvisited)."""
    n_total = n_sa.sum()
    q = jnp.where(n_sa > 0, w_sa / jnp.maximum(n_sa, 1.0), fpu)
    u = c_puct * prior * jnp.sqrt(n_total + 1.0) / (1.0 + n_sa)
    return jnp.where(mask, q + u, _NEG)


def _uct_one_game(state, params, sims: int, max_depth: int, c_puct):
    """Grow a `sims`-node tree for ONE game; return root visit counts and Q.

    Tree arrays (N = sims + 1 nodes, node 0 = root):
      states   GameState pytree [N, ...]
      parent   int32[N], action  int32[N] (edge from parent)
      children int32[N, A] (node id or -1)
      prior    f32[N, A], n_sa/w_sa f32[N, A]
      term     bool[N], value f32[N, 2] (leaf eval pair: [to-move, other])
      mask     bool[N, A]
    """
    N = sims + 1

    def rep(x):
        return jnp.broadcast_to(x[None], (N,) + x.shape)

    states = jax.tree.map(rep, state)  # slot 0 holds the root; rest stale
    prior0, value0, term0, mask0 = _leaf_eval(state, params)

    tree = dict(
        parent=jnp.full(N, -1, jnp.int32),
        action=jnp.full(N, -1, jnp.int32),
        children=jnp.full((N, A), -1, jnp.int32),
        prior=jnp.zeros((N, A)).at[0].set(prior0),
        n_sa=jnp.zeros((N, A)),
        w_sa=jnp.zeros((N, A)),
        term=jnp.zeros(N, bool).at[0].set(term0),
        value=jnp.zeros((N, 2)).at[0].set(value0),  # [to-move seat, other]
        mask=jnp.zeros((N, A), bool).at[0].set(mask0),
    )

    def simulate(carry, sim_idx):
        tree, states = carry
        new_id = sim_idx + 1  # one expansion per simulation

        # --- SELECT: follow PUCT to an unexpanded edge or a terminal node.
        def sel_body(d, sel):
            node, stop, path_n, path_a = sel
            scores = _puct_scores(
                tree["prior"][node], tree["n_sa"][node], tree["w_sa"][node],
                tree["mask"][node], c_puct, tree["value"][node, 0],
            )
            a = jnp.argmax(scores).astype(jnp.int32)
            child = tree["children"][node, a]
            is_term = tree["term"][node]
            take = ~stop & ~is_term
            path_n = path_n.at[d].set(jnp.where(take, node, -1))
            path_a = path_a.at[d].set(jnp.where(take, a, -1))
            # stop after recording an unexpanded edge, or at terminals
            next_node = jnp.where(take & (child >= 0), child, node)
            stop = stop | is_term | (take & (child < 0))
            return next_node, stop, path_n, path_a

        path_n0 = jnp.full(max_depth, -1, jnp.int32)
        path_a0 = jnp.full(max_depth, -1, jnp.int32)
        leaf_parent, _, path_n, path_a = jax.lax.fori_loop(
            0, max_depth, sel_body,
            (jnp.int32(0), jnp.asarray(False), path_n0, path_a0),
        )
        depth = (path_n >= 0).sum()  # edges recorded
        expanding = depth > 0  # False only if the ROOT itself is terminal
        last_d = jnp.maximum(depth - 1, 0)
        exp_node = path_n[last_d]
        exp_action = path_a[last_d]

        # --- EXPAND: child state for the chosen unexpanded edge.  The edge
        # may ALREADY have a child (the path stopped at a terminal node it
        # leads to, or hit the depth cap): then REUSE that node's stored
        # value instead of writing a duplicate.
        parent_state = jax.tree.map(lambda x: x[exp_node], states)
        child_state = R.apply_action(parent_state, exp_action, rng_mode="fast")
        prior, value, term, mask = _leaf_eval(child_state, params)
        edge_child = tree["children"][exp_node, exp_action]
        fresh = expanding & (edge_child < 0)

        def wr(arr, idx, val):
            return arr.at[idx].set(jnp.where(fresh, val, arr[idx]))

        states = jax.tree.map(
            lambda s, c: s.at[new_id].set(jnp.where(fresh, c, s[new_id])),
            states, child_state,
        )
        tree = dict(
            tree,
            parent=wr(tree["parent"], new_id, exp_node),
            action=wr(tree["action"], new_id, exp_action),
            children=tree["children"].at[exp_node, exp_action].set(
                jnp.where(fresh, new_id, edge_child)
            ),
            prior=wr(tree["prior"], new_id, prior),
            term=wr(tree["term"], new_id, term),
            value=wr(tree["value"], new_id, value),
            mask=wr(tree["mask"], new_id, mask),
        )

        # --- BACKUP: the leaf carries a per-seat value PAIR (to-move seat,
        # other seat); to_play alternates every ply, so walking upward the
        # edge actor alternates between the two — credit the pair's "other"
        # component and swap each level.  (Exactly a sign flip for zero-sum
        # win/loss values, but ALSO correct for the non-zero-sum turn-limit
        # draw where both seats hold -0.1.)  Reused child -> its stored
        # pair; terminal ROOT (depth 0) -> nothing valid to back up.
        reuse_value = tree["value"][jnp.maximum(edge_child, 0)]
        leaf_pair = jnp.where(
            fresh, value, jnp.where(expanding, reuse_value, tree["value"][0])
        )

        def back_body(i, bk):
            tree_nw, pair = bk
            d = depth - 1 - i  # walk leaf-ward edge first
            valid = (i < depth)
            node = path_n[jnp.maximum(d, 0)]
            a = path_a[jnp.maximum(d, 0)]
            # The actor at the deepest edge is the seat OTHER than the
            # leaf's to-move seat; actors alternate upward.
            credit = pair[1]
            pair = jnp.where(valid, pair[::-1], pair)
            n_sa = tree_nw[0].at[node, a].add(jnp.where(valid, 1.0, 0.0))
            w_sa = tree_nw[1].at[node, a].add(jnp.where(valid, credit, 0.0))
            return (n_sa, w_sa), pair

        (n_sa, w_sa), _ = jax.lax.fori_loop(
            0, max_depth, back_body,
            ((tree["n_sa"], tree["w_sa"]), leaf_pair),
        )
        tree = dict(tree, n_sa=n_sa, w_sa=w_sa)
        return (tree, states), None

    (tree, states), _ = jax.lax.scan(
        simulate, (tree, states), jnp.arange(sims, dtype=jnp.int32)
    )
    root_n = tree["n_sa"][0]
    root_q = jnp.where(root_n > 0, tree["w_sa"][0] / jnp.maximum(root_n, 1), _NEG)
    return root_n, root_q


def uct_search_policy(
    simulations: int = 64,
    params=None,
    c_puct: float = 1.5,
    max_depth: int = 16,
) -> Tuple:
    """Eval-harness PolicySpec: PUCT tree search per move.

    Picks the root action with the most visits (Q breaks ties).  `params`
    supplies actor priors + critic leaf values; without it the search runs
    uniform priors over a prestige-lead heuristic."""

    def fn(ctx, obs, mask, state, key):
        # `key` is part of the PolicySpec signature but unused: the search
        # is fully deterministic (argmax selection; the engine's chance
        # events under rng_mode="fast" are a pure function of the state).
        root_n, root_q = jax.vmap(
            lambda s: _uct_one_game(s, ctx, simulations, max_depth, c_puct)
        )(state)
        # visits + epsilon*Q: most-visited wins, Q breaks zero-visit ties;
        # illegal actions are never visited AND get -inf via root_q.
        score = jnp.where(mask, root_n + 1e-3 * jnp.tanh(root_q), _NEG)
        return jnp.argmax(score, axis=-1).astype(jnp.int32)

    fn.__name__ = f"uct_s{simulations}"
    fn.privileged = True  # tree expands the TRUE state (see mc.py's note)
    return (fn, params)
