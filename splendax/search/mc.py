"""Flat Monte-Carlo lookahead, fully on device.

For every game in the batch and every one of the 45 root actions, apply the
action with the real rules kernel, run K independent uniform-random playouts
for H plies (frozen at terminal), score each leaf from the searcher's POV —
the exact terminal reward (win +1 / loss -1 / draw 0 / turn-limit -0.1,
`core.final_rewards_of`) when the playout finished, else a bounded
heuristic (normalized prestige lead) or, when leaf params are given, the
trained critic's value — and play the root action with the best mean score.

Everything is one jitted program: a batch of B games searches
B x 45 x K simulated games in lockstep (the same engine step the env bench
measures at ~47M steps/s/chip), so search costs milliseconds per move on
TPU.  The reference has no search capability at all (its strongest bots are
one-ply obs heuristics, `scripts/eval_suite.py:10-128`); this is a
beyond-parity policy enabled by the engine's throughput.

Plugs into the eval harness as a PolicySpec:
    from splendax.search import mc_search_policy
    eval_vs_opponent(mc_search_policy(rollouts=8, horizon=24), ...)
or from the CLI: `python -m splendax.eval.cli vs-search ...`.

Note the searcher reads the full GameState (deck order, hidden reserves) —
privileged information, like the reference's own `greedy_opponent_v2_factory`
which requires an env reference (`eval_suite.py:80-128`).  Scores of
stochastic events (deck refills, token returns) are averaged over the K
playouts.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..engine import rules as R
from ..engine.encode import encode_observation
from ..env import core
from ..models import actor_critic as ac
from ..selfplay.opponents import uniform_legal_action

_NEG = -jnp.inf


def playout_ply(state, key, rng_mode: str = "fast"):
    """One uniform-random ply for one game, frozen once terminal.

    Uses `core.step_core` so the env edge-case contract holds inside the
    search too (stalemate -> draw, splendor_env.py:56-61)."""
    term = R.is_terminal(state)
    mask = R.legal_mask(state)
    a = uniform_legal_action(key, mask)
    nxt, _ = core.step_core(state, a, rng_mode=rng_mode, mask=mask)
    return jax.tree.map(lambda n, c: jnp.where(term, c, n), nxt, state)


def _sel2(vec2, idx):
    """vec2[..., 2] indexed by per-row idx (0/1) without a dynamic gather."""
    return jnp.where(idx == 0, vec2[..., 0], vec2[..., 1])


def leaf_values(states, me, params=None):
    """Score a batch of leaf states from player `me`'s POV in [-1, 1].

    Terminal leaves use the exact env reward; live leaves use the critic
    value under `params` (sign-corrected to `me`'s perspective) or, without
    params, a normalized prestige lead.  Live-leaf scores are squashed to
    (-0.95, 0.95) so a PROVEN terminal win/loss always dominates an
    estimate."""
    term = jax.vmap(R.is_terminal)(states)
    fr = jax.vmap(core.final_rewards_of)(states)  # [N, 2]
    term_v = _sel2(fr, me)
    if params is None:
        lead = (_sel2(states.prestige, me) - _sel2(states.prestige, 1 - me))
        live = lead.astype(jnp.float32) / 15.0
    else:
        obs = jax.vmap(encode_observation)(states)  # POV of state.to_play
        v = ac.critic_value(params, obs)
        live = jnp.where(states.to_play == me, v, -v)
    live = jnp.clip(live, -0.95, 0.95)
    return jnp.where(term, term_v, live)


def rollout_values(
    flat_states,
    me_flat,
    ctx,
    key,
    horizon: int,
    rng_mode: str = "fast",
    guided: bool = True,
):
    """Play `horizon` plies from each of a flat batch of states and score the
    leaves from `me_flat`'s POV (shared playout engine of the flat-MC and
    Gumbel root searches).

    Moves are sampled from the trained actor when `ctx` (params) is given and
    `guided`, else uniformly over legal actions; terminal states freeze and
    score exactly (`leaf_values`)."""
    N = jax.tree.leaves(flat_states)[0].shape[0]

    def body(st, k):
        term = jax.vmap(R.is_terminal)(st)
        pmask = jax.vmap(R.legal_mask)(st)
        if ctx is not None and guided:
            pobs = jax.vmap(encode_observation)(st)
            a, _ = ac.sample_action(k, ac.actor_logits(ctx, pobs), pmask)
        else:
            a = uniform_legal_action(k, pmask)
        nxt = jax.vmap(
            lambda s, aa, mm: core.step_core(
                s, aa, rng_mode=rng_mode, mask=mm
            )[0]
        )(st, a, pmask)
        frozen = jax.tree.map(
            lambda n, c: jnp.where(
                term.reshape((N,) + (1,) * (n.ndim - 1)), c, n
            ),
            nxt,
            st,
        )
        return frozen, None

    flat_states, _ = jax.lax.scan(
        body, flat_states, jax.random.split(key, horizon)
    )
    return leaf_values(flat_states, me_flat, ctx)


def mc_search_q(
    rollouts: int = 8,
    horizon: int = 24,
    rng_mode: str = "fast",
    guided: bool = True,
):
    """Root Q-value function of the flat-MC search: returns
    `fn(ctx, obs, mask, state, key) -> q[B, 45]` with illegal actions at
    -inf.  `mc_search_policy` is argmax over this; distillation
    (train/distill.py) consumes the full vector as a soft target."""
    A = R.TOTAL_ACTIONS

    def fn(ctx, obs, mask, state, key):
        B = mask.shape[0]
        me = state.to_play  # [B] the searcher moves now

        # Root expansion: child[b, a] = apply(state_b, a).  Illegal actions
        # produce garbage children; they are masked out of the argmax below.
        acts = jnp.arange(A, dtype=jnp.int32)
        child = jax.vmap(
            lambda s: jax.vmap(
                lambda a: R.apply_action(s, a, rng_mode=rng_mode)
            )(acts)
        )(state)

        # Replicate each child K times -> flat [B*A*K] lane batch.
        N = B * A * rollouts

        def rep(x):
            tiled = jnp.broadcast_to(
                x[:, :, None], (B, A, rollouts) + x.shape[2:]
            )
            return tiled.reshape((N,) + x.shape[2:])

        flat = jax.tree.map(rep, child)
        me_flat = jnp.broadcast_to(me[:, None, None], (B, A, rollouts)).reshape(N)
        vals = rollout_values(
            flat, me_flat, ctx, key, horizon, rng_mode=rng_mode, guided=guided
        )
        q = vals.reshape(B, A, rollouts).mean(-1)
        return jnp.where(mask, q, _NEG)

    fn.__name__ = f"mc_search_q_r{rollouts}_h{horizon}"
    fn.privileged = True
    return fn


def mc_search_policy(
    rollouts: int = 8,
    horizon: int = 24,
    params=None,
    rng_mode: str = "fast",
    guided: bool = True,
) -> Tuple:
    """Eval-harness PolicySpec running flat-MC search on full batches.

    `params` (optional) upgrades BOTH halves of the search: playout moves
    are sampled from the trained actor instead of uniformly (`guided=False`
    restores random playouts), and live leaves are scored by the trained
    critic instead of the prestige heuristic — a one-step policy-improvement
    operator over the network (truncated actor playouts + critic bootstrap +
    exact terminal rewards).  `horizon` plies follow each root action;
    `rollouts` independent playouts are averaged per action."""
    q_fn = mc_search_q(rollouts, horizon, rng_mode=rng_mode, guided=guided)

    def fn(ctx, obs, mask, state, key):
        return jnp.argmax(q_fn(ctx, obs, mask, state, key), axis=-1).astype(
            jnp.int32
        )

    fn.__name__ = f"mc_search_r{rollouts}_h{horizon}"
    fn.privileged = True  # expands/plays out the TRUE state (docstring note)
    return (fn, params)
