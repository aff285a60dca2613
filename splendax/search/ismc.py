"""Information-set search: determinized hidden information, fully on device.

The privileged searches (mc.py / uct.py / gumbel.py) expand the TRUE
GameState — including the deck order and the opponent's blind reserved
cards, which the 297-dim observation censors (reference
`splendor_gym/engine/encode.py:157-168` zeroes unrevealed opponent
reserves; the deck is only ever visible as a count).  Round 3 measured that
distilling those searches into an obs-only student fails (docs/PERF.md
"Search distillation") and hypothesized the privileged reads are why: the
teacher's edge is not a function of the student's input.

This module settles the question by building the search the student could
in principle imitate: every playout runs over a DETERMINIZATION of the root
state — a world re-sampled uniformly from the mover's information set —
so averaging playouts over determinizations estimates information-set
action values (Perfect Information Monte Carlo / determinized MCTS, as in
Ginsberg's GIB and Whitehouse et al.'s ISMCTS).  What the mover knows (and
`determinize` therefore preserves, bit-exactly):

  * everything in the 297-obs: bank, both players' tokens/bonuses/prestige,
    board, own reserved cards, REVEALED opponent reserves, nobles, deck
    counts, turn counters;
  * game-history facts a player who watched the game also knows, though the
    memoryless obs does not carry them: which TIER each blind opponent
    reserve came from (reserve-from-deck names the tier as it happens,
    reference `rules.py`'s reserve branch), and own blind reserves.

What it re-samples, jointly and uniformly per tier: the order of the
face-down deck suffix and the identities of the opponent's blind reserves
— a blind reserve is exchangeable with every card still in that tier's
deck, exactly the mover's posterior under a uniform initial shuffle.

The censored flat-MC search (`censored_mc_q/_policy`) and the censored
Gumbel search (`censored_gumbel_policy`, via the shared implementation in
gumbel.py) draw ONE fresh determinization per playout lane, so K playouts
of a root action average K worlds.  Leaf values reuse the same critic /
prestige scoring (mc.leaf_values) and playout policy as the privileged
searches — the ONLY difference is what the search is allowed to see, which
is exactly the ablation round 4 needs.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..engine import data as D
from ..engine import rules as R
from ..engine.types import GameState
from .mc import rollout_values

A = R.TOTAL_ACTIONS
_NEG = -jnp.inf

_EXT = D.MAX_DECK + 3  # per-tier shuffle width: 40 deck slots + 3 reserve slots

with jax.ensure_compile_time_eval():
    # tier of card id (0-based): 0/1/2 by the contiguous-id scheme
    _CARD_TIER = (
        (jnp.arange(D.NUM_CARDS) >= int(D.TIER_OFFSETS[1])).astype(jnp.int32)
        + (jnp.arange(D.NUM_CARDS) >= int(D.TIER_OFFSETS[2])).astype(jnp.int32)
    )


def _tier_of(ids: jnp.ndarray) -> jnp.ndarray:
    """Tier (0..2) of card ids; -1-padded slots map to tier -1."""
    valid = ids >= 0
    t = (ids >= int(D.TIER_OFFSETS[1])).astype(jnp.int32) + (
        ids >= int(D.TIER_OFFSETS[2])
    ).astype(jnp.int32)
    return jnp.where(valid, t, -1)


def determinize(state: GameState, key: jnp.ndarray) -> GameState:
    """Re-sample the mover's hidden information uniformly; everything the
    mover (``state.to_play``) can know is preserved bit-exactly.

    Per tier, the face-down deck cards and the opponent's blind reserves of
    that tier form one exchangeable pool; a uniform permutation of the pool
    reassigns the blind-reserve identities and the deck order.  Obs
    invariance (`encode_observation(determinize(s, k)) == encode(s)`) and
    pool invariance are pinned by tests/test_ismc.py.

    Single-state function — `vmap` it for batches.  All ops are [43]-wide
    sorts/scatters per tier; negligible next to a playout's engine steps.
    """
    me = state.to_play
    opp = 1 - me
    # Opponent rows via two-way selects (engine PERF rule #2).
    opp_ids = jnp.where(opp == 0, state.reserved_ids[0], state.reserved_ids[1])
    opp_rev = jnp.where(
        opp == 0, state.reserved_revealed[0], state.reserved_revealed[1]
    )
    opp_cnt = jnp.where(opp == 0, state.reserved_count[0], state.reserved_count[1])
    blind = (
        (opp_ids >= 0) & (jnp.arange(3) < opp_cnt) & (opp_rev == 0)
    )  # [3] slots whose identity the mover cannot know
    blind_tier = _tier_of(opp_ids)  # [3], -1 when not a card

    new_deck = state.deck_perm
    new_opp_ids = opp_ids
    keys = jax.random.split(key, 3)
    for t in range(3):
        deck_live = jnp.arange(D.MAX_DECK) < state.deck_count[t]
        res_live = blind & (blind_tier == t)
        live = jnp.concatenate([deck_live, res_live])  # [43]
        vals = jnp.concatenate([state.deck_perm[t], opp_ids])  # [43]
        u = jax.random.uniform(keys[t], (_EXT,))
        # Random order of the live slots (dead slots tail in original order:
        # both argsorts are stable, so dead slot j maps to dead slot j and
        # -1 padding / non-pool values stay bit-identical in place).
        perm_idx = jnp.argsort(jnp.where(live, u, jnp.inf), stable=True)
        idx_live = jnp.argsort(~live, stable=True)
        shuffled = jnp.zeros(_EXT, jnp.int32).at[idx_live].set(vals[perm_idx])
        new_deck = new_deck.at[t].set(
            jnp.where(deck_live, shuffled[: D.MAX_DECK], state.deck_perm[t])
        )
        new_opp_ids = jnp.where(res_live, shuffled[D.MAX_DECK :], new_opp_ids)

    new_reserved = jnp.where(
        (jnp.arange(2) == opp)[:, None], new_opp_ids[None, :], state.reserved_ids
    )
    return state.replace(deck_perm=new_deck, reserved_ids=new_reserved)


def _determinize_batch(state, key, n: int):
    """[B] states -> [B, n] fresh determinizations (one per playout lane)."""
    B = jax.tree.leaves(state)[0].shape[0]
    ks = jax.random.split(key, B * n).reshape(B, n, 2)
    return jax.vmap(
        lambda s, kk: jax.vmap(lambda k1: determinize(s, k1))(kk)
    )(state, ks)


def censored_mc_q(
    rollouts: int = 8,
    horizon: int = 24,
    rng_mode: str = "fast",
    guided: bool = True,
):
    """Censored flat-MC root Q: like `mc.mc_search_q` but every playout lane
    runs in its own determinized world.  Returns
    `fn(ctx, obs, mask, state, key) -> q[B, 45]` (-inf illegal).

    One determinization per (game, rollout), SHARED across the 45 root
    actions — common random numbers: action comparisons within a rollout
    see the same world, so world-sampling noise cancels in q differences.
    """

    def fn(ctx, obs, mask, state, key):
        B = mask.shape[0]
        me = state.to_play
        k_det, k_play = jax.random.split(key)
        det = _determinize_batch(state, k_det, rollouts)  # [B, K, ...]

        acts = jnp.arange(A, dtype=jnp.int32)
        # child[b, k, a] = apply(det[b,k], a): root chance events (refill
        # draws) now come from the RESAMPLED deck, not the true one.
        child = jax.vmap(
            jax.vmap(
                lambda s: jax.vmap(
                    lambda a: R.apply_action(s, a, rng_mode=rng_mode)
                )(acts)
            )
        )(det)
        N = B * rollouts * A
        flat = jax.tree.map(lambda x: x.reshape((N,) + x.shape[3:]), child)
        me_flat = jnp.broadcast_to(me[:, None, None], (B, rollouts, A)).reshape(N)
        vals = rollout_values(
            flat, me_flat, ctx, k_play, horizon, rng_mode=rng_mode, guided=guided
        )
        q = vals.reshape(B, rollouts, A).mean(1)
        return jnp.where(mask, q, _NEG)

    fn.__name__ = f"censored_mc_q_r{rollouts}_h{horizon}"
    fn.privileged = False  # the point: playouts only see determinized worlds
    return fn


def censored_mc_policy(
    rollouts: int = 8,
    horizon: int = 24,
    params=None,
    rng_mode: str = "fast",
    guided: bool = True,
) -> Tuple:
    """Eval-harness PolicySpec: argmax of the censored flat-MC Q."""
    q_fn = censored_mc_q(rollouts, horizon, rng_mode=rng_mode, guided=guided)

    def fn(ctx, obs, mask, state, key):
        return jnp.argmax(q_fn(ctx, obs, mask, state, key), axis=-1).astype(
            jnp.int32
        )

    fn.__name__ = f"censored_mc_r{rollouts}_h{horizon}"
    fn.privileged = False
    return (fn, params)


def censored_gumbel_policy(
    m: int = 16,
    k0: int = 6,
    horizon: int = 4,
    params=None,
    c_scale: float = 10.0,
    rng_mode: str = "fast",
    guided: bool = True,
    greedy_final: bool = False,
) -> Tuple:
    """Censored Gumbel sequential-halving search: the shared implementation
    in gumbel.py with per-lane determinization switched on."""
    from .gumbel import gumbel_search_fn

    fn = gumbel_search_fn(
        m=m, k0=k0, horizon=horizon, c_scale=c_scale, rng_mode=rng_mode,
        guided=guided, determinize_fn=determinize, greedy_final=greedy_final,
    )
    return (fn, params)
