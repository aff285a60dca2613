"""Gumbel sequential-halving root search, fully on device.

The Gumbel-AlphaZero root procedure (Danihelka et al. 2022, "Policy
improvement by planning with Gumbel") re-designed for TPU: instead of the
PUCT tree's `sims` SEQUENTIAL simulations (splendax/search/uct.py — correct
but latency-bound: tiny per-sim ops, ~10-min cold compile through the
tunnel), candidate root actions are evaluated by WIDE batched playouts
(the engine's forte, ~47M steps/s) and eliminated by sequential halving:

1. Sample-without-replacement `m` legal root actions via the Gumbel-top-k
   trick on the actor's masked logits (g + logits).
2. `log2(m)` halving rounds: every surviving action gets `k0 * 2^r`
   actor-guided playouts of `horizon` plies (shared engine
   `mc.rollout_values`: critic leaves, exact terminal rewards); survivors
   are re-ranked by `g + logits + c_scale * q̂` (the paper's monotone
   `sigma` transform of the running mean action value) and the top half
   kept.  Playout counts double as candidates halve, so every round costs
   the same `m * k0` lanes and the TOTAL budget is `log2(m) * m * k0`
   playouts — e.g. m=16, k0=6: 384, the flat-MC bot's 45*8=360 spent 4x
   denser on the actions that matter.
3. The last survivor is the move.  Acting by argmax over
   `g + logits + sigma(q̂)` preserves the policy-improvement guarantee in
   expectation over the Gumbel noise (paper §3).

Unlike flat MC (all 45 actions x equal playouts, mc.py) the budget
concentrates on plausible actions — with 39 illegal-on-average actions per
Splendor state, flat MC wastes most lanes on masked/bad roots.  Unlike PUCT
there is no tree: depth comes from the playout policy, which for Splendor's
short tactical horizons (docs/PERF.md "Search-augmented play": h=4 optimal)
is where the strength was measured to come from anyway.

Plugs into the eval harness as a PolicySpec:

    from splendax.search import gumbel_search_policy
    eval_vs_opponent(gumbel_search_policy(m=16, k0=6, params=net), ...)

or the CLI: `python -m splendax.eval.cli vs-search --algo gumbel`.
The reference has no search of any kind (its strongest bots are one-ply
obs heuristics, `scripts/eval_suite.py:10-128`).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..engine import rules as R
from ..models import actor_critic as ac
from .mc import rollout_values

A = R.TOTAL_ACTIONS
_NEG = -jnp.inf


def _root_candidates(gscore, logits, mask, m: int) -> jnp.ndarray:
    """Top-m candidate actions by Gumbel-perturbed score, with the prior's
    argmax FORCE-INCLUDED in slot 0.

    Measured r3 (docs/PERF.md "intransitive triangle"): pure Gumbel-top-m
    occasionally dropped the prior's argmax when more than m actions were
    legal, leaving it unable to win the final argmax at all — worth 13.5
    points vs flat-MC against the raw policy.  The Gumbel-AlphaZero acting
    rule effectively guarantees the argmax is considered (Danihelka et al.
    2022, §3).  The forcing affects SELECTION ORDER only: callers gather
    the honest g+logits per slot, so halving/acting scores are unchanged.

    States with < m legal actions pad with -inf-scored slots; their playout
    values stay masked out downstream."""
    B, n_act = gscore.shape
    amax = jnp.argmax(jnp.where(mask, logits, _NEG), axis=-1)  # [B]
    sel = jnp.where(
        jnp.arange(n_act)[None, :] == amax[:, None], jnp.inf, gscore
    )
    return jnp.argsort(-sel, axis=-1)[:, :m].astype(jnp.int32)


def gumbel_search_fn(
    m: int = 16,
    k0: int = 6,
    horizon: int = 4,
    c_scale: float = 10.0,
    rng_mode: str = "fast",
    guided: bool = True,
    determinize_fn=None,
    greedy_final: bool = False,
):
    """Returns `fn(ctx, obs, mask, state, key) -> action[B]` running one
    Gumbel sequential-halving search per game in the batch.

    `greedy_final` changes only the LAST argmax: instead of the paper's
    acting rule `g + logits + sigma(q̂)` (whose Gumbel noise is what makes
    the acting distribution a policy improvement IN EXPECTATION — keep the
    default for distillation targets), the final survivors — all of which
    received the full last-round playout count — are compared by q̂ alone
    (prior as an epsilon tiebreak).  Measured r4: the noise term flips
    close calls and costs conversion against weaker opponents; greedy_final
    is the exploitative eval-bot setting.

    `m` must be a power of two (halving rounds = log2(m)); `k0` playouts per
    candidate in round 0.  `ctx` (params) supplies the actor prior, guided
    playout policy and critic leaf values; without it the prior is uniform
    over legal actions and leaves score by prestige lead (mc.leaf_values).

    `determinize_fn` (single-state `(state, key) -> state`) switches the
    search to information-set mode (search/ismc.py): each playout lane
    expands its root child from a FRESH determinization of the mover's
    information set instead of the true state, so candidate values estimate
    censored-observation action values.  Determinizations are drawn per
    (game, lane) and shared across the surviving candidates in a round —
    common random numbers, as in ismc.censored_mc_q.
    """
    rounds = int(m).bit_length() - 1
    if m <= 1 or (1 << rounds) != m:
        raise ValueError(f"m must be a power of two >= 2, got {m}")
    if m > A:
        # argsort below slices to A columns; a larger m would broadcast-fail
        # deep inside the search with shapes (B, m) vs (B, A).
        raise ValueError(
            f"m must be <= TOTAL_ACTIONS ({A}), got {m}"
        )

    def fn(ctx, obs, mask, state, key):
        B = mask.shape[0]
        me = state.to_play
        k_gumbel, k_play, k_det = jax.random.split(key, 3)

        if ctx is not None:
            logits = ac.actor_logits(ctx, obs)
        else:
            logits = jnp.zeros((B, A))
        # Gumbel-top-k: adding iid Gumbel noise and taking the top m legal
        # entries samples m actions without replacement from softmax(logits).
        g = jax.random.gumbel(k_gumbel, (B, A))
        gscore = jnp.where(mask, g + logits, _NEG)
        cand = _root_candidates(gscore, logits, mask, m)  # [B, m]
        cand_live = jnp.take_along_axis(mask, cand, axis=1)  # [B, m]
        cand_g = jnp.take_along_axis(gscore, cand, axis=1)  # g+logits, -inf pad

        if determinize_fn is None:
            # Root children once per candidate (chance events under rng_mode
            # are a pure function of the state, as in mc/uct).
            child = jax.vmap(
                lambda s, aa: jax.vmap(
                    lambda a: R.apply_action(s, a, rng_mode=rng_mode)
                )(aa)
            )(state, cand)  # pytree [B, m, ...]

        # Running mean value per candidate slot across rounds.
        q_sum = jnp.zeros((B, m))
        n_cnt = jnp.zeros((B, m))
        alive = cand_live  # [B, m] survivors this round
        lanes = m * k0  # constant lane budget per round

        for r in range(rounds):
            n_alive = m >> r  # candidates still in the running
            k_r = lanes // n_alive  # playouts each this round
            # Re-pack survivors into the first n_alive slots (argsort on the
            # alive mask is stable, so the slot order is preserved).
            order = jnp.argsort(~alive, axis=-1, stable=True)[:, :n_alive]
            N = B * n_alive * k_r

            if determinize_fn is None:
                sub_child = jax.tree.map(
                    lambda x: jnp.take_along_axis(
                        x, order.reshape((B, n_alive) + (1,) * (x.ndim - 2)),
                        axis=1,
                    ),
                    child,
                )

                def rep(x):
                    t = jnp.broadcast_to(
                        x[:, :, None], (B, n_alive, k_r) + x.shape[2:]
                    )
                    return t.reshape((N,) + x.shape[2:])

                flat = jax.tree.map(rep, sub_child)
            else:
                # Information-set mode: k_r fresh worlds per game this round
                # (shared across candidates — CRN), root child = candidate
                # action applied to the DETERMINIZED state, so refills draw
                # from the resampled deck.
                sub_cand = jnp.take_along_axis(cand, order, axis=1)
                ks = jax.random.split(
                    jax.random.fold_in(k_det, r), B * k_r
                ).reshape(B, k_r, 2)
                det = jax.vmap(
                    lambda s, kk: jax.vmap(
                        lambda k1: determinize_fn(s, k1)
                    )(kk)
                )(state, ks)  # [B, k_r, ...]
                child_r = jax.vmap(
                    lambda dets, aa: jax.vmap(
                        lambda a: jax.vmap(
                            lambda s: R.apply_action(s, a, rng_mode=rng_mode)
                        )(dets)
                    )(aa)
                )(det, sub_cand)  # [B, n_alive, k_r, ...]
                flat = jax.tree.map(
                    lambda x: x.reshape((N,) + x.shape[3:]), child_r
                )
            me_flat = jnp.broadcast_to(
                me[:, None, None], (B, n_alive, k_r)
            ).reshape(N)
            vals = rollout_values(
                flat, me_flat, ctx, jax.random.fold_in(k_play, r),
                horizon, rng_mode=rng_mode, guided=guided,
            ).reshape(B, n_alive, k_r)
            # Scatter the per-survivor sums back to their original slots.
            add_sum = jnp.zeros((B, m)).at[
                jnp.arange(B)[:, None], order
            ].add(vals.sum(-1))
            add_cnt = jnp.zeros((B, m)).at[
                jnp.arange(B)[:, None], order
            ].add(float(k_r))
            q_sum = q_sum + jnp.where(alive, add_sum, 0.0)
            n_cnt = n_cnt + jnp.where(alive, add_cnt, 0.0)

            if r < rounds - 1:
                q_hat = q_sum / jnp.maximum(n_cnt, 1.0)
                score = jnp.where(alive, cand_g + c_scale * q_hat, _NEG)
                keep = m >> (r + 1)
                # Survivors = top-`keep` slots by RANK, not a >= threshold
                # test: an exact tie at the threshold would keep extra slots
                # that the repack then silently starves of playouts while
                # leaving them eligible in the final argmax with a stale q̂.
                top = jnp.argsort(-score, axis=-1)[:, :keep]  # [B, keep]
                in_top = (
                    jnp.arange(m)[None, None, :] == top[:, :, None]
                ).any(axis=1)
                alive = alive & in_top

        # Final pick: argmax of g + logits + sigma(q̂) over the survivors
        # (never a padded slot: alive ⊆ cand_live and slot 0 is always
        # legal when any action is).  Under greedy_final the surviving
        # candidates (equal, maximal playout counts) compare by q̂ alone.
        q_hat = q_sum / jnp.maximum(n_cnt, 1.0)
        if greedy_final:
            cand_logits = jnp.take_along_axis(logits, cand, axis=1)
            final = jnp.where(alive, q_hat + 1e-3 * cand_logits, _NEG)
        else:
            final = jnp.where(alive, cand_g + c_scale * q_hat, _NEG)
        best_slot = jnp.argmax(final, axis=-1)
        return jnp.take_along_axis(
            cand, best_slot[:, None], axis=1
        )[:, 0].astype(jnp.int32)

    censored = determinize_fn is not None
    fn.__name__ = (
        f"{'censored_' if censored else ''}gumbel_search_m{m}_k{k0}_h{horizon}"
        f"{'_gf' if greedy_final else ''}"
    )
    # Privileged unless determinized: root children expand the TRUE state
    # (deck order, blind reserves) — see mc.py's note / search/ismc.py.
    fn.privileged = not censored
    return fn


def gumbel_search_policy(
    m: int = 16,
    k0: int = 6,
    horizon: int = 4,
    params=None,
    c_scale: float = 10.0,
    rng_mode: str = "fast",
    guided: bool = True,
    greedy_final: bool = False,
) -> Tuple:
    """Eval-harness PolicySpec for the Gumbel sequential-halving search."""
    return (
        gumbel_search_fn(
            m=m, k0=k0, horizon=horizon, c_scale=c_scale,
            rng_mode=rng_mode, guided=guided, greedy_final=greedy_final,
        ),
        params,
    )
