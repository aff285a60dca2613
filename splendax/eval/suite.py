"""Evaluation suite: batched on-device match harness + host-level API parity.

Replaces the reference eval stack (`splendor_gym/scripts/eval_suite.py`):
`eval_vs_opponent` (:162-208) played one python game at a time; here all
`n_games` run in lockstep inside one jitted scan — 400 games cost roughly one
game's wall-clock.  Protocol parity: win-rate ± 1.96*sqrt(p(1-p)/n), avg
turns, avg prestige of the last mover, illegal-action rate, and the
random/greedy_v1/basic/self opponent roster of `run_evaluation_suite`
(training_utils.py:237-260).

Policies are (fn, ctx) pairs — `fn(ctx, obs, mask, state, key) -> action` on
full batches, with `ctx` a traced pytree (e.g. network params) so repeated
evals with fresh params DON'T recompile.

Outcome counting uses the final-rewards view (win: fr0>0, loss: fr0<0 —
turn-limit draws count as losses, matching the reference's r<0 branch).  The
reference's SelfPlayWrapper sign-flip quirk that counts an opponent-move
turn-limit draw as a *win* (+0.1 after flip) is intentionally not reproduced;
see docs/DEFECTS.md.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.types import TURN_LIMIT
from ..env import core
from ..models import actor_critic as ac
from ..selfplay import dual
from ..selfplay.opponents import DEVICE_POLICIES

# A policy spec: (fn, ctx) with fn(ctx, obs, mask, state, key) -> action[B].
PolicySpec = Tuple[Callable, object]


def _greedy_model_fn(params, obs, mask, state, key):
    """Argmax masked logits (reference model_greedy_policy_from,
    eval_suite.py:131-141)."""
    return ac.greedy_action(ac.actor_logits(params, obs), mask)


def _sampling_model_fn(params, obs, mask, state, key):
    """Stochastic masked sample (reference eval_vs_random.py:18-27)."""
    a, _ = ac.sample_action(key, ac.actor_logits(params, obs), mask)
    return a


def _heuristic_fn(name: str) -> Callable:
    heuristic = DEVICE_POLICIES[name]

    def fn(ctx, obs, mask, state, key):
        keys = jax.random.split(key, obs.shape[0])
        return jax.vmap(heuristic)(obs, mask, state, keys)

    fn.__name__ = f"heuristic_{name}"
    fn.privileged = is_privileged((heuristic, None))
    return fn


def is_privileged(policy: PolicySpec) -> bool:
    """True if the policy fn reads the full GameState (deck order, blind
    reserves — information the 297-dim obs censors) rather than only the
    observation.  Policy fns self-declare with a ``privileged = True``
    attribute (search bots: mc/uct/gumbel; heuristics: greedy_v2); obs-only
    policies (nets, random/greedy_v1/basic/noble) default False.

    Every eval/duel result dict carries this flag for both sides (VERDICT r3
    weak-spot 5): privileged and obs-only agents are different weight
    classes and their scores must not be compared without it — matching the
    reference's own split between obs heuristics (eval_suite.py:10-77) and
    the env-ref `greedy_opponent_v2_factory` (:80-128)."""
    return bool(getattr(policy[0], "privileged", False))


# Built lazily (and cached so the jit static-arg identity is stable) because
# policies may register into DEVICE_POLICIES after this module imports
# (e.g. eval.noble).
_HEURISTIC_FNS: Dict[str, Callable] = {}


def model_greedy_policy(params) -> PolicySpec:
    return (_greedy_model_fn, params)


def model_sampling_policy(params) -> PolicySpec:
    return (_sampling_model_fn, params)


def heuristic_policy(name: str) -> PolicySpec:
    if name not in _HEURISTIC_FNS:
        if name not in DEVICE_POLICIES:  # late registrations (eval.noble)
            from . import noble  # noqa: F401
        _HEURISTIC_FNS[name] = _heuristic_fn(name)
    return (_HEURISTIC_FNS[name], None)


@partial(jax.jit, static_argnames=("agent_fn", "opp_fn", "n_games", "rng_mode"))
def _play_matches(
    agent_fn, agent_ctx, opp_fn, opp_ctx, n_games: int, key, rng_mode: str = "fast"
):
    """Run n_games to completion (agent = player 0).  Returns per-game
    (final_reward0, turn_count, prestige_last_mover, illegal, checks, active)."""
    k_reset, k_run = jax.random.split(key)
    state, obs, mask = jax.vmap(core.reset)(jax.random.split(k_reset, n_games))
    active = jnp.ones(n_games, bool)
    illegal = jnp.zeros(n_games, jnp.int32)
    checks = jnp.zeros(n_games, jnp.int32)
    final_r = jnp.zeros(n_games, jnp.float32)

    opp_policy = lambda obs, mask, state, key: opp_fn(opp_ctx, obs, mask, state, key)

    def body(carry, key):
        state, obs, mask, active, illegal, checks, final_r = carry
        k_agent, k_opp = jax.random.split(key)
        a = agent_fn(agent_ctx, obs, mask, state, k_agent)
        next_state, out = dual.dual_step(state, a, opp_policy, k_opp, rng_mode)
        checks = checks + active
        illegal = illegal + (active & out.illegal_agent)
        newly_done = active & out.done
        final_r = jnp.where(newly_done, out.agent_reward, final_r)

        def keep(new, old):
            d = active.reshape((n_games,) + (1,) * (old.ndim - 1))
            return jnp.where(d, new, old)

        state = jax.tree.map(keep, next_state, state)
        obs = keep(out.agent_obs, obs)
        mask = keep(out.action_mask, mask)
        active = active & ~out.done
        return (state, obs, mask, active, illegal, checks, final_r), None

    # A full game is at most TURN_LIMIT complete turns (rules.py:274-279).
    (state, obs, mask, active, illegal, checks, final_r), _ = jax.lax.scan(
        body,
        (state, obs, mask, active, illegal, checks, final_r),
        jax.random.split(k_run, TURN_LIMIT),
    )
    last_mover = (state.to_play - 1) % 2
    prestige = jnp.take_along_axis(state.prestige, last_mover[:, None], axis=1)[:, 0]
    return final_r, state.turn_count, prestige, illegal, checks, active


def summarize(final_r, turns, prestige, illegal, checks) -> Dict:
    """Reference eval_vs_opponent stats dict (eval_suite.py:195-208)."""
    final_r = np.asarray(final_r)
    n = len(final_r)
    wins = int((final_r > 0).sum())
    losses = int((final_r < 0).sum())
    draws = n - wins - losses
    p = wins / max(1, n)
    ci = 1.96 * np.sqrt(p * (1 - p) / max(1, n))
    return {
        "n": n,
        "wins": wins,
        "losses": losses,
        "draws": draws,
        "win_rate": p,
        "win_rate_ci95": ci,
        "avg_turns": float(np.mean(np.asarray(turns))),
        "avg_prestige": float(np.mean(np.asarray(prestige))),
        "illegal_action_rate": float(
            np.asarray(illegal).sum() / max(1, np.asarray(checks).sum())
        ),
    }


def eval_vs_opponent(
    agent: PolicySpec,
    opponent: PolicySpec,
    n_games: int = 400,
    seed: int = 0,
    rng_mode: str = "fast",
) -> Dict:
    """Device-native analogue of reference eval_vs_opponent (:162-208)."""
    final_r, turns, prestige, illegal, checks, still_active = _play_matches(
        agent[0], agent[1], opponent[0], opponent[1],
        n_games, jax.random.PRNGKey(seed), rng_mode,
    )
    assert not bool(np.asarray(still_active).any()), "game exceeded turn limit?"
    res = summarize(final_r, turns, prestige, illegal, checks)
    res["privileged"] = {
        "agent": is_privileged(agent), "opponent": is_privileged(opponent)
    }
    return res


def head_to_head(
    a: PolicySpec,
    b: PolicySpec,
    n_games: int = 400,
    seed: int = 0,
    rng_mode: str = "fast",
) -> Dict:
    """Seat-averaged head-to-head: `n_games` with `a` as player 0, `n_games`
    with `b` as player 0, scored from `a`'s side across both orders.

    The single-seat `eval_vs_opponent` matches the reference protocol
    (eval_suite.py:162-208) but is biased for strength claims: first-mover
    advantage in Splendor is large (measured ~0.65-0.69 for equal agents,
    docs/PERF.md "PFSP"), so every strength comparison in this repo uses this
    primitive.  Scoring is outcome-exact from the raw final rewards: win +1,
    loss -1, stalemate 0 and turn-limit -0.1 (BOTH seats) are draws worth
    0.5 points — unlike `summarize`, which follows the reference in counting
    the turn-limit's r<0 as a loss for whichever side is being summarized
    (that convention double-counts across the two orders).

    **Paired mirrored deals** (r5, VERDICT r4 item 4): the two seat orders
    are played on IDENTICAL initial deals (same reset key stream; game i of
    order 0 and game i of order 1 start from the same shuffle), and the CI
    is computed over per-deal paired means.  Pairing makes every comparison
    deal-controlled and self-mirrors exact (0.500 ± 0); its CI effect is
    matchup-dependent — between-seat variance cancels (big win when the
    ~0.65-0.69 first-mover gap is in play) but cross-order deal-skill
    covariance adds (a wash for strong-net matchups, whose seat gap is
    trained away; measured numbers in docs/PERF.md "Evaluation").

    Returns ``score`` (a's mean points in [0, 1] over 2*n_games; 0.5 =
    parity), the paired ``score_ci95``, strict ``win/draw/loss`` counts, and
    the per-seat splits.
    """
    per_seat = []
    pts = []
    for order, (p0, p1) in enumerate(((a, b), (b, a))):
        fr, turns, prestige, illegal, checks, still = _play_matches(
            p0[0], p0[1], p1[0], p1[1], n_games,
            jax.random.PRNGKey(seed), rng_mode,
        )
        assert not bool(np.asarray(still).any()), "game exceeded turn limit?"
        fr = np.asarray(fr)
        win_p0 = fr > 0.5   # winner's exact +1
        loss_p0 = fr < -0.5  # loser's exact -1
        draw = ~win_p0 & ~loss_p0  # stalemate 0 / turn-limit -0.1 (both seats)
        a_won = loss_p0 if order else win_p0
        pts.append(a_won.astype(np.float64) + 0.5 * draw)
        seat = summarize(fr, turns, prestige, illegal, checks)
        seat["a_wins"] = int(a_won.sum())
        seat["a_draws"] = int(draw.sum())
        seat["a_losses"] = int(n_games - a_won.sum() - draw.sum())
        per_seat.append(seat)
    # Per-deal paired mean: deal i contributes (pts_as_first + pts_as_second)/2.
    pair_means = (pts[0] + pts[1]) / 2.0
    n = 2 * n_games
    score = float(pair_means.mean())
    ci = float(1.96 * np.sqrt(max(pair_means.var(), 0.0) / n_games))
    wins = per_seat[0]["a_wins"] + per_seat[1]["a_wins"]
    draws = per_seat[0]["a_draws"] + per_seat[1]["a_draws"]
    return {
        "n": n,
        "n_pairs": n_games,
        "paired_deals": True,
        "score": score,
        "score_ci95": ci,
        "wins": wins,
        "draws": draws,
        "losses": n - wins - draws,
        "win_rate": wins / n,
        "privileged": {"a": is_privileged(a), "b": is_privileged(b)},
        "first_seat": per_seat[0],
        "second_seat": per_seat[1],
    }


def run_evaluation_suite(
    params, n_games: int = 400, seed: int = 0, opponents: Optional[list] = None
) -> Dict[str, Dict]:
    """Model vs random / greedy_v1 / basic / self
    (training_utils.py:237-260)."""
    agent = model_greedy_policy(params)
    opponents = opponents or ["random", "greedy_v1", "basic", "self"]
    results = {}
    for i, name in enumerate(opponents):
        opp = model_greedy_policy(params) if name == "self" else heuristic_policy(name)
        results[name] = eval_vs_opponent(agent, opp, n_games, seed + i)
    return results


def bot_round_robin(
    pairs: list, n_games: int = 200, seed: int = 0
) -> Dict[str, Dict]:
    """Pairwise bot matches (reference eval_bots.py:31-74)."""
    results = {}
    for i, (left, right) in enumerate(pairs):
        results[f"{left}:{right}"] = eval_vs_opponent(
            heuristic_policy(left), heuristic_policy(right), n_games, seed + i
        )
    return results
