"""Opponent policies, in two idioms:

* **Device (jittable)**: pure `(obs, mask, state, key) -> action` functions
  that `vmap` over thousands of games — used by the on-device rollout.
* **Host (numpy)**: `(obs, info) -> action` callables matching the reference
  signatures for the gym wrappers / host eval.

Behavior parity with the reference heuristics in
`splendor_gym/scripts/eval_suite.py`: `greedy_opponent_v1` (:10-30),
`basic_priority_opponent` (:33-77), `greedy_opponent_v2` (:80-128) and
`random_opponent` (wrappers/selfplay.py:66-73).  Random tie-breaks use the
caller-supplied JAX key on device (numpy global RNG on host, like the
reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..engine import rules as R
from ..engine import data as D

# Action-family group masks (bool[45]).  ensure_compile_time_eval: the
# module may be imported lazily from inside an active jit trace (see
# engine/rules.py's table block).
_A = np.arange(R.TOTAL_ACTIONS)
with jax.ensure_compile_time_eval():
    GROUP_TAKE3 = jnp.asarray((_A >= 0) & (_A <= 9))
    GROUP_TAKE2 = jnp.asarray((_A >= 10) & (_A <= 14))
    GROUP_BUY_VIS = jnp.asarray((_A >= 15) & (_A <= 26))
    GROUP_RESERVE = jnp.asarray((_A >= 27) & (_A <= 41))
    GROUP_BUY_RES = jnp.asarray((_A >= 42) & (_A <= 44))
    GROUP_BUYS = GROUP_BUY_VIS | GROUP_BUY_RES

_NEG = -jnp.inf


def first_legal(mask):
    """Lowest legal action index (argmax of bool finds the first True)."""
    return jnp.argmax(mask).astype(jnp.int32)


def _first_in(mask, group):
    m = mask & group
    return m.any(), jnp.argmax(m).astype(jnp.int32)


def _uniform_in(key, mask, group):
    """Uniform random legal action within a group (0 logits -> uniform)."""
    m = mask & group
    logits = jnp.where(m, 0.0, _NEG)
    return m.any(), jax.random.categorical(key, logits).astype(jnp.int32)


# Strictly-upper-triangular ones: mask @ _TRIU = exclusive prefix count.
with jax.ensure_compile_time_eval():
    _TRIU45 = jnp.triu(
        jnp.ones((R.TOTAL_ACTIONS, R.TOTAL_ACTIONS), jnp.float32), 1
    )


def uniform_legal_action(key, mask):
    """Uniform random legal action; works for mask[45] and batched [..., 45].

    Picks the floor(u*n_legal)-th legal action via an exclusive prefix count
    (one tiny [.,45]x[45,45] matmul).  Measured cheaper than building a
    masked logits matrix and running `jax.random.categorical` (gumbel noise
    = uniform+log+neg over [B,45] f32, then an argmax reduce) in the hot
    env loop.  Zero-mask rows return action 0 (the caller's step declares
    those lanes drawn regardless of the action, splendor_env.py:56-61).
    """
    m = mask.astype(jnp.float32)
    n = m.sum(-1, keepdims=True)
    u = jax.random.uniform(key, mask.shape[:-1] + (1,))
    # floor(u*n) lands in [0, n); clamp guards the half-ulp-below-1 u where
    # u*n rounds up to exactly n (zero-mask rows clamp to -1 -> no hit -> 0).
    k = jnp.minimum(jnp.floor(u * n), n - 1)
    before = m @ _TRIU45  # exclusive prefix count per row
    hit = mask & (before == k)
    return jnp.argmax(hit, axis=-1).astype(jnp.int32)


def random_policy(obs, mask, state, key):
    """Uniform over all legal actions."""
    return uniform_legal_action(key, mask)


def greedy_v1_policy(obs, mask, state, key):
    """buy > take2 > take3 > reserve, first legal in each group
    (eval_suite.py:10-30).  Deterministic."""
    has_buy, a_buy = _first_in(mask, GROUP_BUYS)
    has_t2, a_t2 = _first_in(mask, GROUP_TAKE2)
    has_t3, a_t3 = _first_in(mask, GROUP_TAKE3)
    has_res, a_res = _first_in(mask, GROUP_RESERVE)
    return jnp.where(
        has_buy, a_buy,
        jnp.where(has_t2, a_t2, jnp.where(has_t3, a_t3, jnp.where(has_res, a_res, first_legal(mask)))),
    )


def basic_priority_policy(obs, mask, state, key):
    """Highest-points visible buy (random tie-break) > reserved buy (random)
    > take3 (random) > take2 (random) > reserve (random) > first legal
    (eval_suite.py:33-77).  Card points read from obs offsets exactly like
    the reference (obs[32 + idx*13 + 2])."""
    k1, k2 = jax.random.split(key)
    buy_vis = mask & GROUP_BUY_VIS
    pts = obs[32 + 2 : 32 + 2 + 12 * 13 : 13]  # 12 visible-card point values
    pts45 = jnp.zeros(R.TOTAL_ACTIONS, jnp.int32).at[15:27].set(pts)
    best_pts = jnp.max(jnp.where(buy_vis, pts45, -1))
    best_vis = buy_vis & (pts45 == best_pts)
    has_vis = buy_vis.any()
    a_vis = jax.random.categorical(k1, jnp.where(best_vis, 0.0, _NEG)).astype(jnp.int32)
    has_res_buy, a_res_buy = _uniform_in(k1, mask, GROUP_BUY_RES)
    has_t3, a_t3 = _uniform_in(k2, mask, GROUP_TAKE3)
    has_t2, a_t2 = _uniform_in(k2, mask, GROUP_TAKE2)
    has_rsv, a_rsv = _uniform_in(k2, mask, GROUP_RESERVE)
    return jnp.where(
        has_vis, a_vis,
        jnp.where(
            has_res_buy, a_res_buy,
            jnp.where(has_t3, a_t3,
                      jnp.where(has_t2, a_t2, jnp.where(has_rsv, a_rsv, first_legal(mask)))),
        ),
    )


def greedy_v2_policy(obs, mask, state, key):
    """Noble/scarcity-aware greedy (eval_suite.py:89-127): buys first; else
    take-2 of the scarcest bank color; else take-3 minimizing bank-count sum;
    else reserve with the highest action index.  Uses the true device state's
    bank (the reference needed an env back-reference hack).

    Labeled `privileged` because it reads GameState rather than the obs —
    matching the reference's env-ref split (`greedy_opponent_v2_factory`,
    eval_suite.py:80-128).  Its only read (the bank) is obs-public, unlike
    the search bots' deck/blind-reserve reads."""
    bank5 = state.bank[:5]
    has_buy, a_buy = _first_in(mask, GROUP_BUYS)
    # take-2: minimize bank count, ties -> lowest action index.
    t2 = mask & GROUP_TAKE2
    t2_score = bank5 * 64 + jnp.arange(5)
    a_t2 = (10 + jnp.argmin(jnp.where(t2[10:15], t2_score, 10_000))).astype(jnp.int32)
    # take-3: minimize sum of bank counts over the combo.
    t3 = mask & GROUP_TAKE3
    combo_sum = (jnp.asarray(D.COMBO_MASK) * bank5[None, :]).sum(axis=1)
    t3_score = combo_sum * 64 + jnp.arange(10)
    a_t3 = jnp.argmin(jnp.where(t3[:10], t3_score, 10_000)).astype(jnp.int32)
    # reserve: highest legal index in 27..41.
    rsv = mask & GROUP_RESERVE
    a_rsv = (44 - jnp.argmax(rsv[::-1])).astype(jnp.int32)
    return jnp.where(
        has_buy, a_buy,
        jnp.where(t2.any(), a_t2,
                  jnp.where(t3.any(), a_t3, jnp.where(rsv.any(), a_rsv, first_legal(mask)))),
    )


greedy_v2_policy.privileged = True  # reads GameState (see docstring)

DEVICE_POLICIES = {
    "random": random_policy,
    "greedy_v1": greedy_v1_policy,
    "basic": basic_priority_policy,
    "greedy_v2": greedy_v2_policy,
}


# ---------------------------------------------------------------------------
# Host (numpy) versions with the reference's exact control flow.
# ---------------------------------------------------------------------------


def random_opponent(obs, info):
    legal = np.flatnonzero(info["action_mask"])
    return int(np.random.choice(legal)) if len(legal) else 0


def greedy_opponent_v1(obs, info):
    legal = np.flatnonzero(info["action_mask"])
    if len(legal) == 0:
        return 0
    for group in (
        [a for a in legal if (15 <= a <= 26) or (42 <= a <= 44)],
        [a for a in legal if 10 <= a <= 14],
        [a for a in legal if 0 <= a <= 9],
        [a for a in legal if 27 <= a <= 41],
    ):
        if group:
            return int(group[0])
    return int(legal[0])


def basic_priority_opponent(obs, info):
    legal = np.flatnonzero(info["action_mask"])
    if len(legal) == 0:
        return 0
    buy_vis = [a for a in legal if 15 <= a <= 26]
    buy_res = [a for a in legal if 42 <= a <= 44]
    if buy_vis:
        pts = {a: int(obs[32 + (a - 15) * 13 + 2]) for a in buy_vis}
        best = max(pts.values())
        return int(np.random.choice([a for a in buy_vis if pts[a] == best]))
    if buy_res:
        return int(np.random.choice(buy_res))
    for group in (
        [a for a in legal if 0 <= a <= 9],
        [a for a in legal if 10 <= a <= 14],
        [a for a in legal if 27 <= a <= 41],
    ):
        if group:
            return int(np.random.choice(group))
    return int(legal[0])


def greedy_opponent_v2_factory(env_ref=None):
    """Scarcity-aware greedy; reads the bank from the wrapped env's state."""

    def policy(obs, info):
        legal = np.flatnonzero(info["action_mask"])
        if len(legal) == 0:
            return 0
        buys = [a for a in legal if (15 <= a <= 26)] + [a for a in legal if 42 <= a <= 44]
        if buys:
            return int(buys[0])
        if env_ref is not None and getattr(env_ref, "state", None) is not None:
            bank_vec = [int(x) for x in np.asarray(env_ref.state.bank)[:5]]
        else:
            bank_vec = [1, 1, 1, 1, 1]
        take2 = [a for a in legal if 10 <= a <= 14]
        if take2:
            return int(min(take2, key=lambda a: bank_vec[a - 10]))
        take3 = [a for a in legal if 0 <= a <= 9]
        if take3:
            return int(min(take3, key=lambda a: sum(bank_vec[i] for i in D.TAKE3_COMBOS[a])))
        res = [a for a in legal if 27 <= a <= 41]
        if res:
            return int(sorted(res, reverse=True)[0])
        return int(legal[0])

    return policy


HOST_POLICIES = {
    "random": random_opponent,
    "greedy_v1": greedy_opponent_v1,
    "basic": basic_priority_opponent,
}
