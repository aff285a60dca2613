"""Masked-PPO self-play trainer, fully on device.

Replaces the reference training stack (`ppo_splendor.py:202-405`): the
rollout (T steps x N envs of complete self-play turns), GAE, and the clipped
PPO update with value clipping, entropy schedule and target-KL early stop all
run inside ONE jitted `update_step` — no host<->device traffic in the hot
loop (the reference round-trips numpy<->torch twice per step,
ppo_splendor.py:221-225).

Semantics parity notes:
  * masked categorical with no-legal-row passthrough (ppo_splendor.py:27-38)
  * GAE exactly as the numpy loop (:299-314)
  * minibatch shuffling per epoch, ratio clip, value clip, grad-clip 0.5,
    KL early stop breaking the MINIBATCH loop only (:333-361) — here the
    remaining minibatches of the epoch become no-ops and the next epoch
    restarts, matching the reference's `break`
  * entropy schedule ent_coef -> ent_coef_final (:331-332)
  * opponent pool: snapshot every `snapshot_every_updates`, FIFO cap,
    p_current sampling per episode (:135-143, 367-370)
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..engine.types import GameState
from ..env import core
from ..env import ring as ring_lib
from ..models import actor_critic as ac
from ..selfplay import dual, pool as pool_lib
from ..selfplay.opponents import DEVICE_POLICIES
from .config import PPOConfig


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    pool: pool_lib.OpponentPool
    env_state: GameState  # [N] batched
    obs: jnp.ndarray  # int32[N, 297]
    mask: jnp.ndarray  # bool[N, 45]
    opp_idx: jnp.ndarray  # int32[N]
    key: jnp.ndarray
    update_idx: jnp.ndarray  # int32
    global_step: jnp.ndarray  # int64-ish int32 counter of env steps


@struct.dataclass
class Rollout:
    obs: jnp.ndarray  # [T, N, 297]
    mask: jnp.ndarray  # [T, N, 45]
    action: jnp.ndarray  # [T, N]
    logp: jnp.ndarray  # [T, N]
    value: jnp.ndarray  # [T, N]
    reward: jnp.ndarray  # [T, N]
    done: jnp.ndarray  # [T, N]


def make_optimizer(cfg: PPOConfig):
    """Adam(eps=1e-5) + global-norm clip 0.5 (ppo_splendor.py:147,355) with
    an injectable learning rate for annealing (:204-208)."""
    return optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.clip_by_global_norm(0.5),
            optax.adam(learning_rate, eps=1e-5),
        )
    )(learning_rate=cfg.lr)


def init_train_state(cfg: PPOConfig, key=None) -> TrainState:
    key = jax.random.PRNGKey(cfg.seed) if key is None else key
    k_params, k_env, k_opp, k_run = jax.random.split(key, 4)
    params = ac.init_params(k_params, hidden=cfg.hidden)
    opt_state = make_optimizer(cfg).init(params)
    opp_pool = pool_lib.init_pool(params, cfg.pool_size, cfg.p_current)
    env_state, obs, mask = core.reset_batch(jax.random.split(k_env, cfg.num_envs))
    opp_idx = _sample_opponents(cfg, opp_pool, k_opp, (cfg.num_envs,))
    return TrainState(
        params=params,
        opt_state=opt_state,
        pool=opp_pool,
        env_state=env_state,
        obs=obs,
        mask=mask,
        opp_idx=opp_idx,
        key=k_run,
        update_idx=jnp.int32(0),
        global_step=jnp.int32(0),
    )


def _anneal(cfg: PPOConfig, update_idx):
    """LR and entropy-coef schedules (ppo_splendor.py:204-208, 331-332)."""
    denom = max(1, cfg.num_updates - 1)
    progress = update_idx.astype(jnp.float32) / denom
    lr = jnp.where(cfg.lr_anneal, cfg.lr * (1.0 - progress), cfg.lr)
    ent = cfg.ent_coef + (cfg.ent_coef_final - cfg.ent_coef) * progress
    return lr, ent


def _sample_opponents(cfg: PPOConfig, pool, key, shape):
    """Per-episode opponent slot sampling.  With cfg.search_opponent, the
    sentinel slot `pool_size + 1` (one past CURRENT) marks "the current
    snapshot wrapped in Gumbel search" and is drawn with p_search;
    `record_outcomes`' one-hot is [pool_size+1]-wide, so sentinel episodes
    simply don't feed PFSP stats."""
    if not cfg.search_opponent:
        return pool_lib.sample_opponent_idx(pool, key, shape, cfg.opponent_sampling)
    k1, k2 = jax.random.split(key)
    idx = pool_lib.sample_opponent_idx(pool, k1, shape, cfg.opponent_sampling)
    if cfg.search_static:
        # Static partition (config.py `search_static`): every
        # `search_stride`-th row (n_search_static of them) is ALWAYS the
        # sentinel, so the search can run on a static strided slice instead
        # of the whole batch.  Strided, not a prefix, so dp shards split the
        # search work evenly (ADVICE r4).
        return jnp.where(
            _static_sentinel_rows(cfg, shape[0]), pool.pool_size + 1, idx
        ).astype(jnp.int32)
    use_search = jax.random.uniform(k2, shape) < cfg.p_search
    return jnp.where(use_search, pool.pool_size + 1, idx).astype(jnp.int32)


def _static_sentinel_rows(cfg: PPOConfig, n: int):
    """bool[n]: which rows the static league partition pins to the sentinel
    (rows 0, stride, 2*stride, ... — n_search_static of them)."""
    rows = jnp.arange(n)
    k = cfg.search_stride
    return (rows % k == 0) & (rows < cfg.n_search_static * k)


def _opponent_policy(cfg: PPOConfig, opp_pool, opp_idx):
    if cfg.self_play:
        base = pool_lib.pool_greedy_policy(opp_pool, opp_idx)
        if not cfg.search_opponent:
            return base
        # Search-hardened league slot: episodes whose opp_idx is the
        # sentinel (pool_size + 1) face the CURRENT snapshot improved by a
        # cheap Gumbel sequential-halving search.  The search runs
        # branchlessly for the whole batch (XLA has no dynamic gather of
        # the subset); sized by cfg.search_m/k0/horizon to stay a small
        # multiple of a normal opponent move.
        from ..search.gumbel import gumbel_search_fn

        # greedy_final: the slot is a sparring partner, so use the
        # exploitative acting rule (measured strongest, docs/PERF.md
        # "Round-4 fixes") — the paper's noisy acting rule only matters
        # when the search output is a training target.
        # search_censored switches the slot to information-set mode so the
        # sparring partner is information-FAIR: playouts expand fresh
        # determinizations of the mover's info set instead of x-raying deck
        # order / blind reserves (search/ismc.py; VERDICT r4 weak-spot 4).
        det = None
        if cfg.search_censored:
            from ..search.ismc import determinize as det  # noqa: F811
        search_fn = gumbel_search_fn(
            m=cfg.search_m, k0=cfg.search_k0, horizon=cfg.search_horizon,
            rng_mode=cfg.rng_mode, greedy_final=True, determinize_fn=det,
        )
        cur = jax.tree.map(lambda x: x[-1], opp_pool.stack)  # CURRENT slot

        if cfg.search_static:
            # Sentinel rows are the static strided set (see
            # _sample_opponents), so the search — the expensive part —
            # runs on a static strided slice: ~1/p_search cheaper than the
            # branchless whole-batch where() below.  Static strided slices
            # of the state pytree are layout transforms, not per-row
            # dynamic gathers (PERF rule 5); with stride | per-shard batch
            # each dp shard slices locally and keeps an equal share of the
            # search work (ADVICE r4 — a [0:S) prefix put it all on shard 0).
            S = cfg.n_search_static
            k = cfg.search_stride
            lim = S * k

            def policy(obs, mask, state, key):
                a_base = base(obs, mask, state, key)
                if S == 0:
                    return a_base
                sl = jax.tree.map(lambda x: x[:lim:k], state)
                a_s = search_fn(cur, obs[:lim:k], mask[:lim:k], sl,
                                jax.random.fold_in(key, 1))
                return a_base.at[:lim:k].set(a_s)

            return policy

        def policy(obs, mask, state, key):
            a_base = base(obs, mask, state, key)
            a_search = search_fn(cur, obs, mask, state, key)
            return jnp.where(
                opp_idx == opp_pool.pool_size + 1, a_search, a_base
            )

        return policy
    heuristic = DEVICE_POLICIES[cfg.train_opponent]

    def policy(obs, mask, state, key):
        B = obs.shape[0]
        keys = jax.random.split(key, B)
        return jax.vmap(heuristic)(obs, mask, state, keys)

    return policy


def _rollout(cfg: PPOConfig, ts: TrainState):
    """T complete self-play turns for N games, as one lax.scan.

    Fresh games for autoreset come from a pre-generated FreshGameRing
    (env/ring.py) built once per rollout — one batched reset amortized over
    all T turns instead of a full-batch reset every turn (~10% of rollout
    time at the 4096-env config)."""
    opp_pool = pool_lib.set_current(ts.pool, ts.params)
    use_ring = cfg.reset_ring_mult > 0
    track_stats = cfg.opponent_sampling == "pfsp" and cfg.self_play
    if cfg.self_play and cfg.search_opponent and cfg.search_static:
        # Sanitize opp_idx against the static partition (ADVICE r4): a
        # checkpoint resumed from a Bernoulli (--search-opponent only) run
        # may hold sentinel values on rows outside the static set — those
        # would one-hot-match no pool slot and degenerate to a first-legal
        # opponent.  Pin the static rows to the sentinel and clamp stray
        # sentinels to the CURRENT slot.  Idempotent (a no-op for states
        # produced under this partition), so it runs unconditionally.
        sent = opp_pool.pool_size + 1
        is_sent = _static_sentinel_rows(cfg, cfg.num_envs)
        ts = ts.replace(opp_idx=jnp.where(
            is_sent, sent, jnp.minimum(ts.opp_idx, opp_pool.pool_size)
        ).astype(jnp.int32))

    def body(carry, key):
        env_state, obs, mask, opp_idx, ring, wins, games = carry
        k_act, k_step, k_opp = jax.random.split(key, 3)
        logits, value = ac.forward(ts.params, obs)
        action, logp = ac.sample_action(k_act, logits, mask)
        policy = _opponent_policy(cfg, opp_pool, opp_idx)
        if use_ring:
            env_state, out, obs_next, mask_next, done, ring = (
                dual.dual_step_autoreset_ring(
                    env_state, action, policy, k_step, ring, cfg.rng_mode
                )
            )
        else:
            env_state, out, obs_next, mask_next, done = dual.dual_step_autoreset(
                env_state, action, policy, k_step, cfg.rng_mode
            )
        # Per-slot outcome stats for PFSP weighting (selfplay/pool.py) —
        # built only when pfsp actually consumes them (static branch; in
        # uniform mode the one-hot reductions would be dead weight in the
        # hot scan, and with heuristic opponents the credit would be
        # misattributed to pool slots).  Only the [P+1] stat vectors ride
        # the carry; the params stack stays a scan-invariant closure.
        pool_now = opp_pool.replace(wins=wins, games=games)
        if track_stats:
            pool_now = pool_lib.record_outcomes(
                pool_now, opp_idx, done, out.agent_reward > 0.5
            )
        # Fresh episodes sample a fresh opponent (ppo_splendor supplier
        # called on each reset via make_env -> wrapper.reset).
        new_idx = _sample_opponents(cfg, pool_now, k_opp, (cfg.num_envs,))
        opp_idx = jnp.where(done, new_idx, opp_idx)
        step_data = Rollout(
            obs=obs, mask=mask, action=action, logp=logp, value=value,
            reward=out.agent_reward, done=done,
        )
        return (
            env_state, obs_next, mask_next, opp_idx, ring,
            pool_now.wins, pool_now.games,
        ), step_data

    key, sub = jax.random.split(ts.key)
    k_scan, k_ring = jax.random.split(sub)
    ring = (
        # window >= num_envs makes the ring's fast window path PROVABLY
        # exact: at most num_envs lanes can finish per turn (env/ring.py;
        # make_ring itself clamps the window to the ring size).
        ring_lib.make_ring(
            k_ring, cfg.reset_ring_mult * cfg.num_envs, window=cfg.num_envs
        )
        if use_ring
        else jnp.zeros(())  # unused placeholder carry
    )
    (env_state, obs, mask, opp_idx, _, wins, games), traj = jax.lax.scan(
        body,
        (ts.env_state, ts.obs, ts.mask, ts.opp_idx, ring,
         opp_pool.wins, opp_pool.games),
        jax.random.split(k_scan, cfg.num_steps),
    )
    ts = ts.replace(
        env_state=env_state, obs=obs, mask=mask, opp_idx=opp_idx, key=key,
        pool=opp_pool.replace(wins=wins, games=games),
    )
    return ts, traj


def _gae(cfg: PPOConfig, traj: Rollout, last_value):
    """Reverse-scan GAE, identical to the reference numpy loop
    (ppo_splendor.py:299-314)."""

    def body(carry, xs):
        lastgaelam, next_value = carry
        reward, value, done = xs
        nextnonterminal = 1.0 - done.astype(jnp.float32)
        delta = reward + cfg.gamma * next_value * nextnonterminal - value
        lastgaelam = delta + cfg.gamma * cfg.gae_lambda * nextnonterminal * lastgaelam
        return (lastgaelam, value), lastgaelam

    (_, _), adv = jax.lax.scan(
        body,
        (jnp.zeros_like(last_value), last_value),
        (traj.reward, traj.value, traj.done),
        reverse=True,
    )
    return adv, adv + traj.value


def ppo_loss(cfg: PPOConfig, ent_coef_now, params, mo, mm, ma, mlp, mv, madv, mret):
    """The clipped PPO minibatch loss, exactly the reference's update math
    (ppo_splendor.py:336-351): ratio clip, value clip, entropy term (the
    reference's inverted-sign quirk behind cfg.reference_entropy_quirk), and
    the approx-KL diagnostic used for target-KL early stop.

    Module-level so tests can pin it against the reference's torch
    computation on identical params and batches
    (tests/test_ppo_loss_parity.py)."""
    logits, value = ac.forward(params, mo)
    new_logp, ent = ac.log_prob_entropy(logits, mm, ma)
    ratio = jnp.exp(new_logp - mlp)
    clip_adv = jnp.clip(ratio, 1 - cfg.clip_coef, 1 + cfg.clip_coef) * madv
    pg_loss = -jnp.minimum(ratio * madv, clip_adv).mean()
    v_clipped = mv + jnp.clip(value - mv, -cfg.vclip, cfg.vclip)
    v_loss = 0.5 * jnp.maximum(
        (value - mret) ** 2, (v_clipped - mret) ** 2
    ).mean()
    mean_ent = ent.mean()
    # Reference quirk: +coef*entropy (a penalty, ppo_splendor.py:350-351);
    # standard PPO subtracts the entropy bonus.
    ent_sign = 1.0 if cfg.reference_entropy_quirk else -1.0
    loss = pg_loss + cfg.vf_coef * v_loss + ent_coef_now * ent_sign * mean_ent
    approx_kl = (mlp - new_logp).mean()
    return loss, (pg_loss, v_loss, mean_ent, approx_kl)


def _ppo_epochs(cfg: PPOConfig, ts: TrainState, batch, lr, ent_coef_now):
    """update_epochs x minibatch loop with target-KL early stop."""
    optimizer = make_optimizer(cfg)
    b_obs, b_mask, b_action, b_logp, b_value, b_adv, b_returns = batch
    B = b_obs.shape[0]
    mb = min(cfg.minibatch_size, B)
    n_mb = B // mb

    grad_fn = jax.value_and_grad(partial(ppo_loss, cfg, ent_coef_now), has_aux=True)

    # Pack the 7 batch tensors into ONE f32 buffer so each minibatch is a
    # single row-gather instead of seven (measured 1.62x on the whole epoch
    # phase at the 4096-env config; same lesson as the engine's packed-row
    # gathers, docs/PERF.md).  Lossless: obs ints are 0..50, mask is 0/1,
    # action < 45 — all exact in f32; the rest already is f32.
    packed = jnp.concatenate(
        [
            b_obs.astype(jnp.float32),
            b_mask.astype(jnp.float32),
            b_action.astype(jnp.float32)[:, None],
            b_logp[:, None],
            b_value[:, None],
            b_adv[:, None],
            b_returns[:, None],
        ],
        axis=1,
    )
    n_obs, n_mask = b_obs.shape[1], b_mask.shape[1]

    def _unpack(rows):
        c0, c1 = n_obs, n_obs + n_mask
        return (
            rows[:, :c0],                      # obs (forward casts anyway)
            rows[:, c0:c1] > 0.5,              # mask
            rows[:, c1].astype(jnp.int32),     # action
            rows[:, c1 + 1],                   # logp
            rows[:, c1 + 2],                   # value
            rows[:, c1 + 3],                   # adv
            rows[:, c1 + 4],                   # returns
        )

    def mb_step(carry, idxs):
        params, opt_state, skip, metrics = carry
        args = _unpack(packed[idxs])
        (loss, aux), grads = grad_fn(params, *args)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        keep = skip  # skip==True -> no-op update (post-KL-break minibatches)
        params = jax.tree.map(lambda a, b: jnp.where(keep, a, b), params, new_params)
        opt_state = jax.tree.map(
            lambda a, b: jnp.where(keep, a, b), opt_state, new_opt_state
        )
        pg, vl, me, kl = aux
        metrics = jax.tree.map(
            lambda old, new: jnp.where(keep, old, new),
            metrics,
            {"pg_loss": pg, "v_loss": vl, "entropy": me, "approx_kl": kl,
             "loss": loss},
        )
        if cfg.target_kl > 0:
            skip = skip | (kl > cfg.target_kl)
        return (params, opt_state, skip, metrics), None

    def epoch_step(carry, key):
        params, opt_state, metrics = carry
        perm = jax.random.permutation(key, B)[: n_mb * mb].reshape(n_mb, mb)
        (params, opt_state, _, metrics), _ = jax.lax.scan(
            mb_step, (params, opt_state, jnp.asarray(False), metrics), perm
        )
        return (params, opt_state, metrics), None

    # Set the annealed LR (inject_hyperparams).
    opt_state = ts.opt_state
    opt_state.hyperparams["learning_rate"] = lr

    key, sub = jax.random.split(ts.key)
    metrics0 = {
        "pg_loss": jnp.float32(0), "v_loss": jnp.float32(0),
        "entropy": jnp.float32(0), "approx_kl": jnp.float32(0),
        "loss": jnp.float32(0),
    }
    (params, opt_state, metrics), _ = jax.lax.scan(
        epoch_step,
        (ts.params, opt_state, metrics0),
        jax.random.split(sub, cfg.update_epochs),
    )
    return ts.replace(params=params, opt_state=opt_state, key=key), metrics


@partial(jax.jit, static_argnames=("cfg",))
def update_step(cfg: PPOConfig, ts: TrainState):
    """One full PPO update: rollout + GAE + epochs + pool maintenance.
    Returns (new TrainState, metrics dict)."""
    lr, ent_coef_now = _anneal(cfg, ts.update_idx)

    ts, traj = _rollout(cfg, ts)
    last_value = ac.critic_value(ts.params, ts.obs)
    adv, returns = _gae(cfg, traj, last_value)

    flat = lambda x: x.reshape((-1,) + x.shape[2:])
    b_adv = flat(adv)
    b_adv = (b_adv - b_adv.mean()) / (b_adv.std() + 1e-8)
    batch = (
        flat(traj.obs), flat(traj.mask), flat(traj.action), flat(traj.logp),
        flat(traj.value), b_adv, flat(returns),
    )
    ts, metrics = _ppo_epochs(cfg, ts, batch, lr, ent_coef_now)

    # Snapshot pool maintenance (ppo_splendor.py:367-370).
    if cfg.self_play:
        do_snap = (ts.update_idx + 1) % max(1, cfg.snapshot_every_updates) == 0
        snapped = pool_lib.push_snapshot(ts.pool, ts.params)
        new_pool = jax.tree.map(
            lambda a, b: jnp.where(do_snap, a, b), snapped, ts.pool
        )
        ts = ts.replace(pool=new_pool)

    ep_done = traj.done.sum()
    ep_won = ((traj.reward > 0.5) & traj.done).sum()
    metrics = dict(
        metrics,
        lr=lr,
        ent_coef=ent_coef_now,
        episodes=ep_done,
        rollout_win_rate=ep_won / jnp.maximum(ep_done, 1),
        mean_reward=traj.reward.mean(),
    )
    ts = ts.replace(
        update_idx=ts.update_idx + 1,
        global_step=ts.global_step + cfg.num_envs * cfg.num_steps,
    )
    return ts, metrics
