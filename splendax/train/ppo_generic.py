"""Vanilla CleanRL-style PPO for generic Gymnasium envs (JAX).

Capability parity with the reference `ppo_cleanRL.py` (312 LoC, torch): the
same algorithm, hyperparameters, and diagnostics — orthogonal-init actor /
critic MLPs (:94-126), vectorized rollout storage (:170-176), GAE (:217-231),
clipped PPO with value clip, entropy bonus, grad clip, approx-KL/clipfrac/
explained-variance diagnostics and optional target-KL early stop (:241-297),
SPS print (:308-309) — but the policy/update are jitted JAX and the host only
loops the (generic, python) envs.

Works on any Discrete-action Box-observation env: CartPole-v1 by default,
and equally on "Splendax-v0" (though the masked on-device trainer in
`splendax.train.train` is the right tool for Splendor).

Run: python -m splendax.train.ppo_generic --env-id CartPole-v1
"""

from __future__ import annotations

import argparse
import time
from functools import partial

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="CleanRL-style PPO (JAX)")
    # Reference Args dataclass defaults (ppo_cleanRL.py:17-78).
    p.add_argument("--env-id", type=str, default="CartPole-v1")
    p.add_argument("--total-timesteps", type=int, default=500_000)
    p.add_argument("--learning-rate", type=float, default=2.5e-4)
    p.add_argument("--num-envs", type=int, default=4)
    p.add_argument("--num-steps", type=int, default=128)
    p.add_argument("--anneal-lr", action="store_true", default=True)
    p.add_argument("--no-anneal-lr", dest="anneal_lr", action="store_false")
    p.add_argument("--gamma", type=float, default=0.99)
    p.add_argument("--gae-lambda", type=float, default=0.95)
    p.add_argument("--num-minibatches", type=int, default=4)
    p.add_argument("--update-epochs", type=int, default=4)
    p.add_argument("--clip-coef", type=float, default=0.2)
    p.add_argument("--ent-coef", type=float, default=0.01)
    p.add_argument("--vf-coef", type=float, default=0.5)
    p.add_argument("--max-grad-norm", type=float, default=0.5)
    p.add_argument("--target-kl", type=float, default=None)
    p.add_argument("--norm-adv", action="store_true", default=True)
    p.add_argument("--clip-vloss", action="store_true", default=True)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--hidden", type=int, default=64)
    return p.parse_args(argv)


def init_agent(key, obs_dim, act_dim, hidden):
    """Orthogonal init, sqrt(2) hidden gain, 0.01 policy head, 1.0 value head
    (reference layer_init, ppo_cleanRL.py:94-97)."""
    import jax
    import jax.numpy as jnp

    def layer(key, fan_in, fan_out, std):
        w = jax.nn.initializers.orthogonal(std)(key, (fan_in, fan_out), jnp.float32)
        return {"w": w, "b": jnp.zeros(fan_out, jnp.float32)}

    ks = jax.random.split(key, 6)
    return {
        "critic": [layer(ks[0], obs_dim, hidden, np.sqrt(2)),
                   layer(ks[1], hidden, hidden, np.sqrt(2)),
                   layer(ks[2], hidden, 1, 1.0)],
        "actor": [layer(ks[3], obs_dim, hidden, np.sqrt(2)),
                  layer(ks[4], hidden, hidden, np.sqrt(2)),
                  layer(ks[5], hidden, act_dim, 0.01)],
    }


def _mlp(layers, x):
    import jax.numpy as jnp

    for lyr in layers[:-1]:
        x = jnp.tanh(x @ lyr["w"] + lyr["b"])
    return x @ layers[-1]["w"] + layers[-1]["b"]


def main(argv=None):
    args = parse_args(argv)
    from ..utils.cache import setup_runtime

    setup_runtime()

    import gymnasium as gym
    import jax
    import jax.numpy as jnp
    import optax

    def thunk():
        env = gym.make(args.env_id)
        env = gym.wrappers.RecordEpisodeStatistics(env)
        return env

    envs = gym.vector.SyncVectorEnv([thunk for _ in range(args.num_envs)])
    obs_dim = int(np.prod(envs.single_observation_space.shape))
    act_dim = int(envs.single_action_space.n)

    key = jax.random.PRNGKey(args.seed)
    key, k_init = jax.random.split(key)
    params = init_agent(k_init, obs_dim, act_dim, args.hidden)
    tx = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.clip_by_global_norm(args.max_grad_norm),
            optax.adam(learning_rate, eps=1e-5),
        )
    )(learning_rate=args.learning_rate)
    opt_state = tx.init(params)

    @jax.jit
    def policy_step(params, obs, key):
        logits = _mlp(params["actor"], obs)
        action = jax.random.categorical(key, logits)
        logp = jax.nn.log_softmax(logits)
        lp = jnp.take_along_axis(logp, action[:, None], axis=1)[:, 0]
        value = _mlp(params["critic"], obs)[:, 0]
        return action.astype(jnp.int32), lp, value

    @jax.jit
    def value_of(params, obs):
        return _mlp(params["critic"], obs)[:, 0]

    @partial(jax.jit, static_argnames=())
    def gae(rewards, values, dones, last_value, last_done):
        def body(carry, xs):
            lastgaelam, next_value, next_nonterminal = carry
            reward, value, done = xs
            delta = reward + args.gamma * next_value * next_nonterminal - value
            lastgaelam = delta + args.gamma * args.gae_lambda * next_nonterminal * lastgaelam
            return (lastgaelam, value, 1.0 - done), lastgaelam

        (_, _, _), adv = jax.lax.scan(
            body,
            (jnp.zeros_like(last_value), last_value, 1.0 - last_done),
            (rewards, values, dones),
            reverse=True,
        )
        return adv, adv + values

    def loss_fn(params, mb_obs, mb_act, mb_logp, mb_adv, mb_ret, mb_val):
        logits = _mlp(params["actor"], mb_obs)
        logp = jax.nn.log_softmax(logits)
        new_logp = jnp.take_along_axis(logp, mb_act[:, None], axis=1)[:, 0]
        entropy = -jnp.sum(jnp.exp(logp) * logp, axis=1)
        logratio = new_logp - mb_logp
        ratio = jnp.exp(logratio)
        if args.norm_adv:
            mb_adv = (mb_adv - mb_adv.mean()) / (mb_adv.std() + 1e-8)
        pg1 = -mb_adv * ratio
        pg2 = -mb_adv * jnp.clip(ratio, 1 - args.clip_coef, 1 + args.clip_coef)
        pg_loss = jnp.maximum(pg1, pg2).mean()
        value = _mlp(params["critic"], mb_obs)[:, 0]
        if args.clip_vloss:
            v_clip = mb_val + jnp.clip(value - mb_val, -args.clip_coef, args.clip_coef)
            v_loss = 0.5 * jnp.maximum((value - mb_ret) ** 2, (v_clip - mb_ret) ** 2).mean()
        else:
            v_loss = 0.5 * ((value - mb_ret) ** 2).mean()
        ent = entropy.mean()
        loss = pg_loss - args.ent_coef * ent + args.vf_coef * v_loss
        approx_kl = ((ratio - 1) - logratio).mean()
        clipfrac = (jnp.abs(ratio - 1.0) > args.clip_coef).mean()
        return loss, (pg_loss, v_loss, ent, approx_kl, clipfrac)

    @jax.jit
    def update_minibatch(params, opt_state, lr, batch):
        opt_state.hyperparams["learning_rate"] = lr
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, *batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    batch_size = args.num_envs * args.num_steps
    mb_size = batch_size // args.num_minibatches
    num_updates = args.total_timesteps // batch_size
    obs, _ = envs.reset(seed=args.seed)
    done = np.zeros(args.num_envs, np.float32)
    global_step, t0 = 0, time.time()
    returns_window = []

    for update in range(1, num_updates + 1):
        lr = (args.learning_rate * (1.0 - (update - 1.0) / num_updates)
              if args.anneal_lr else args.learning_rate)
        b_obs = np.zeros((args.num_steps, args.num_envs, obs_dim), np.float32)
        b_act = np.zeros((args.num_steps, args.num_envs), np.int32)
        b_logp = np.zeros((args.num_steps, args.num_envs), np.float32)
        b_rew = np.zeros((args.num_steps, args.num_envs), np.float32)
        b_done = np.zeros((args.num_steps, args.num_envs), np.float32)
        b_val = np.zeros((args.num_steps, args.num_envs), np.float32)

        for step in range(args.num_steps):
            global_step += args.num_envs
            key, k = jax.random.split(key)
            a, lp, v = policy_step(params, jnp.asarray(obs, jnp.float32), k)
            a = np.asarray(a)
            b_obs[step], b_act[step], b_logp[step] = obs, a, np.asarray(lp)
            b_val[step], b_done[step] = np.asarray(v), done
            obs, r, term, trunc, infos = envs.step(a)
            done = np.logical_or(term, trunc).astype(np.float32)
            b_rew[step] = r
            if "episode" in infos:
                fin = infos.get("_episode", infos["episode"].get("_r"))
                for i in np.flatnonzero(fin):
                    returns_window.append(float(infos["episode"]["r"][i]))

        last_value = value_of(params, jnp.asarray(obs, jnp.float32))
        adv, ret = gae(jnp.asarray(b_rew), jnp.asarray(b_val), jnp.asarray(b_done),
                       last_value, jnp.asarray(done))
        flat = lambda x: np.asarray(x).reshape(batch_size, *np.asarray(x).shape[2:])
        fo, fa, fl, fad, fre, fv = map(flat, (b_obs, b_act, b_logp, adv, ret, b_val))

        rng = np.random.RandomState(args.seed + update)
        stop = False
        for _ in range(args.update_epochs):
            perm = rng.permutation(batch_size)
            for start in range(0, batch_size, mb_size):
                idx = perm[start:start + mb_size]
                batch = tuple(jnp.asarray(x[idx]) for x in (fo, fa, fl, fad, fre, fv))
                params, opt_state, loss, aux = update_minibatch(
                    params, opt_state, jnp.float32(lr), batch)
                if args.target_kl is not None and float(aux[3]) > args.target_kl:
                    stop = True
                    break
            if stop:
                break

        pg_loss, v_loss, ent, approx_kl, clipfrac = (float(x) for x in aux)
        y_pred, y_true = fv, np.asarray(ret).reshape(-1)
        var_y = np.var(y_true)
        explained_var = np.nan if var_y == 0 else 1 - np.var(y_true - y_pred) / var_y
        sps = int(global_step / (time.time() - t0))
        avg_ret = np.mean(returns_window[-20:]) if returns_window else float("nan")
        print(f"update={update}/{num_updates} SPS={sps} return~{avg_ret:.1f} "
              f"pg={pg_loss:.4f} v={v_loss:.4f} ent={ent:.3f} kl={approx_kl:.4f} "
              f"clipfrac={clipfrac:.3f} ev={explained_var:.3f}")

    envs.close()
    return params, returns_window


if __name__ == "__main__":
    main()
