"""Search distillation: one AlphaZero-style policy-improvement iteration.

The reference has no search and no way to improve a trained policy beyond
more PPO (`/root/reference/ppo_splendor.py` is its whole training surface;
its strongest bots are one-ply obs heuristics, `scripts/eval_suite.py:10-141`).
splendax's engine throughput makes the flat-MC search (`splendax/search/mc.py`)
a practical policy-improvement operator — it beats the flagship's own greedy
policy 99%/97% by seat (docs/PERF.md).  This module closes the improvement
loop, fully on device:

1. **Generate**: self-play games where BOTH seats play the search-improved
   policy over the current net (actor-guided playouts, critic leaves, exact
   terminal values), recording every ply's (obs, mask, root Q-values, root
   actor logits, search_action) and the realized final outcome from the
   mover's POV.
2. **Distill**: supervised fine-tune of the same net — cross-entropy of the
   masked actor toward a policy-improvement target built from the search's
   root Q-values, MSE of the critic toward the realized outcome.

Target construction matters (measured, docs/PERF.md "Search distillation"):
distilling the search's raw **argmax** is catastrophic — flat-MC Q estimates
from K=8 playouts carry ~0.2 standard error, so near-tie roots resolve to an
effectively random strong action; cloning that noise flattened the flagship
to a 0.045 win-rate against its own pre-distillation self.  The default
target is therefore the Gumbel-MuZero-style improved policy
``softmax(actor_logits + c * q)`` over legal actions (Danihelka et al. 2022's
completed-Q transform at the root): the net's own prior is kept and nudged by
the measured action values, so search noise perturbs rather than replaces the
policy.  `--target {gumbel,soft,hard}` selects the transform.

Both phases are single jitted programs: generation is one `lax.scan` over
plies whose body runs the full B×45×K-playout search plus one engine step
(the same program shape the `vs-search` eval compiles), and each fine-tune
epoch is one `lax.scan` over minibatches.

CLI:  python -m splendax.train.distill --npz <params.npz> --out <dir>
"""

from __future__ import annotations

import argparse
import json
import os
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..engine import rules as R
from ..engine.encode import encode_observation
from ..env import core
from ..models import actor_critic as ac
from ..search.mc import mc_search_q


# --------------------------------------------------------------------------
# Phase 1: self-play data generation under the search policy.
# --------------------------------------------------------------------------

@partial(
    jax.jit,
    static_argnames=("n_games", "rollouts", "horizon", "max_plies", "rng_mode", "guided"),
)
def _generate(
    params,
    key,
    n_games: int,
    rollouts: int,
    horizon: int,
    max_plies: int,
    rng_mode: str,
    guided: bool,
):
    q_fn = mc_search_q(
        rollouts=rollouts, horizon=horizon, rng_mode=rng_mode, guided=guided
    )
    B = n_games
    k_reset, k_run = jax.random.split(key)
    state, obs, mask = jax.vmap(core.reset)(jax.random.split(k_reset, B))
    active = jnp.ones(B, bool)

    def body(carry, k):
        state, obs, mask, active = carry
        q = q_fn(params, obs, mask, state, k)  # [B, 45], illegal -> -inf
        a = jnp.argmax(q, axis=-1).astype(jnp.int32)
        logits = ac.actor_logits(params, obs)  # root prior for the target
        # Record BEFORE stepping: obs is already the mover's POV encode.
        rec = (obs, mask, q, logits, a, state.to_play, active & mask.any(-1))

        nxt, _ = jax.vmap(
            lambda s, aa, mm: core.step_core(s, aa, rng_mode=rng_mode, mask=mm)
        )(state, a, mask)

        def keep(new, old):
            d = active.reshape((B,) + (1,) * (old.ndim - 1))
            return jnp.where(d, new, old)

        state = jax.tree.map(keep, nxt, state)
        obs = keep(jax.vmap(encode_observation)(state), obs)
        mask = keep(jax.vmap(R.legal_mask)(state), mask)
        active = active & ~jax.vmap(R.is_terminal)(state)
        return (state, obs, mask, active), rec

    (state, _, _, active), (
        obs_t, mask_t, q_t, logits_t, act_t, mover_t, live_t
    ) = jax.lax.scan(
        body, (state, obs, mask, active), jax.random.split(k_run, max_plies)
    )

    # Outcome targets: the realized final reward from the mover's POV
    # (win +1 / loss -1 / draw 0 / turn-limit -0.1, core.final_rewards_of).
    fr = jax.vmap(core.final_rewards_of)(state)  # [B, 2]
    finished = jax.vmap(R.is_terminal)(state)
    z = jnp.where(mover_t == 0, fr[None, :, 0], fr[None, :, 1])
    weight = (live_t & finished[None, :]).astype(jnp.float32)

    data = {
        "obs": obs_t,          # [P, B, 297] int32, mover POV
        "mask": mask_t,        # [P, B, 45] bool
        "q": q_t,              # [P, B, 45] f32 root search values (-inf illegal)
        "logits": logits_t,    # [P, B, 45] f32 root actor prior (unmasked)
        "action": act_t,       # [P, B] int32 search argmax
        "z": z,                # [P, B] f32 realized outcome, mover POV
        "weight": weight,      # [P, B] f32 1.0 for usable samples
    }
    stats = {
        "n_samples": weight.sum(),
        "games_finished": finished.sum(),
        "avg_turns": jnp.where(finished, state.turn_count, 0).sum()
        / jnp.maximum(1, finished.sum()),
    }
    return data, stats


def generate_search_games(
    params,
    key,
    n_games: int,
    rollouts: int = 8,
    horizon: int = 4,
    max_plies: int = 120,
    rng_mode: str = "fast",
    guided: bool = True,
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, float]]:
    """Self-play `n_games` with search on both seats; returns the flattened
    (obs, mask, action, z, weight) dataset and generation stats.

    Plies past a game's end carry weight 0, as do games still unfinished at
    `max_plies` (their outcome target would be undefined)."""
    data, stats = _generate(
        params, key, n_games, rollouts, horizon, max_plies, rng_mode, guided
    )
    flat = {k: np.asarray(v).reshape((-1,) + v.shape[2:]) for k, v in data.items()}
    return flat, {k: float(np.asarray(v)) for k, v in stats.items()}


# --------------------------------------------------------------------------
# Phase 2: supervised fine-tune toward the search targets.
# --------------------------------------------------------------------------

def build_targets(
    data: Dict[str, np.ndarray],
    target: str = "gumbel",
    c_scale: float = 10.0,
    tau: float = 0.2,
) -> np.ndarray:
    """Per-sample target distribution [N, 45] over legal actions.

    - ``gumbel`` (default): softmax(actor_logits + c_scale * q) — the
      Gumbel-MuZero root policy-improvement transform; prior-preserving.
    - ``soft``: softmax(q / tau) — search-only, prior-free.
    - ``hard``: one-hot of the search argmax (the measured-catastrophic
      baseline, kept for ablation).
    """
    mask = np.asarray(data["mask"], bool)
    if target == "hard":
        t = np.zeros(mask.shape, np.float32)
        t[np.arange(mask.shape[0]), data["action"]] = 1.0
        return t
    # q is -inf on illegal actions; zero it there (mask re-kills those slots
    # below) so c_scale * q can't produce 0 * -inf = NaN.
    q = np.where(mask, np.asarray(data["q"], np.float32), 0.0)
    if target == "gumbel":
        scores = np.asarray(data["logits"], np.float32) + c_scale * q
    elif target == "soft":
        scores = q / tau
    else:
        raise ValueError(f"unknown target mode {target!r}")
    scores = np.where(mask, scores, -1e9)
    scores -= scores.max(-1, keepdims=True)
    e = np.exp(scores)
    return (e / np.maximum(e.sum(-1, keepdims=True), 1e-9)).astype(np.float32)


def _distill_loss(params, value_coef, obs, mask, tgt, action, z, weight):
    logits, value = ac.forward(params, obs)
    logp = jax.nn.log_softmax(ac.masked_logits(logits, mask))
    denom = jnp.maximum(1.0, weight.sum())
    ce = -(weight * (tgt * logp).sum(-1)).sum() / denom
    v_loss = (weight * (value - z) ** 2).sum() / denom
    agree = (weight * (ac.greedy_action(logits, mask) == action)).sum() / denom
    return ce + value_coef * v_loss, (ce, v_loss, agree)


@partial(jax.jit, static_argnames=("minibatch", "value_coef", "lr"))
def _distill_epoch(params, opt_state, data, perm, minibatch: int, value_coef: float, lr: float):
    tx = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(lr, eps=1e-5))
    n_mb = perm.shape[0] // minibatch
    idxs = perm[: n_mb * minibatch].reshape(n_mb, minibatch)

    def mb_step(carry, mb_idx):
        params, opt_state = carry
        batch = {k: v[mb_idx] for k, v in data.items()}
        (loss, aux), grads = jax.value_and_grad(_distill_loss, has_aux=True)(
            params, value_coef, batch["obs"], batch["mask"], batch["tgt"],
            batch["action"], batch["z"], batch["weight"],
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), (loss,) + aux

    (params, opt_state), metrics = jax.lax.scan(mb_step, (params, opt_state), idxs)
    return params, opt_state, {
        "loss": metrics[0].mean(), "ce": metrics[1].mean(),
        "v_loss": metrics[2].mean(), "agreement": metrics[3].mean(),
    }


def distill_fit(
    params,
    data: Dict[str, np.ndarray],
    epochs: int = 3,
    minibatch: int = 4096,
    lr: float = 1e-4,
    value_coef: float = 0.5,
    seed: int = 0,
    verbose: bool = False,
    target: str = "gumbel",
    c_scale: float = 10.0,
    tau: float = 0.2,
):
    """Fine-tune `params` on a generated search dataset.  Returns the new
    params and the per-epoch metric history (ce / v_loss / agreement are
    weighted means over the minibatches actually seen).  `agreement` is
    always vs the search argmax, whatever the target transform."""
    n = data["obs"].shape[0]
    minibatch = min(minibatch, n)
    dev = {
        "obs": jnp.asarray(data["obs"], jnp.float32),
        "mask": jnp.asarray(data["mask"], bool),
        "tgt": jnp.asarray(build_targets(data, target, c_scale, tau)),
        "action": jnp.asarray(data["action"], jnp.int32),
        "z": jnp.asarray(data["z"], jnp.float32),
        "weight": jnp.asarray(data["weight"], jnp.float32),
    }
    tx = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(lr, eps=1e-5))
    opt_state = tx.init(params)
    history = []
    rng = np.random.default_rng(seed)
    for e in range(epochs):
        perm = jnp.asarray(rng.permutation(n), jnp.int32)
        params, opt_state, m = _distill_epoch(
            params, opt_state, dev, perm, minibatch, value_coef, lr
        )
        m = {k: float(v) for k, v in m.items()}
        history.append(m)
        if verbose:
            print(f"epoch {e}: {json.dumps(m)}")
    return params, history


# --------------------------------------------------------------------------
# CLI
# --------------------------------------------------------------------------

def main(argv=None):
    from ..utils.cache import setup_runtime

    setup_runtime()
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--npz", required=True, help="params npz to improve")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--games", type=int, default=1024)
    p.add_argument("--rollouts", type=int, default=8)
    p.add_argument("--horizon", type=int, default=4)
    p.add_argument("--max-plies", type=int, default=120)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--minibatch", type=int, default=4096)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--value-coef", type=float, default=0.5)
    p.add_argument("--target", choices=("gumbel", "soft", "hard"), default="gumbel")
    p.add_argument("--c-scale", type=float, default=10.0,
                   help="Q-to-logit scale for the gumbel target")
    p.add_argument("--tau", type=float, default=0.2,
                   help="temperature for the soft target")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval-games", type=int, default=0,
                   help="if >0, eval distilled vs original + vs basic")
    p.add_argument("--save-data", default=None,
                   help="npz path to dump the generated dataset")
    p.add_argument("--load-data", default=None,
                   help="npz dataset to fit on instead of generating "
                        "(controlled fit-hyperparameter ablations)")
    args = p.parse_args(argv)

    from .checkpoint import export_params_npz, import_params_npz

    params = import_params_npz(args.npz)
    key = jax.random.PRNGKey(args.seed)
    k_gen, _ = jax.random.split(key)

    if args.load_data:
        loaded = np.load(args.load_data)
        data = {k: loaded[k] for k in loaded.files if k != "_stats"}
        stats = json.loads(str(loaded["_stats"]))
        print(f"loaded dataset {args.load_data}: {json.dumps(stats)}")
    else:
        print(f"generating {args.games} search self-play games "
              f"(r{args.rollouts} h{args.horizon}, <= {args.max_plies} plies) ...")
        data, stats = generate_search_games(
            params, k_gen, args.games,
            rollouts=args.rollouts, horizon=args.horizon, max_plies=args.max_plies,
        )
        print(f"dataset: {json.dumps(stats)}")
        if args.save_data:
            np.savez_compressed(args.save_data, _stats=json.dumps(stats), **data)
            print(f"saved dataset to {args.save_data}")

    new_params, history = distill_fit(
        params, data, epochs=args.epochs, minibatch=args.minibatch,
        lr=args.lr, value_coef=args.value_coef, seed=args.seed, verbose=True,
        target=args.target, c_scale=args.c_scale, tau=args.tau,
    )

    os.makedirs(args.out, exist_ok=True)
    out_npz = os.path.join(args.out, "distilled_params.npz")
    export_params_npz(new_params, out_npz)
    results = {"generation": stats, "fit_history": history, "source_npz": args.npz,
               "config": {k: getattr(args, k.replace("-", "_")) for k in
                          ("games", "rollouts", "horizon", "max_plies", "epochs",
                           "minibatch", "lr", "value_coef", "target", "c_scale",
                           "tau", "seed")}}

    if args.eval_games > 0:
        from ..eval import suite

        print(f"evaluating over {args.eval_games} games ...")
        results["distilled_vs_original"] = suite.eval_vs_opponent(
            suite.model_greedy_policy(new_params),
            suite.model_greedy_policy(params), args.eval_games, seed=args.seed,
        )
        results["original_vs_distilled"] = suite.eval_vs_opponent(
            suite.model_greedy_policy(params),
            suite.model_greedy_policy(new_params), args.eval_games,
            seed=args.seed + 1,
        )
        results["distilled_vs_basic"] = suite.eval_vs_opponent(
            suite.model_greedy_policy(new_params),
            suite.heuristic_policy("basic"), args.eval_games, seed=args.seed + 2,
        )
        for k in ("distilled_vs_original", "original_vs_distilled", "distilled_vs_basic"):
            print(f"{k}: win_rate={results[k]['win_rate']:.3f} "
                  f"+-{results[k]['win_rate_ci95']:.3f}")

    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out_npz}")


if __name__ == "__main__":
    main()
