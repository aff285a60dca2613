"""Search distillation: one AlphaZero-style policy-improvement iteration.

The reference has no search and no way to improve a trained policy beyond
more PPO (`/root/reference/ppo_splendor.py` is its whole training surface;
its strongest bots are one-ply obs heuristics, `scripts/eval_suite.py:10-141`).
splendax's engine throughput makes the flat-MC search (`splendax/search/mc.py`)
a practical policy-improvement operator — it beats the flagship's own greedy
policy 99%/97% by seat (docs/PERF.md).  This module runs the AlphaZero-style
improvement loop over it, fully on device, behind a seat-averaged acceptance
gate.  Measured outcome (docs/PERF.md "Search distillation"): the loop is a
well-characterized NEGATIVE — eleven gated candidates across six configs
(h512 and h768 flagships) all score ~0.50 vs their incumbent, and the r4
`--censored` re-run with the information-set teacher (search/ismc.py) is a
wash too (gate 0.522, final eval 0.491) — so the bottleneck is imitation
(the prior-preserving target barely moves the policy where the search
disagrees), NOT the teacher's privileged information, which r4's ablation
refuted as the cause.  The machinery (generation, targets, gate) is the
deliverable:

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

_NEG = -jnp.inf


# --------------------------------------------------------------------------
# Phase 1: self-play data generation under the search policy.
# --------------------------------------------------------------------------

@partial(
    jax.jit,
    static_argnames=(
        "n_games", "rollouts", "horizon", "max_plies", "rng_mode", "guided",
        "sample_plies", "c_scale", "censored",
    ),
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
    sample_plies: int = 0,
    c_scale: float = 10.0,
    censored: bool = False,
):
    # `censored` swaps the teacher for the information-set search
    # (search/ismc.py): its root Q-values are a function of the mover's
    # information set only — the round-4 test of whether the distill
    # negative was caused by the privileged teacher (VERDICT r3 item 1).
    if censored:
        from ..search.ismc import censored_mc_q

        q_fn = censored_mc_q(
            rollouts=rollouts, horizon=horizon, rng_mode=rng_mode,
            guided=guided,
        )
    else:
        q_fn = mc_search_q(
            rollouts=rollouts, horizon=horizon, rng_mode=rng_mode,
            guided=guided,
        )
    B = n_games
    k_reset, k_run = jax.random.split(key)
    state, obs, mask = jax.vmap(core.reset)(jax.random.split(k_reset, B))
    active = jnp.ones(B, bool)

    def body(carry, xs):
        k, ply = xs
        state, obs, mask, active = carry
        q = q_fn(params, obs, mask, state, k)  # [B, 45], illegal -> -inf
        a = jnp.argmax(q, axis=-1).astype(jnp.int32)
        logits = ac.actor_logits(params, obs)  # root prior for the target
        if sample_plies > 0:
            # Opening diversity (AlphaZero's temperature-1 opening moves):
            # for the first `sample_plies` plies the PLAYED action is sampled
            # from the improved policy softmax(logits + c*q) — the same
            # distribution the CE target distills — so early-game data covers
            # more than the one deterministic argmax line per deck, and the
            # realized-outcome value target stays on-policy for the target
            # policy.  The RECORDED `action` stays the search argmax.
            k_sample = jax.random.fold_in(k, 7)
            scores = jnp.where(mask, logits + c_scale * jnp.where(mask, q, 0.0), _NEG)
            a_sampled = jax.random.categorical(k_sample, scores).astype(jnp.int32)
            a_play = jnp.where(ply < sample_plies, a_sampled, a)
        else:
            a_play = a
        # Record BEFORE stepping: obs is already the mover's POV encode.
        rec = (obs, mask, q, logits, a, state.to_play, active & mask.any(-1))

        nxt, _ = jax.vmap(
            lambda s, aa, mm: core.step_core(s, aa, rng_mode=rng_mode, mask=mm)
        )(state, a_play, mask)

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
        body,
        (state, obs, mask, active),
        (jax.random.split(k_run, max_plies),
         jnp.arange(max_plies, dtype=jnp.int32)),
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
    sample_plies: int = 0,
    c_scale: float = 10.0,
    gen_batch: int = 0,
    drop_dead: bool = False,
    verbose: bool = False,
    censored: bool = False,
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, float]]:
    """Self-play `n_games` with search on both seats; returns the flattened
    (obs, mask, action, z, weight) dataset and generation stats.

    Plies past a game's end carry weight 0, as do games still unfinished at
    `max_plies` (their outcome target would be undefined).

    `gen_batch` > 0 generates in chunks of that many games under ONE jitted
    program shape (the search materializes B*45*rollouts lane states — at
    B=1024/r=16 that is ~740k GameState rows, the HBM ceiling for one shot;
    chunking is how `n_games` scales past it).  `drop_dead` filters weight-0
    rows (past-end padding, unfinished games) on the host — the fit only
    needs live samples and the padding is ~35% of rows."""
    chunk = gen_batch if gen_batch > 0 else n_games
    flats, n_samples, games_finished, turns_sum = [], 0.0, 0.0, 0.0
    for i, start in enumerate(range(0, n_games, chunk)):
        b = min(chunk, n_games - start)
        data, stats = _generate(
            params, jax.random.fold_in(key, i), b, rollouts, horizon,
            max_plies, rng_mode, guided, sample_plies, c_scale, censored,
        )
        flat = {
            k: np.asarray(v).reshape((-1,) + v.shape[2:])
            for k, v in data.items()
        }
        if drop_dead:
            keep = flat["weight"] > 0
            flat = {k: v[keep] for k, v in flat.items()}
        flats.append(flat)
        n_samples += float(np.asarray(stats["n_samples"]))
        games_finished += float(np.asarray(stats["games_finished"]))
        turns_sum += float(np.asarray(stats["avg_turns"])) * float(
            np.asarray(stats["games_finished"])
        )
        if verbose:
            print(f"  chunk {i}: {b} games, "
                  f"{float(np.asarray(stats['n_samples'])):.0f} samples")
    flat = {k: np.concatenate([f[k] for f in flats]) for k in flats[0]}
    return flat, {
        "n_samples": n_samples,
        "games_finished": games_finished,
        "avg_turns": turns_sum / max(1.0, games_finished),
    }


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


def _make_tx(lr: float):
    """The one distillation optimizer — used for BOTH `tx.init` (distill_fit)
    and the jitted `tx.update` (_distill_epoch); a single constructor keeps
    the two sites from drifting into a silent hyperparameter mismatch."""
    return optax.chain(optax.clip_by_global_norm(0.5), optax.adam(lr, eps=1e-5))


@partial(jax.jit, static_argnames=("minibatch", "value_coef", "lr"))
def _distill_epoch(params, opt_state, data, perm, minibatch: int, value_coef: float, lr: float):
    tx = _make_tx(lr)
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
    if n == 0 or float(np.asarray(data["weight"]).sum()) == 0.0:
        raise ValueError(
            "distill_fit: dataset has no usable samples (weight.sum() == 0) — "
            "no game finished within max_plies; fitting would write an "
            "unchanged checkpoint labeled 'distilled'"
        )
    minibatch = min(minibatch, n)
    dev = {
        "obs": jnp.asarray(data["obs"], jnp.float32),
        "mask": jnp.asarray(data["mask"], bool),
        "tgt": jnp.asarray(build_targets(data, target, c_scale, tau)),
        "action": jnp.asarray(data["action"], jnp.int32),
        "z": jnp.asarray(data["z"], jnp.float32),
        "weight": jnp.asarray(data["weight"], jnp.float32),
    }
    opt_state = _make_tx(lr).init(params)
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

def gate_passes(h2h: dict, gate_min: float) -> bool:
    """Promotion gate: score >= gate_min AND the gate's own CI excludes 0.50.

    The r4 censored-teacher run promoted on 0.522 ± 0.024 over --gate-min
    0.52 — a threshold inside the gate CI is decoration, and the promoted
    candidate's independent 800-game final eval read 0.491 (VERDICT r4
    weak-spot 2).  Requiring score - ci > 0.5 makes a pass mean "better than
    the incumbent at 95%" regardless of where gate_min sits; with paired
    mirrored deals (eval/suite.py head_to_head) a candidate identical to the
    incumbent scores exactly 0.500 ± 0 and can never pass."""
    return (h2h["score"] >= gate_min) and (
        h2h["score"] - h2h["score_ci95"] > 0.5
    )


def main(argv=None):
    from ..utils.cache import setup_runtime

    setup_runtime()
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--npz", required=True, help="params npz to improve")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--games", type=int, default=1024,
                   help="self-play games generated per iteration")
    p.add_argument("--gen-batch", type=int, default=1024,
                   help="games per jitted generation chunk (HBM bound)")
    p.add_argument("--rollouts", type=int, default=8)
    p.add_argument("--horizon", type=int, default=4)
    p.add_argument("--max-plies", type=int, default=120)
    p.add_argument("--sample-plies", type=int, default=0,
                   help="plies per game whose PLAYED action samples the "
                        "improved policy instead of argmax (opening "
                        "diversity; AlphaZero's temperature moves)")
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--fit-samples", type=int, default=0,
                   help="if >0, subsample the dataset to exactly this many "
                        "rows (keeps _distill_epoch's shapes identical "
                        "across iterations -> one compile through the "
                        "tunnel instead of one per iteration)")
    p.add_argument("--minibatch", type=int, default=4096)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--value-coef", type=float, default=0.5)
    p.add_argument("--target", choices=("gumbel", "soft", "hard"), default="gumbel")
    p.add_argument("--c-scale", type=float, default=10.0,
                   help="Q-to-logit scale for the gumbel target")
    p.add_argument("--tau", type=float, default=0.2,
                   help="temperature for the soft target")
    p.add_argument("--censored", action="store_true",
                   help="use the information-set teacher (search/ismc.py): "
                        "search Q-values over determinized hidden info — "
                        "targets are a function of the mover's information "
                        "set, so an obs-only student can in principle match "
                        "them (the round-4 privileged-teacher ablation)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--iters", type=int, default=1,
                   help="generate->fit->gate iterations (AlphaZero loop)")
    p.add_argument("--gate-games", type=int, default=0,
                   help="if >0, seat-averaged head-to-head games (per order) "
                        "of each candidate vs the incumbent; the candidate "
                        "is promoted only if score >= --gate-min AND the "
                        "gate CI excludes 0.50 (gate_passes)")
    p.add_argument("--gate-min", type=float, default=0.55,
                   help="min seat-averaged score to promote a candidate")
    p.add_argument("--eval-games", type=int, default=0,
                   help="if >0, final seat-averaged eval of the result vs "
                        "the original net and vs basic_priority")
    p.add_argument("--save-data", default=None,
                   help="npz path to dump the generated dataset (iter 0)")
    p.add_argument("--load-data", default=None,
                   help="npz dataset to fit on instead of generating "
                        "(controlled fit-hyperparameter ablations; iters=1)")
    args = p.parse_args(argv)

    from ..eval import suite
    from .checkpoint import export_params_npz, import_params_npz

    params0 = import_params_npz(args.npz)
    key = jax.random.PRNGKey(args.seed)
    os.makedirs(args.out, exist_ok=True)

    config = {k: getattr(args, k.replace("-", "_")) for k in
              ("games", "gen_batch", "rollouts", "horizon", "max_plies",
               "sample_plies", "epochs", "minibatch", "lr", "value_coef",
               "target", "c_scale", "tau", "seed", "iters", "gate_games",
               "gate_min", "censored")}

    def dump(results):
        # Incremental: a tunnel stall mid-iteration must not lose the gate
        # history of the iterations already measured.
        with open(os.path.join(args.out, "results.json"), "w") as f:
            json.dump(results, f, indent=2)

    incumbent = params0
    iterations = []
    for it in range(args.iters):
        rec = {"iter": it}
        if args.load_data and it == 0:
            loaded = np.load(args.load_data)
            data = {k: loaded[k] for k in loaded.files if k != "_stats"}
            stats = json.loads(str(loaded["_stats"]))
            print(f"loaded dataset {args.load_data}: {json.dumps(stats)}")
        else:
            teacher = "censored-mc" if args.censored else "mc"
            print(f"[iter {it}] generating {args.games} {teacher} self-play "
                  f"games (r{args.rollouts} h{args.horizon}, <= "
                  f"{args.max_plies} plies, sample first {args.sample_plies}) "
                  "...")
            data, stats = generate_search_games(
                incumbent, jax.random.fold_in(key, it), args.games,
                rollouts=args.rollouts, horizon=args.horizon,
                max_plies=args.max_plies, sample_plies=args.sample_plies,
                c_scale=args.c_scale, gen_batch=args.gen_batch,
                drop_dead=True, verbose=True, censored=args.censored,
            )
            print(f"[iter {it}] dataset: {json.dumps(stats)}")
            if args.save_data and it == 0:
                np.savez_compressed(
                    args.save_data, _stats=json.dumps(stats), **data)
                print(f"saved dataset to {args.save_data}")
        rec["generation"] = stats
        n_rows = data["obs"].shape[0]
        if 0 < args.fit_samples < n_rows:
            sub = np.random.default_rng(args.seed + it).choice(
                n_rows, args.fit_samples, replace=False)
            data = {k: v[sub] for k, v in data.items()}
            print(f"[iter {it}] subsampled {n_rows} -> {args.fit_samples} rows")
        elif args.fit_samples > n_rows:
            print(f"[iter {it}] WARNING: only {n_rows} rows "
                  f"(< --fit-samples {args.fit_samples}); epoch program "
                  f"shape will differ this iteration")

        candidate, history = distill_fit(
            incumbent, data, epochs=args.epochs, minibatch=args.minibatch,
            lr=args.lr, value_coef=args.value_coef, seed=args.seed + it,
            verbose=True, target=args.target, c_scale=args.c_scale,
            tau=args.tau,
        )
        rec["fit_history"] = history

        if args.gate_games > 0:
            h2h = suite.head_to_head(
                suite.model_greedy_policy(candidate),
                suite.model_greedy_policy(incumbent),
                args.gate_games, seed=args.seed + 100 * (it + 1),
            )
            promoted = gate_passes(h2h, args.gate_min)
            rec["gate"] = h2h
            print(f"[iter {it}] gate: candidate vs incumbent "
                  f"score={h2h['score']:.3f}±{h2h['score_ci95']:.3f} "
                  f"(seat wins {h2h['first_seat']['a_wins']}/"
                  f"{h2h['second_seat']['a_wins']} of {args.gate_games}) -> "
                  f"{'PROMOTED' if promoted else 'rejected'}")
        else:
            promoted = True
        rec["promoted"] = bool(promoted)
        if promoted:
            incumbent = candidate
        iterations.append(rec)
        dump({"iterations": iterations, "source_npz": args.npz,
              "accepted": sum(r["promoted"] for r in iterations),
              "config": config, "partial": True})

    new_params = incumbent
    out_npz = os.path.join(args.out, "distilled_params.npz")
    export_params_npz(new_params, out_npz)
    results = {"iterations": iterations, "source_npz": args.npz,
               "accepted": sum(r["promoted"] for r in iterations),
               "config": config}

    if args.eval_games > 0:
        print(f"final eval over {args.eval_games} games/order ...")
        results["distilled_vs_original"] = suite.head_to_head(
            suite.model_greedy_policy(new_params),
            suite.model_greedy_policy(params0),
            args.eval_games, seed=args.seed + 10_000,
        )
        # seed spacing: +20_000 keeps this matchup's PRNG stream disjoint
        # from distilled_vs_original's (+10_000) so the two reported CIs
        # are independent (both orders of one matchup now share one seed —
        # paired mirrored deals).
        results["distilled_vs_basic"] = suite.head_to_head(
            suite.model_greedy_policy(new_params),
            suite.heuristic_policy("basic"),
            args.eval_games, seed=args.seed + 20_000,
        )
        for k in ("distilled_vs_original", "distilled_vs_basic"):
            r = results[k]
            print(f"{k}: score={r['score']:.3f}±{r['score_ci95']:.3f} "
                  f"(seat wins {r['first_seat']['a_wins']}/"
                  f"{r['second_seat']['a_wins']} of {args.eval_games})")

    dump(results)
    print(f"wrote {out_npz} ({results['accepted']}/{args.iters} promoted)")


if __name__ == "__main__":
    main()
