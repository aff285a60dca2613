"""Evaluation CLIs, one subcommand per reference script:

  vs-random        eval_vs_random.py:30-65  (stochastic policy vs random)
  vs-basic         eval_vs_basic.py:20-39   (greedy policy vs basic_priority)
  basic-vs-model   eval_basic_vs_model.py:36-43 (reverse fixture)
  bots             eval_bots.py:31-74       (pairwise bot round-robin)
  vs-noble         eval_vs_noble.py capability intent — the reference script
                   imports a module that does not exist (see docs/DEFECTS.md);
                   here the noble-rush heuristic is implemented and working
  vs-model         model-vs-model head-to-head (e.g. a splendax .npz agent
                   against the reference's trained .pt via --opp-torch-pt);
                   the working version of the reference's unfinished
                   eval_vs_checkpoint_pool stub (eval_suite.py:211-253)
  suite            training_utils.run_evaluation_suite:237-260
  pool-elo         round-robin the pool snapshots inside a training
                   checkpoint and fit Bradley-Terry/Elo ratings — the working
                   league-style generalization of the reference's stub
                   (eval_suite.py:211-253); see splendax/eval/elo.py
  vs-search        model (or --agent heuristic) vs an on-device search bot —
                   lookahead the reference's 6k steps/s engine could never
                   afford.  --algo mc (flat Monte-Carlo, splendax/search/mc.py,
                   sized by --rollouts/--horizon) or --algo uct (PUCT tree
                   search, splendax/search/uct.py, sized by --sims);
                   --search-npz plugs trained nets in as priors/leaf values

Checkpoints: --npz (splendax export) or --torch-pt (reference ActorCritic
state_dict).  Untrained random-init params are used if neither is given.

Usage: python -m splendax.eval.cli <subcommand> [--games N] ...
"""

from __future__ import annotations

import argparse
import json

import jax


def _load_params(args):
    from ..models.actor_critic import init_params

    if getattr(args, "npz", None):
        from ..train.checkpoint import import_params_npz

        return import_params_npz(args.npz)
    if getattr(args, "torch_pt", None):
        from ..train.checkpoint import load_torch_checkpoint

        return load_torch_checkpoint(args.torch_pt)
    print("[eval] no checkpoint given; using random-init params")
    return init_params(jax.random.PRNGKey(0))


def _priv_tag(res):
    """' [privileged: ...]' suffix when either side reads the full GameState
    (suite.is_privileged) — privileged and obs-only agents are different
    weight classes; never compare their scores without the flag."""
    p = res.get("privileged")
    if not p or not any(p.values()):
        return ""
    return " [privileged: " + ",".join(k for k, v in p.items() if v) + "]"


def _print(name, res):
    if "score" in res:  # seat-averaged head_to_head dict
        print(f"{name}: score={res['score']:.3f}±{res['score_ci95']:.3f} "
              f"W/D/L={res['wins']}/{res['draws']}/{res['losses']} "
              f"seat wins {res['first_seat']['a_wins']}/"
              f"{res['second_seat']['a_wins']} of {res['n'] // 2}"
              + _priv_tag(res))
        return
    print(f"{name}: wr={res['win_rate']:.3f}±{res['win_rate_ci95']:.3f} "
          f"W/D/L={res['wins']}/{res['draws']}/{res['losses']} "
          f"avg_turns={res['avg_turns']:.2f} avg_prestige={res['avg_prestige']:.2f} "
          f"illegal={res['illegal_action_rate']:.4f}" + _priv_tag(res))


def main(argv=None) -> None:
    from ..utils.cache import setup_runtime

    setup_runtime()
    from . import suite
    from .noble import noble_policy

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("command", choices=[
        "vs-random", "vs-basic", "basic-vs-model", "bots", "vs-noble",
        "vs-model", "suite", "pool-elo", "vs-search"
    ])
    ap.add_argument("--checkpoint", default=None,
                    help="pool-elo: orbax TrainState checkpoint dir "
                         "(e.g. <log_dir>/ppo_splendor_latest)")
    ap.add_argument("--algo", default="mc",
                    choices=["mc", "uct", "gumbel", "cmc", "cgumbel"],
                    help="vs-search: flat Monte-Carlo, PUCT tree search, or "
                         "Gumbel sequential-halving root search; cmc/cgumbel "
                         "are the censored (information-set) variants over "
                         "determinized hidden info (search/ismc.py)")
    ap.add_argument("--sims", type=int, default=64,
                    help="vs-search --algo uct: tree simulations per move")
    ap.add_argument("--gumbel-m", type=int, default=16,
                    help="vs-search --algo gumbel: root candidates "
                         "(power of two)")
    ap.add_argument("--gumbel-k0", type=int, default=6,
                    help="vs-search --algo gumbel: round-0 playouts per "
                         "candidate (total budget = log2(m)*m*k0)")
    ap.add_argument("--greedy-final", action="store_true",
                    help="gumbel/cgumbel: final argmax by q-hat alone "
                         "(exploitative acting; default = paper rule)")
    ap.add_argument("--rollouts", type=int, default=8,
                    help="vs-search: playouts per root action")
    ap.add_argument("--horizon", type=int, default=24,
                    help="vs-search: random-playout depth in plies")
    ap.add_argument("--search-npz", default=None,
                    help="vs-search: critic .npz for leaf evaluation "
                         "(default: prestige-lead heuristic)")
    ap.add_argument("--agent", default=None,
                    help="vs-search: heuristic agent name instead of a model "
                         "(random/greedy_v1/basic/greedy_v2/noble)")
    ap.add_argument("--games", type=int, default=400)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--npz", default=None, help="splendax params .npz")
    ap.add_argument("--torch-pt", default=None, help="reference ActorCritic .pt")
    ap.add_argument("--opp-npz", default=None,
                    help="vs-model opponent: splendax params .npz")
    ap.add_argument("--opp-torch-pt", default=None,
                    help="vs-model opponent: reference ActorCritic .pt")
    ap.add_argument("--stochastic", action="store_true",
                    help="sample instead of greedy argmax (vs-random default)")
    ap.add_argument("--both-seats", action="store_true",
                    help="vs-model / vs-search / vs-basic: play --games per "
                         "seat order and report the seat-averaged score "
                         "(suite.head_to_head) — first-mover advantage is "
                         "large, so strength claims need this")
    ap.add_argument("--pairs", nargs="*", default=["basic:greedy_v1"],
                    help="bot pairs left:right for `bots`")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args(argv)

    results = {}
    if args.command == "bots":
        pairs = [tuple(p.split(":")) for p in args.pairs]
        results = suite.bot_round_robin(pairs, args.games, args.seed)
    elif args.command == "pool-elo":
        from .elo import load_pool_stack, pool_round_robin

        if not args.checkpoint:
            ap.error("pool-elo requires --checkpoint <TrainState dir>")
        stack, n, labels = load_pool_stack(args.checkpoint)
        league = pool_round_robin(stack, n, args.games, args.seed, labels)
        print(f"pool league ({n} entries, {args.games} games/ordered pair):")
        for name, rating in league["elo"].items():
            print(f"  {name:>10s}  Elo {rating:7.1f}")
        if args.json_out:
            with open(args.json_out, "w") as f:
                json.dump(league, f, indent=2)
            print(f"wrote {args.json_out}")
        return
    else:
        params = _load_params(args)
        model = (suite.model_sampling_policy(params)
                 if args.stochastic else suite.model_greedy_policy(params))
        matchup = (suite.head_to_head if args.both_seats
                   else suite.eval_vs_opponent)
        if args.command == "vs-random":
            results["model_vs_random"] = suite.eval_vs_opponent(
                model, suite.heuristic_policy("random"), args.games, args.seed)
        elif args.command == "vs-basic":
            results["model_vs_basic"] = matchup(
                model, suite.heuristic_policy("basic"), args.games, args.seed)
        elif args.command == "basic-vs-model":
            results["basic_vs_model"] = suite.eval_vs_opponent(
                suite.heuristic_policy("basic"), model, args.games, args.seed)
        elif args.command == "vs-noble":
            results["model_vs_noble"] = suite.eval_vs_opponent(
                model, (noble_policy, None), args.games, args.seed)
        elif args.command == "vs-model":
            opp_args = argparse.Namespace(
                npz=args.opp_npz, torch_pt=args.opp_torch_pt
            )
            opp = suite.model_greedy_policy(_load_params(opp_args))
            results["model_vs_model"] = matchup(
                model, opp, args.games, args.seed)
        elif args.command == "vs-search":
            from ..search import mc_search_policy, uct_search_policy

            leaf = None
            if args.search_npz:
                from ..train.checkpoint import import_params_npz

                leaf = import_params_npz(args.search_npz)
            if args.algo == "uct":
                search = uct_search_policy(args.sims, params=leaf)
                tag = f"uct(s{args.sims})"
            elif args.algo == "gumbel":
                from ..search import gumbel_search_policy

                search = gumbel_search_policy(
                    m=args.gumbel_m, k0=args.gumbel_k0,
                    horizon=args.horizon, params=leaf,
                    greedy_final=args.greedy_final,
                )
                tag = f"gumbel(m{args.gumbel_m},k{args.gumbel_k0},h{args.horizon})"
            elif args.algo == "cgumbel":
                from ..search import censored_gumbel_policy

                search = censored_gumbel_policy(
                    m=args.gumbel_m, k0=args.gumbel_k0,
                    horizon=args.horizon, params=leaf,
                    greedy_final=args.greedy_final,
                )
                tag = f"cgumbel(m{args.gumbel_m},k{args.gumbel_k0},h{args.horizon})"
            elif args.algo == "cmc":
                from ..search import censored_mc_policy

                search = censored_mc_policy(args.rollouts, args.horizon, leaf)
                tag = f"cmc(r{args.rollouts},h{args.horizon})"
            else:
                search = mc_search_policy(args.rollouts, args.horizon, leaf)
                tag = f"mc(r{args.rollouts},h{args.horizon})"
            agent = suite.heuristic_policy(args.agent) if args.agent else model
            name = (args.agent or "model")
            results[f"{name}_vs_{tag}"] = matchup(
                agent, search, args.games, args.seed
            )
        elif args.command == "suite":
            results = suite.run_evaluation_suite(params, args.games, args.seed)

    for name, res in results.items():
        _print(name, res)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
