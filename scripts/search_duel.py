"""Search-vs-search seat-averaged duels: flat-MC vs Gumbel vs PUCT.

The measurement VERDICT r2 asked for ("make PUCT earn its keep or
right-size it"): pit two on-device search bots against each other with
`eval.suite.head_to_head` (both seat orders, draw-exact scoring) at a
comparable per-move playout budget, over the same trained nets.

Budgets: flat-MC r8 h4 spends 45*8 = 360 playouts/move; Gumbel m16 k6 h4
spends log2(16)*16*6 = 384 concentrated on the 16 Gumbel-sampled root
actions; PUCT s64 runs 64 sequential tree sims.

Usage:
  python scripts/search_duel.py --npz runs/.../params.npz \
      --a gumbel --b mc --games 100
  --a/--b take mc | gumbel | uct | greedy (raw net argmax policy) |
  cmc | cgumbel (information-set variants over determinized hidden info,
  splendax/search/ismc.py — the round-4 privileged-information ablation).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(name: str, args, params):
    from splendax.eval import suite
    from splendax.search import (
        censored_gumbel_policy,
        censored_mc_policy,
        gumbel_search_policy,
        mc_search_policy,
        uct_search_policy,
    )

    if name == "mc":
        return mc_search_policy(args.rollouts, args.horizon, params), \
            f"mc(r{args.rollouts},h{args.horizon})"
    if name == "cmc":
        # information-set flat MC: determinized hidden info (search/ismc.py)
        return censored_mc_policy(args.rollouts, args.horizon, params), \
            f"cmc(r{args.rollouts},h{args.horizon})"
    gf = getattr(args, "greedy_final", False)
    gtag = ",gf" if gf else ""
    if name == "gumbel":
        return gumbel_search_policy(
            m=args.gumbel_m, k0=args.gumbel_k0, horizon=args.horizon,
            params=params, c_scale=args.c_scale, greedy_final=gf,
        ), f"gumbel(m{args.gumbel_m},k{args.gumbel_k0},h{args.horizon}{gtag})"
    if name == "cgumbel":
        return censored_gumbel_policy(
            m=args.gumbel_m, k0=args.gumbel_k0, horizon=args.horizon,
            params=params, c_scale=args.c_scale, greedy_final=gf,
        ), f"cgumbel(m{args.gumbel_m},k{args.gumbel_k0},h{args.horizon}{gtag})"
    if name == "uct":
        return uct_search_policy(args.sims, params=params), f"uct(s{args.sims})"
    if name == "greedy":
        if params is None:
            raise SystemExit("bot 'greedy' needs --npz (it IS the net)")
        return suite.model_greedy_policy(params), "greedy"
    raise SystemExit(f"unknown bot {name!r}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--npz", default=None, help="trained params for BOTH bots")
    ap.add_argument("--a", default="gumbel")
    ap.add_argument("--b", default="mc")
    ap.add_argument("--games", type=int, default=100,
                    help="games per seat order (total = 2x)")
    ap.add_argument("--rollouts", type=int, default=8)
    ap.add_argument("--horizon", type=int, default=4)
    ap.add_argument("--gumbel-m", type=int, default=16)
    ap.add_argument("--gumbel-k0", type=int, default=6)
    ap.add_argument("--c-scale", type=float, default=10.0)
    ap.add_argument("--greedy-final", action="store_true",
                    help="gumbel/cgumbel: final argmax by q-hat alone "
                         "(exploitative eval-bot acting; the default keeps "
                         "the paper's g+logits+sigma(q) rule)")
    ap.add_argument("--sims", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    from splendax.utils.cache import setup_runtime

    setup_runtime()
    import jax  # noqa: F401  (platform pinned by setup_runtime)

    from splendax.eval import suite

    params = None
    if args.npz:
        from splendax.train.checkpoint import import_params_npz

        params = import_params_npz(args.npz)
    else:
        print("[duel] no --npz: heuristic leaves / uniform priors")

    a, tag_a = build(args.a, args, params)
    b, tag_b = build(args.b, args, params)
    res = suite.head_to_head(a, b, args.games, seed=args.seed)
    priv = res["privileged"]
    ptag = ("" if not any(priv.values())
            else " [privileged: " + ",".join(k for k, v in priv.items() if v) + "]")
    print(f"{tag_a} vs {tag_b}: score={res['score']:.3f}"
          f"±{res['score_ci95']:.3f} W/D/L={res['wins']}/{res['draws']}/"
          f"{res['losses']} seat wins {res['first_seat']['a_wins']}/"
          f"{res['second_seat']['a_wins']} of {args.games}" + ptag)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({f"{tag_a}_vs_{tag_b}": res}, f, indent=2)
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
