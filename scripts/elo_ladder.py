"""All-agents Elo ladder: one round-robin over the committed roster.

The unification VERDICT r4 item 8 asked for: the repo's ~30 scattered
pairwise tables become ONE auditable Bradley-Terry ranking — the completed
form of the reference's abandoned `eval_vs_checkpoint_pool` intent
(`/root/reference/splendor_gym/scripts/eval_suite.py:211-253`, a stub with
placeholder locals).  Every pair plays a seat-averaged, paired-mirrored-deal
`head_to_head` (eval/suite.py); ratings come from the same Bradley-Terry MM
fit that serves `pool-elo` (eval/elo.py), anchored at mean 1000.

Privileged agents (search bots that read the full GameState: deck order,
blind reserves) are flagged in the output and EXCLUDED from the default
roster; `--include-search` adds both the privileged searches and the
censored (information-set, obs-fair) searches as a second phase.  Obs-only
and privileged rows are different weight classes — the JSON carries a
`privileged` map so no one compares them blind.

Incremental: results are checkpointed to --out after every pair, and pairs
already present are skipped on relaunch (tunnel-wedge insurance — see
CLAUDE.md).  On CPU, caches are cleared periodically to dodge the LLVM ORC
code-region exhaustion documented in docs/DEFECTS.md.

Usage:
  JAX_PLATFORMS=cpu python scripts/elo_ladder.py --games 100   # nets+bots
  python scripts/elo_ladder.py --include-search --games 50     # TPU phase
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "runs")

# (label, kind, spec) — kind: heuristic | npz | torch | search.
# Search specs: (algo, npz_label_of_params, kwargs).
NET = lambda run: os.path.join(RUNS, run, "ppo_splendor_params.npz")
ROSTER = [
    ("random", "heuristic", "random"),
    ("greedy_v1", "heuristic", "greedy_v1"),
    ("basic", "heuristic", "basic"),
    ("noble", "heuristic", "noble"),
    ("reference_ckpt", "torch",
     "/root/reference/runs/ppo_splendor/ppo_splendor_latest.pt"),
    ("ppo_100m", "npz", NET("ppo_splendor_100m")),
    ("ppo_1b", "npz", NET("ppo_splendor_1b")),
    ("ppo_2b_h256", "npz", NET("ppo_splendor_2b")),
    ("ppo_2b_h512", "npz", NET("ppo_splendor_2b_h512")),
    ("ppo_2b_h768", "npz", NET("ppo_splendor_2b_h768")),
    ("ppo_2b_h1024", "npz", NET("ppo_splendor_2b_h1024")),
    ("ppo_500m_uniform", "npz", NET("ppo_splendor_500m_uniform")),
    ("ppo_500m_pfsp", "npz", NET("ppo_splendor_500m_pfsp")),
    # NOTE: the original "ppo_500m_league" row (Elo 1003 in the committed
    # ladder) was measured from an s42 static-slot run that was never
    # committed; its pairs remain in runs/elo_ladder.json as historical
    # evidence.  The committed replacements below are the s43 replicate
    # (h2h-identical to the s42 league arms, 0.499 ± 0.033 —
    # docs/PERF.md "De-risking controls") and the s42 Bernoulli arm.
    ("ppo_500m_league_bern", "npz", NET("ppo_splendor_500m_search")),
    ("ppo_500m_league_s43", "npz", NET("ppo_splendor_500m_search_static_s43")),
]
# Added to ROSTER when it exists (r5 runs).
OPTIONAL_NETS = [
    ("ppo_2b_h768_league", "npz", NET("ppo_splendor_2b_h768_league")),
    ("ppo_500m_league_cens_s43", "npz",
     NET("ppo_splendor_500m_search_censored_s43")),
    ("ppo_1750m_wallmatch", "npz",
     NET("ppo_splendor_1750m_uniform_wallmatch")),
]
# Search bots over the h768 flagship net — r4's canonical duel sizes
# (scripts/search_duel.py).  gumbel_gf/mc are privileged (x-ray the true
# state); cmc/cgumbel_gf are the information-set (obs-fair) variants.
SEARCH_ROSTER = [
    ("gumbel_gf_h768", "search", ("gumbel", "ppo_2b_h768",
                                  dict(m=16, k0=6, horizon=4,
                                       greedy_final=True))),
    ("mc_h768", "search", ("mc", "ppo_2b_h768", dict(rollouts=8, horizon=4))),
    ("cmc_h768", "search", ("cmc", "ppo_2b_h768",
                            dict(rollouts=8, horizon=4))),
    ("cgumbel_gf_h768", "search", ("cgumbel", "ppo_2b_h768",
                                   dict(m=16, k0=6, horizon=4,
                                        greedy_final=True))),
]


def build_policy(label, kind, spec, nets):
    from splendax.eval import suite

    if kind == "heuristic":
        return suite.heuristic_policy(spec)
    if kind == "npz":
        return suite.model_greedy_policy(nets[label])
    if kind == "torch":
        from splendax.train.checkpoint import load_torch_checkpoint

        return suite.model_greedy_policy(load_torch_checkpoint(spec))
    if kind == "search":
        algo, net_label, kw = spec
        params = nets[net_label]
        if algo == "gumbel":
            from splendax.search import gumbel_search_policy

            return gumbel_search_policy(
                m=kw["m"], k0=kw["k0"], horizon=kw["horizon"], params=params,
                greedy_final=kw["greedy_final"])
        if algo == "cgumbel":
            from splendax.search import censored_gumbel_policy

            return censored_gumbel_policy(
                m=kw["m"], k0=kw["k0"], horizon=kw["horizon"], params=params,
                greedy_final=kw["greedy_final"])
        if algo == "mc":
            from splendax.search import mc_search_policy

            return mc_search_policy(kw["rollouts"], kw["horizon"], params)
        if algo == "cmc":
            from splendax.search import censored_mc_policy

            return censored_mc_policy(kw["rollouts"], kw["horizon"], params)
    raise SystemExit(f"unknown roster entry kind {kind!r}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--games", type=int, default=100,
                    help="games per seat order per pair (total 2x)")
    ap.add_argument("--search-games", type=int, default=None,
                    help="per-order games for pairs involving a search bot "
                         "(default: --games; lower these — search moves are "
                         "~100x a net move)")
    ap.add_argument("--include-search", action="store_true",
                    help="add the search/censored-search rows (expensive)")
    ap.add_argument("--search-core", default="ppo_2b_h768,basic",
                    help="comma-list: search bots only play these roster "
                         "members (plus each other) — a search move is "
                         "~100x a net move, so the full round-robin is "
                         "priced out; BT handles the missing pairs")
    ap.add_argument("--only-new", action="store_true", default=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=os.path.join(RUNS, "elo_ladder.json"))
    args = ap.parse_args()

    from splendax.utils.cache import setup_runtime

    setup_runtime()
    import jax

    from splendax.eval import suite
    from splendax.eval.elo import bradley_terry_elo
    from splendax.train.checkpoint import import_params_npz

    roster = list(ROSTER)
    for entry in OPTIONAL_NETS:
        if os.path.exists(entry[2]):
            roster.append(entry)
    if args.include_search:
        roster += SEARCH_ROSTER

    nets = {label: import_params_npz(spec)
            for label, kind, spec in roster if kind == "npz"}
    policies = {label: build_policy(label, kind, spec, nets)
                for label, kind, spec in roster}
    labels = [label for label, _, _ in roster]
    privileged = {label: suite.is_privileged(pol)
                  for label, pol in policies.items()}
    is_search = {label: kind == "search" for label, kind, _ in roster}

    prior = {}
    prior_privileged = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            pj = json.load(f)
        prior = pj.get("pairs", {})
        prior_privileged = pj.get("privileged", {})
        print(f"[ladder] resuming: {len(prior)} pairs already done")

    core = set(args.search_core.split(","))
    pairs = dict(prior)  # never drop previously-measured pairs
    # Labels present only in prior pairs (e.g. search rows from an
    # --include-search phase, or retired roster entries) stay in the BT
    # fit: their measured games are evidence regardless of whether this
    # invocation replays them.  Privilege flags carry over from the prior
    # JSON (current-roster flags win on conflict).
    extra_labels = sorted({l for k in prior for l in k.split(":")}
                          - set(labels))
    dump_labels = labels + extra_labels
    privileged = {**prior_privileged, **privileged}
    # Privilege flags for labels no longer constructible this invocation
    # (search rows when not --include-search; retired roster entries).
    known = {"gumbel_gf_h768": True, "mc_h768": True,
             "cmc_h768": False, "cgumbel_gf_h768": False,  # information-set
             "ppo_500m_league": False}  # obs-only net (uncommitted s42 run)
    for l in extra_labels:
        privileged.setdefault(l, known.get(l, True))  # else assume worst
    n = len(labels)
    todo = []
    for i in range(n):
        for j in range(i + 1, n):
            si, sj = is_search[labels[i]], is_search[labels[j]]
            if (si or sj) and not (si and sj):
                # search-vs-nonsearch: only against the core subset
                other = labels[i] if sj else labels[j]
                if other not in core:
                    continue
            todo.append((i, j))
    done = 0
    for i, j in todo:
        key = f"{labels[i]}:{labels[j]}"
        if key in prior:
            pairs[key] = prior[key]
            continue
        g = args.games
        if is_search[labels[i]] or is_search[labels[j]]:
            g = args.search_games or args.games
        res = suite.head_to_head(
            policies[labels[i]], policies[labels[j]], g,
            seed=args.seed + 1000 * i + j)
        pairs[key] = res
        done += 1
        print(f"[{len(pairs)}/{len(todo)}] {key}: "
              f"{res['score']:.3f}±{res['score_ci95']:.3f}", flush=True)
        _dump(args.out, dump_labels, privileged, pairs, partial=True)
        if done % 12 == 0 and jax.default_backend() == "cpu":
            jax.clear_caches()  # LLVM ORC code-region budget (DEFECTS.md)

    _dump(args.out, dump_labels, privileged, pairs, partial=False,
          bt=bradley_terry_elo)
    print(f"wrote {args.out}")


def _dump(out, labels, privileged, pairs, partial, bt=None):
    import numpy as np

    payload = {"labels": labels, "privileged": privileged, "pairs": pairs,
               "partial": partial}
    if bt is not None or not partial:
        from splendax.eval.elo import bradley_terry_elo as bt_fit

        n = len(labels)
        idx = {l: i for i, l in enumerate(labels)}
        score = np.zeros((n, n))
        games = np.zeros((n, n))
        for key, res in pairs.items():
            a, b = key.split(":")
            if a not in idx or b not in idx:
                continue
            i, j = idx[a], idx[b]
            pts = res["wins"] + 0.5 * res["draws"]
            score[i, j] += pts
            score[j, i] += res["n"] - pts
            games[i, j] += res["n"]
            games[j, i] += res["n"]
        played = games.sum(1) > 0
        sub = np.ix_(played, played)
        elo = bt_fit(score[sub], games[sub])
        rated = [l for l, p in zip(labels, played) if p]
        order = np.argsort(-elo)
        payload["elo"] = {rated[i]: float(elo[i]) for i in order}
        if not partial:
            payload["score"] = score.tolist()
            payload["games"] = games.tolist()
    tmp = out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1)
    os.replace(tmp, out)


if __name__ == "__main__":
    main()
