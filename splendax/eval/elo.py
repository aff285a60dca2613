"""League evaluation: pool-snapshot round-robin with Bradley-Terry/Elo fit.

The working generalization of the reference's abandoned
`eval_vs_checkpoint_pool` intent (`scripts/eval_suite.py:211-253`, a stub
with placeholder locals): the training pool already holds up to 12 frozen
snapshots as a stacked params pytree (`splendax/selfplay/pool.py`); here
every filled snapshot (plus the CURRENT slot) plays every other one on
device, and ratings are fit by Bradley-Terry maximum likelihood
(minorization-maximization updates), reported on the Elo scale anchored at
mean 1000.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

ELO_SCALE = 400.0 / np.log(10.0)  # natural-log strength -> Elo points


def bradley_terry_elo(
    score: np.ndarray, games: np.ndarray, iters: int = 200
) -> np.ndarray:
    """Fit Elo ratings from a round-robin score table.

    `score[i, j]` = points player i took off player j (wins + 0.5*draws);
    `games[i, j]` = games between i and j (both symmetric-complementary:
    score[i,j] + score[j,i] == games[i,j] == games[j,i]).  Returns ratings
    with mean 1000.  Uses the classic MM update for Bradley-Terry strengths
    p_i: p_i <- W_i / sum_j games_ij / (p_i + p_j), which monotonically
    increases the likelihood (Hunter 2004).
    """
    n = score.shape[0]
    assert score.shape == (n, n) and games.shape == (n, n)
    wins = score.sum(axis=1)  # total points per player
    # Laplace smoothing keeps strengths finite for 100%/0% players.
    wins = wins + 0.5
    p = np.ones(n, dtype=np.float64)
    for _ in range(iters):
        denom = np.zeros(n, dtype=np.float64)
        for i in range(n):
            opp = games[i] > 0
            denom[i] = (games[i, opp] / (p[i] + p[opp])).sum()
            denom[i] += 1.0 / (p[i] + 1.0)  # smoothing vs a unit-strength ghost
        p = wins / denom
        p = p / np.exp(np.mean(np.log(p)))  # renormalize (gauge freedom)
    elo = ELO_SCALE * np.log(p)
    return elo - elo.mean() + 1000.0


def pool_round_robin(
    stack,
    n_entries: int,
    n_games: int = 100,
    seed: int = 0,
    labels: Optional[list] = None,
) -> Dict:
    """Round-robin between pool entries `0..n_entries-1` of a stacked params
    pytree.  Each ordered pair plays `n_games` with i as player 0 (both
    orders run, removing first-mover bias from the scores).  Returns
    {"elo": {label: rating}, "score": matrix, "games": matrix, "pairs": {...}}.
    """
    import jax

    from .suite import eval_vs_opponent, model_greedy_policy

    labels = labels or [f"snap{i}" for i in range(n_entries)]
    assert len(labels) == n_entries
    entry = lambda i: jax.tree.map(lambda x: x[i], stack)
    policies = [model_greedy_policy(entry(i)) for i in range(n_entries)]

    score = np.zeros((n_entries, n_entries))
    games = np.zeros((n_entries, n_entries))
    pairs = {}
    for i in range(n_entries):
        for j in range(n_entries):
            if i == j:
                continue
            res = eval_vs_opponent(
                policies[i], policies[j], n_games, seed + 1000 * i + j
            )
            score[i, j] += res["wins"] + 0.5 * res["draws"]
            score[j, i] += res["losses"] + 0.5 * res["draws"]
            games[i, j] += res["n"]
            games[j, i] += res["n"]
            pairs[f"{labels[i]}:{labels[j]}"] = res
    elo = bradley_terry_elo(score, games)
    order = np.argsort(-elo)
    return {
        "elo": {labels[i]: float(elo[i]) for i in order},
        "score": score.tolist(),
        "games": games.tolist(),
        "pairs": pairs,
    }


def load_pool_stack(checkpoint_path: str):
    """Load (stack, n_filled, labels) from an orbax TrainState checkpoint
    (train/checkpoint.py layout).  Includes the CURRENT slot (live params at
    save time) as the last entry, labeled 'current'."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        state = ckptr.restore(checkpoint_path)
    import jax

    pool = state["pool"]
    stack = pool["stack"]
    pool_size = jax.tree.leaves(stack)[0].shape[0] - 1
    filled = int(min(int(pool["n_snapshots"]), pool_size))
    keep = list(range(filled)) + [pool_size]  # snapshots + CURRENT
    sub = jax.tree.map(lambda x: x[np.asarray(keep)], stack)
    labels = [f"snap{i}" for i in range(filled)] + ["current"]
    return sub, filled + 1, labels
