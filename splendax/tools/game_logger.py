"""Human-readable game rendering, action decoding and logged verification games.

Capability parity with the reference `splendor_gym/scripts/game_logger.py`
(compact card/token formatting :57-96, action decoding :98-157, state
snapshots :159-220, per-round logs :231-288, `run_logged_game` :291-367, CLI
:370-398) — operating on the JAX `GameState` pulled back to host.  This is a
leaf module: the engine does not import it (the reference had an inverted
L2->L4 edge, splendor_env.py:20).
"""

from __future__ import annotations

import argparse
import os
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from ..utils.cache import setup_runtime

if __name__ == "__main__":
    # Pin platform + compile cache BEFORE the imports below create
    # device-resident constant tables (see utils/cache.py).
    setup_runtime()

from ..engine import data as D
from ..engine import rules as R
from ..engine.types import GameState

# w=white, b=blue, g=green, r=red, k=black, G=gold (reference game_logger.py:53)
COLOR_ABBREV = ["w", "b", "g", "r", "k", "G"]


def _fmt_card(card_id: int) -> str:
    """`g-1pt-2b3r3k` like the reference's _format_card_compact."""
    if card_id < 0:
        return "[empty]"
    color = COLOR_ABBREV[int(D.CARD_COLOR[card_id])]
    pts = int(D.CARD_POINTS[card_id])
    cost_parts = [
        f"{int(c)}{COLOR_ABBREV[i]}" for i, c in enumerate(D.CARD_COST[card_id]) if c > 0
    ]
    cost = "".join(cost_parts) if cost_parts else "free"
    return f"{color}-{pts}pt-{cost}"


def _fmt_vec(vec, n=6) -> str:
    parts = [f"{int(v)}{COLOR_ABBREV[i]}" for i, v in enumerate(vec[:n]) if v > 0]
    return "".join(parts) if parts else "none"


def decode_action(action: int, state: GameState) -> str:
    """Action number -> compact text (reference decode_action :98-157)."""
    bank = np.asarray(state.bank)
    if R.TAKE3_OFFSET <= action < R.TAKE3_OFFSET + R.TAKE3_COUNT:
        avail = [i for i in range(5) if bank[i] >= 1]
        if len(avail) >= 3:
            combo = D.TAKE3_COMBOS[action - R.TAKE3_OFFSET]
            return "Take3: " + "".join(COLOR_ABBREV[c] for c in combo)
        if len(avail) == 2:
            return "Take2: " + "".join(COLOR_ABBREV[c] for c in avail) + " (reduced)"
        if len(avail) == 1:
            return f"Take1: {COLOR_ABBREV[avail[0]]} (reduced)"
        return "Take0 (no tokens available)"
    if R.TAKE2_OFFSET <= action < R.TAKE2_OFFSET + R.TAKE2_COUNT:
        c = COLOR_ABBREV[action - R.TAKE2_OFFSET]
        return f"Take2: {c}{c}"
    if R.BUY_VISIBLE_OFFSET <= action < R.BUY_VISIBLE_OFFSET + R.BUY_VISIBLE_COUNT:
        off = action - R.BUY_VISIBLE_OFFSET
        tier, slot = off // 4, off % 4
        cid = int(np.asarray(state.board)[tier, slot])
        return f"Buy: T{tier+1}S{slot+1} {_fmt_card(cid)}"
    if R.RESERVE_VISIBLE_OFFSET <= action < R.RESERVE_VISIBLE_OFFSET + R.RESERVE_VISIBLE_COUNT:
        off = action - R.RESERVE_VISIBLE_OFFSET
        tier, slot = off // 4, off % 4
        cid = int(np.asarray(state.board)[tier, slot])
        return f"Reserve: T{tier+1}S{slot+1} {_fmt_card(cid)}"
    if R.RESERVE_BLIND_OFFSET <= action < R.RESERVE_BLIND_OFFSET + R.RESERVE_BLIND_COUNT:
        return f"Reserve: T{action - R.RESERVE_BLIND_OFFSET + 1} blind"
    if R.BUY_RESERVED_OFFSET <= action < R.BUY_RESERVED_OFFSET + R.BUY_RESERVED_COUNT:
        slot = action - R.BUY_RESERVED_OFFSET
        p = int(state.to_play)
        cid = int(np.asarray(state.reserved_ids)[p, slot])
        return f"BuyReserved: #{slot+1} {_fmt_card(cid)}"
    return f"Action{action}"


def format_game_state(state: GameState, player_perspective: int = -1) -> str:
    """Compact state snapshot (reference format_game_state :159-220)."""
    bank = np.asarray(state.bank)
    board = np.asarray(state.board)
    lines = []
    lines.append(
        f"=== Turn {int(state.turn_count)} | Move {int(state.move_count)}"
        f" | P{int(state.to_play)} to play ==="
    )
    lines.append(f"Bank: {_fmt_vec(bank)}")
    for t in range(3):
        cards = "  ".join(f"S{s+1}:{_fmt_card(int(board[t, s]))}" for s in range(4))
        lines.append(f"T{t+1} ({int(state.deck_count[t])} in deck): {cards}")
    nobles = [
        f"N{int(n)}:{_fmt_vec(D.NOBLE_REQ[int(n)], 5)}"
        for n in np.asarray(state.noble_ids)
        if n >= 0
    ]
    lines.append("Nobles: " + (", ".join(nobles) if nobles else "none"))
    for p in range(2):
        tok = _fmt_vec(np.asarray(state.tokens)[p])
        bon = _fmt_vec(np.asarray(state.bonuses)[p], 5)
        res = []
        for i in range(int(state.reserved_count[p])):
            cid = int(np.asarray(state.reserved_ids)[p, i])
            vis = "public" if int(np.asarray(state.reserved_revealed)[p, i]) else "hidden"
            res.append(f"{_fmt_card(cid)}({vis})")
        lines.append(
            f"P{p}: {int(state.prestige[p])}pts tokens[{tok}] bonuses[{bon}]"
            f" reserved[{', '.join(res) if res else 'none'}]"
        )
    if bool(state.game_over):
        w = int(state.winner)
        lines.append(f"GAME OVER: {'draw' if w < 0 else f'P{w} wins'}"
                     + (" (turn limit)" if bool(state.turn_limit_reached) else ""))
    return "\n".join(lines)


@dataclass
class GameLog:
    """One logged ply (reference GameLog dataclass, game_logger.py:36-45)."""

    step: int
    turn: int
    player: int
    action: str
    state_after: str
    reward: float = 0.0


@dataclass
class SplendorGameLogger:
    """Collects per-ply logs and prints them grouped into full rounds
    (reference SplendorGameLogger :48-288)."""

    logs: List[GameLog] = field(default_factory=list)

    def log_game_step(self, step: int, state_before: GameState, action: int,
                      state_after: GameState, reward: float = 0.0) -> None:
        self.logs.append(
            GameLog(
                step=step,
                turn=int(state_before.turn_count),
                player=int(state_before.to_play),
                action=decode_action(int(action), state_before),
                state_after=format_game_state(state_after),
                reward=float(reward),
            )
        )

    def print_game_log(self, verbose: bool = True) -> str:
        out = []
        cur_turn = None
        for log in self.logs:
            if log.turn != cur_turn:
                cur_turn = log.turn
                out.append(f"\n──── Round {log.turn} ────")
            out.append(f"[{log.step:3d}] P{log.player}: {log.action}"
                       + (f"  (r={log.reward:+.2f})" if log.reward else ""))
            if verbose:
                out.append(log.state_after)
        text = "\n".join(out)
        print(text)
        return text

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w", encoding="utf-8") as f:
            cur_turn = None
            for log in self.logs:
                if log.turn != cur_turn:
                    cur_turn = log.turn
                    f.write(f"\n──── Round {log.turn} ────\n")
                f.write(f"[{log.step:3d}] P{log.player}: {log.action}\n")
                f.write(log.state_after + "\n")


def _model_policy(npz_path: str):
    """Greedy masked-argmax policy from an exported params .npz (play
    against — or watch — a trained agent, e.g. the committed flagship)."""
    import jax.numpy as jnp

    from ..models import actor_critic as ac
    from ..train.checkpoint import import_params_npz

    params = import_params_npz(npz_path)

    def act(obs, mask):
        logits, _ = ac.forward(params, jnp.asarray(obs)[None, :])
        masked = ac.masked_logits(logits, jnp.asarray(mask, bool)[None, :])
        return int(jnp.argmax(masked[0]))

    return act


def _search_policy(npz_path: Optional[str], sims: int = 64):
    """PUCT tree-search policy (splendax/search/uct.py) wrapped for
    single-game host play — watch or face the search bot; `npz` nets are
    optional (heuristic priors/leaves without them)."""
    import jax
    import jax.numpy as jnp

    from ..search import uct_search_policy

    params = None
    if npz_path:
        from ..train.checkpoint import import_params_npz

        params = import_params_npz(npz_path)
    fn, ctx = uct_search_policy(sims, params=params)

    def act(obs, mask, state):
        b = jax.tree.map(lambda x: jnp.asarray(x)[None], state)
        a = fn(
            ctx,
            jnp.asarray(obs)[None],
            jnp.asarray(mask, bool)[None],
            b,
            jax.random.PRNGKey(0),
        )
        return int(a[0])

    return act


def run_logged_game(
    policy_type: str = "random",
    seed: int = 0,
    max_steps: int = 1000,
    save_path: Optional[str] = None,
    verbose: bool = False,
    npz: Optional[str] = None,
    opponent: Optional[str] = None,
    sims: int = 64,
):
    """Play one game with a scripted policy, logging every ply
    (reference run_logged_game :291-367).  Policies: random / first /
    interactive (stdin action index) / model (greedy net from `npz`) /
    search (PUCT over the nets — both beyond the reference, which has no
    model or search option here).  When `opponent` is given, it drives
    player 1 and `policy_type` drives player 0 (e.g. interactive vs the
    flagship, or model vs search)."""
    from ..env.gym_compat import SplendorEnv

    rng = np.random.RandomState(seed)
    env = SplendorEnv(num_players=2)
    logger = SplendorGameLogger()
    obs, info = env.reset(seed=seed)
    model_act = _model_policy(npz) if npz else None
    search_act = None
    if "search" in (policy_type, opponent):
        search_act = _search_policy(npz, sims)

    def choose(kind: str, obs, mask) -> int:
        legal = np.flatnonzero(mask)
        if legal.size == 0:
            return 0
        if kind == "random":
            return int(rng.choice(legal))
        if kind == "first":
            return int(legal[0])
        if kind == "model":
            if model_act is None:
                raise ValueError("policy 'model' needs --npz <params.npz>")
            return model_act(obs, mask)
        if kind == "search":
            return search_act(obs, mask, env.state)
        if kind == "interactive":
            print(format_game_state(env.state))
            print("legal:", [f"{x}:{decode_action(int(x), env.state)}" for x in legal])
            return int(input("action> "))
        raise ValueError(f"unknown policy {kind}")

    for step_i in range(max_steps):
        mask = info["action_mask"]
        mover = policy_type if (opponent is None or int(info["to_play"]) == 0) \
            else opponent
        a = choose(mover, obs, mask)
        before = env.state
        obs, r, term, trunc, info = env.step(a)
        logger.log_game_step(step_i, before, a, env.state, r)
        if term or trunc:
            break
    if verbose:
        logger.print_game_log(verbose=False)
    if save_path:
        logger.save(save_path)
    return env, logger


def main() -> None:
    ap = argparse.ArgumentParser(description="Play and log a verification game")
    ap.add_argument("--policy", default="random",
                    choices=["random", "first", "interactive", "model", "search"])
    ap.add_argument("--opponent", default=None,
                    choices=["random", "first", "model", "search"],
                    help="drive player 1 with a different policy "
                         "(e.g. --policy interactive --opponent search)")
    ap.add_argument("--npz", default=None,
                    help="params .npz for the 'model'/'search' policies "
                         "(e.g. runs/ppo_splendor_2b_h512/ppo_splendor_params.npz)")
    ap.add_argument("--sims", type=int, default=64,
                    help="tree simulations per move for the 'search' policy")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--save", default=None, help="write the log to this path")
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args()
    from ..utils.cache import setup_runtime

    setup_runtime()
    env, logger = run_logged_game(
        args.policy, args.seed, save_path=args.save, verbose=not args.quiet,
        npz=args.npz, opponent=args.opponent, sims=args.sims,
    )
    print(format_game_state(env.state))


if __name__ == "__main__":
    main()
