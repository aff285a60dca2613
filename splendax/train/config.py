"""Training configuration.

Field-for-field parity with the reference CLI (~28 argparse flags,
`ppo_splendor.py:68-100`), plus TPU-native extras (rng_mode, mesh shape,
on-device batch scaling).  Defaults are the reference defaults.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass


@dataclass(frozen=True)  # hashable: PPOConfig is a static jit argument
class PPOConfig:
    # Reference flags (ppo_splendor.py:69-99)
    total_timesteps: int = 1_000_000
    num_envs: int = 16
    num_steps: int = 128
    gamma: float = 0.999
    gae_lambda: float = 0.95
    lr: float = 2.5e-4
    ent_coef: float = 0.03
    vf_coef: float = 0.5
    clip_coef: float = 0.2
    update_epochs: int = 4
    minibatch_size: int = 256
    save_path: str = "runs/ppo_splendor"
    seed: int = 42
    track: bool = False
    log_dir: str = "runs/ppo_splendor"
    eval_every_updates: int = 10
    eval_games: int = 400
    lr_anneal: bool = False
    train_opponent: str = "basic"  # random | greedy_v1 | basic (static-opponent mode)
    self_play: bool = True
    pool_size: int = 12
    snapshot_every_updates: int = 10
    p_current: float = 0.25
    target_kl: float = 0.02
    vclip: float = 0.2
    ent_coef_final: float = 0.01

    # TPU-native extras
    # MLP hidden width.  256 = the reference architecture
    # (ppo_splendor.py:41-59); wider nets are a beyond-parity option (the
    # checkpoint/pool/eval stack is shape-generic).
    hidden: int = 256
    rng_mode: str = "fast"  # engine token-return RNG: fast | parity
    # The reference adds an entropy PENALTY due to a sign quirk
    # (ppo_splendor.py:350-351: loss += ent_coef * entropy).  Default here is
    # the standard entropy BONUS; set True to reproduce the reference loss.
    reference_entropy_quirk: bool = False
    checkpoint_every_updates: int = 1  # reference saves every update (:363)
    resume: bool = False
    profile_updates: int = 0  # capture a jax.profiler trace of N updates
    # Fresh-game ring (env/ring.py): autoreset consumes pre-generated fresh
    # games instead of resetting the full batch every turn.  Ring size =
    # reset_ring_mult * num_envs; 0 disables (naive full-batch autoreset).
    reset_ring_mult: int = 2
    # Device mesh (parallel/mesh.py): dp shards the env batch (games) across
    # chips, tp shards the MLP hidden dim megatron-style.  dp=0 means
    # single-device (no mesh); dp=-1 means "all devices / tp".
    dp: int = 0
    tp: int = 1
    # Pool-opponent sampling: "uniform" (the reference supplier semantics,
    # ppo_splendor.py:137-143) or "pfsp" — prioritized fictitious self-play,
    # weighting frozen snapshots by (1 - winrate)^2 so still-unbeaten
    # opponents are replayed preferentially (selfplay/pool.py).
    opponent_sampling: str = "uniform"
    # Search-hardened league slot (beyond parity): with probability p_search
    # a fresh episode's opponent is the CURRENT snapshot wrapped in a cheap
    # on-device Gumbel search (search/gumbel.py, m/k0/horizon below) — a
    # strictly-stronger sparring partner whose edge the agent must learn to
    # close.  Branchless: the search runs for the whole batch every opponent
    # move and a where() selects which games use it, so keep m/k0/horizon
    # small (m8 k4 h2 ~ 200 extra engine plies per opponent move).
    search_opponent: bool = False
    p_search: float = 0.125
    search_m: int = 8
    search_k0: int = 4
    search_horizon: int = 2
    # Static league-slot partition: instead of Bernoulli(p_search) per fresh
    # episode + a branchless whole-batch search (XLA cannot dynamically
    # gather the sentinel subset, so the where() pays the full search for
    # every game), permanently assign a STRIDED set of env rows (every
    # `search_stride`-th row, n_search_static of them) to the sentinel and
    # run the search on that static strided slice only — ~1/p_search
    # cheaper.  Env rows are iid (fresh games come from the same ring), so
    # pinning WHICH rows face the search opponent leaves the episode
    # distribution unchanged; the slot fraction becomes exact instead of
    # binomial.  The stride (rather than a [0:S) prefix, which r4 used)
    # keeps the sentinel rows evenly distributed across dp shards: with the
    # batch dp-sharded along axis 0, a prefix concentrates ALL search work
    # on shard 0 while the rest idle (ADVICE r4), whereas every shard owns
    # an equal share of a strided set whenever search_stride divides the
    # per-shard batch (it does for all committed configs: stride 8 at
    # p_search=0.125 vs per-shard batches of >= 1024).
    search_static: bool = False
    # Information-fair league slot: run the sentinel's Gumbel search in
    # information-set mode (search/ismc.py determinization) so the sparring
    # partner only uses what the 297-dim obs reveals, instead of x-raying
    # deck order and blind reserves.  Costs extra determinization work per
    # playout lane; bump search_k0 when enabling (censored value estimates
    # need more worlds per candidate — docs/PERF.md censored-search ablation).
    search_censored: bool = False
    # Optional wandb tracking (the reference's third logging channel,
    # ppo_cleanRL.py:29-31/135-151).  None = off; gated on wandb being
    # importable (it is not baked into this image).
    wandb_project: str | None = None
    wandb_entity: str | None = None

    @property
    def n_search_static(self) -> int:
        """Static sentinel row count: round(p_search * num_envs), clamped to
        >= 1 when p_search > 0 so tiny configs don't silently train with no
        search slot at all (ADVICE r4: round() banker's rounding gave S=0 at
        num_envs=4, p_search=0.125)."""
        s = int(round(self.p_search * self.num_envs))
        if s == 0 and self.p_search > 0:
            s = 1
        return min(s, self.num_envs)

    @property
    def search_stride(self) -> int:
        """Static sentinel rows are `range(0, n_search_static * stride,
        stride)` with stride = num_envs // n_search_static — evenly spread
        over the batch (and hence over dp shards) instead of a prefix."""
        return max(1, self.num_envs // max(1, self.n_search_static))

    @property
    def batch_size(self) -> int:
        return self.num_envs * self.num_steps

    @property
    def num_updates(self) -> int:
        return self.total_timesteps // self.batch_size

    @property
    def num_minibatches(self) -> int:
        mb = min(self.minibatch_size, self.batch_size)
        return max(1, self.batch_size // mb)

    def replace(self, **kw) -> "PPOConfig":
        return dataclasses.replace(self, **kw)
