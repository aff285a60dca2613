"""Device-mesh sharding for the env fleet and learner.

The reference has NO distributed machinery (SURVEY.md §2.7: serial
SyncVectorEnv, single torch device).  The TPU-native scale-out instead maps
onto a `jax.sharding.Mesh` with two axes:

  * `dp` — data parallel: the env batch (games) is sharded across chips;
    rollout/GAE are embarrassingly parallel, gradient reduction becomes an
    XLA-inserted psum over ICI.
  * `tp` — tensor parallel: the MLP hidden dimension is sharded
    (column-parallel in, row-parallel out), exercising megatron-style
    collectives even though the model is small.

Everything rides GSPMD: we place the TrainState with NamedShardings and call
the same jitted `update_step`; XLA propagates shardings and inserts the
collectives.  Multi-host would add `jax.distributed.initialize` on top —
the shardings below are already global-view.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.actor_critic import OBS_DIM, ACT_DIM


def make_mesh(dp: int, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if dp * tp > len(devices):
        raise ValueError(f"mesh {dp}x{tp} needs {dp*tp} devices, have {len(devices)}")
    grid = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, axis_names=("dp", "tp"))


def _param_spec(shape) -> P:
    """Megatron-style TP spec by shape: column-parallel into the hidden dim,
    row-parallel out of it; biases follow their activation sharding.

    Classified relative to the FIXED interface dims (OBS_DIM in, ACT_DIM/1
    out) rather than a hard-coded hidden width, so any `--hidden` value
    shards correctly.  (Degenerate widths equal to an interface dim — e.g.
    hidden=45 — would misclassify; real configs are hundreds wide.)"""
    if len(shape) == 2:
        d_in, d_out = shape
        if d_in == OBS_DIM:
            return P(None, "tp")  # input projection: column parallel
        return P("tp", None)  # hidden/output projections: row parallel (psum)
    if len(shape) == 1 and shape[0] not in (ACT_DIM, 1):
        return P("tp")  # hidden-layer bias follows its activation sharding
    return P()


def _stacked_param_spec(shape) -> P:
    """Pool stack leaves carry a leading pool axis (replicated)."""
    inner = _param_spec(shape[1:])
    return P(None, *inner)


def train_state_shardings(ts, mesh: Mesh):
    """NamedSharding pytree matching a `splendax.train.ppo.TrainState`."""

    def ns(spec):
        return NamedSharding(mesh, spec)

    def map_params(tree):
        return jax.tree.map(lambda x: ns(_param_spec(x.shape)), tree)

    def map_stacked(tree):
        return jax.tree.map(lambda x: ns(_stacked_param_spec(x.shape)), tree)

    def map_batched(tree):
        return jax.tree.map(
            lambda x: ns(P("dp", *([None] * (x.ndim - 1)))), tree
        )

    def map_replicated(tree):
        return jax.tree.map(lambda x: ns(P()), tree)

    # opt_state mirrors params inside adam moments; other leaves are scalars.
    def map_opt(tree):
        return jax.tree.map(
            lambda x: ns(_param_spec(x.shape)) if x.ndim >= 1 else ns(P()), tree
        )

    return ts.replace(
        params=map_params(ts.params),
        opt_state=map_opt(ts.opt_state),
        pool=ts.pool.replace(
            stack=map_stacked(ts.pool.stack),
            n_snapshots=ns(P()),
            p_current=ns(P()),
            wins=ns(P()),
            games=ns(P()),
        ),
        env_state=map_batched(ts.env_state),
        obs=ns(P("dp", None)),
        mask=ns(P("dp", None)),
        opp_idx=ns(P("dp")),
        key=ns(P()),
        update_idx=ns(P()),
        global_step=ns(P()),
    )


def shard_train_state(ts, mesh: Mesh):
    """Place a TrainState onto the mesh with dp/tp shardings."""
    return jax.device_put(ts, train_state_shardings(ts, mesh))


def sharded_update(cfg, ts, mesh: Optional[Mesh] = None):
    """Run one jitted update with the TrainState sharded over `mesh`.

    The env batch must be divisible by the dp axis.  Returns the (sharded)
    new TrainState and metrics.
    """
    from ..train import ppo

    if mesh is not None:
        ts = shard_train_state(ts, mesh)
    return ppo.update_step(cfg, ts)
