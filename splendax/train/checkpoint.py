"""Checkpoint management: save AND resume (the reference only saves).

Reference `CheckpointManager` (training_utils.py:179-195) writes a torch
state_dict to `<log_dir>/ppo_splendor_latest.pt` plus a timestamped copy, and
never restores optimizer state.  Here a checkpoint is the full training state
— params, optimizer state, opponent pool, update/step counters — saved with
orbax, so training is resumable (SURVEY.md §5 names this the TPU-build
upgrade).  A torch-compatible `.pt`-style export is provided for
interoperability with reference eval scripts.
"""

from __future__ import annotations

import os
import time
from typing import Optional, Tuple

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def gather_to_host(train_state):
    """Materialize a (possibly multi-host-sharded) TrainState as host numpy.

    Single-process: plain `jax.device_get`.  Under `jax.distributed`, leaves
    that span processes (the dp-sharded env fleet, tp-sharded params) are
    all-gathered to their full global value — a COLLECTIVE every process
    must call in the same order (the standard multihost checkpoint
    discipline; see splendax/parallel/multihost.py).  Process-LOCAL leaves
    are device_get directly: running them through process_allgather would
    CONCATENATE the per-process copies (its host-local-data semantics),
    silently doubling every array — the failure mode of a multi-process run
    that skipped the global mesh."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        def leaf(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                return multihost_utils.process_allgather(x, tiled=True)
            return np.asarray(x)

        return jax.tree.map(leaf, train_state)
    return jax.device_get(train_state)


def _merge_state(target, saved):
    """Overlay `saved` onto `target` recursively; keys missing from `saved`
    keep the target's (freshly-initialized) values.  Orbax restores dicts
    keyed like flax's state-dict form (lists become index-keyed dicts), so
    both sides align structurally."""
    if saved is None:
        # orbax writes empty containers (e.g. optax EmptyState) as None;
        # keep the target's empty structure.
        return target
    if isinstance(target, dict):
        if isinstance(saved, (list, tuple)):
            # flax state-dicts key list entries "0","1",…; orbax raw restore
            # returns real lists — align the two forms.
            saved = {str(i): v for i, v in enumerate(saved)}
        if not isinstance(saved, dict):
            return saved
        return {
            k: _merge_state(v, saved[k]) if k in saved else v
            for k, v in target.items()
        }
    return saved


class CheckpointManager:
    def __init__(self, log_dir: str, run_ts: Optional[str] = None,
                 name: str = "ppo_splendor"):
        self.log_dir = os.path.abspath(log_dir)
        self.name = name
        self.run_ts = run_ts or time.strftime("%Y%m%d_%H%M%S")
        os.makedirs(os.path.join(self.log_dir, "checkpoints"), exist_ok=True)

    @property
    def latest_path(self) -> str:
        return os.path.join(self.log_dir, f"{self.name}_latest")

    def save_checkpoint(self, train_state, step: Optional[int] = None) -> Tuple[str, str]:
        """Write `<name>_latest` + a timestamped copy under checkpoints/
        (reference save layout, training_utils.py:186-195)."""
        state = gather_to_host(train_state)  # collective: all processes call
        ts_path = os.path.join(
            self.log_dir, "checkpoints",
            f"{self.name}_{self.run_ts}" + (f"_{step}" if step is not None else ""),
        )
        # Every process calls orbax save — it synchronizes internally
        # (multihost barriers) and only the primary host writes bytes;
        # gating on process_index here would deadlock the barrier.
        ocp = _ocp()
        with ocp.PyTreeCheckpointer() as ckptr:
            for path in (self.latest_path, ts_path):
                ckptr.save(path, state, force=True)
        return self.latest_path, ts_path

    def restore_checkpoint(self, abstract_state, path: Optional[str] = None):
        """Restore a full TrainState (abstract_state provides the pytree
        structure/shapes, e.g. a freshly-initialized state).

        Forward-compatible: fields that exist in `abstract_state` but not in
        an older checkpoint (e.g. the PFSP pool stats added after a run was
        saved) keep their freshly-initialized values instead of failing the
        whole restore."""
        from flax import serialization

        ocp = _ocp()
        path = path or self.latest_path
        with ocp.PyTreeCheckpointer() as ckptr:
            raw = ckptr.restore(path)  # saved structure, no item constraint
        target = serialization.to_state_dict(abstract_state)
        merged = _merge_state(target, raw)
        return serialization.from_state_dict(abstract_state, merged)

    def has_checkpoint(self) -> bool:
        return os.path.isdir(self.latest_path)


def export_params_npz(params, path: str) -> None:
    """Flat .npz export of model params (portable, torch-loadable)."""
    flat = {}
    for head in ("actor", "critic"):
        for i, layer in enumerate(params[head]):
            flat[f"{head}.{i}.w"] = np.asarray(layer["w"])
            flat[f"{head}.{i}.b"] = np.asarray(layer["b"])
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def import_params_npz(path: str) -> dict:
    import jax.numpy as jnp

    data = np.load(path)
    return {
        head: [
            {"w": jnp.asarray(data[f"{head}.{i}.w"]),
             "b": jnp.asarray(data[f"{head}.{i}.b"])}
            for i in range(3)
        ]
        for head in ("actor", "critic")
    }


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference .pt ActorCritic state_dict into splendax params
    (capability parity with eval_vs_random.py:11-15)."""
    import torch

    from ..models.actor_critic import from_torch_state_dict

    sd = torch.load(path, map_location="cpu")
    return from_torch_state_dict(sd)
