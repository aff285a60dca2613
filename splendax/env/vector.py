"""Gymnasium `VectorEnv` adapter backed by the batched JAX engine.

The reference gets vectorization from `gym.vector.SyncVectorEnv`, which steps
N python env copies SERIALLY in one process (`ppo_splendor.py:151-159`).
splendax's batched core (`splendax.env.core`) replaces that with one XLA
program advancing all games in lockstep; this module exposes that batch
through the standard `gymnasium.vector.VectorEnv` interface so existing
gymnasium-based code (wrappers, recorders, training loops) can drop it in:

    envs = SplendaxVectorEnv(num_envs=1024)
    obs, infos = envs.reset(seed=0)
    obs, r, term, trunc, infos = envs.step(actions)   # ONE fused device step

Semantics:
  * Supports gymnasium's `NEXT_STEP` (1.x default) and `SAME_STEP` autoreset
    modes.  `NEXT_STEP`: a lane that terminated at step t ignores its action
    at t+1 and returns the reset observation with reward 0.  `SAME_STEP`: the
    lane resets within the terminating step; the terminal observation is
    delivered as `infos["final_obs"]` (object array), as SyncVectorEnv does.
  * Per-step infos always carry `action_mask` (int8[N,45]) and `to_play`
    (int32[N]), mirroring the single-env info contract
    (`splendor_env.py:82-88`); `illegal_action` / `draw` / `turn_limit` /
    `final_rewards` appear with gymnasium's `_<key>` presence masks.
  * RNG is threefry (`rng_mode="fast"` semantics: same seeding rule and
    uniform-over-nonzero-colors token return as the reference, different
    bitstream).  Bit-parity workflows should wrap the single-env shim in
    `gym.vector.SyncVectorEnv` instead — `SplendorEnv` is a conformant
    `gym.Env`, so the reference's own composition still works.

Like the single-env shim, stepping is host-driven (one dispatch per step), so
the batch is pinned to the local CPU backend by default: the tunneled TPU on
this image pays a network RTT per dispatch.  On-device training should use
`splendax.env.core` / `splendax.selfplay.dual` scans directly.
"""

from __future__ import annotations

import hashlib
from types import SimpleNamespace
from typing import Any, Dict, Optional, Sequence, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from gymnasium import spaces
from gymnasium.vector import AutoresetMode, VectorEnv
from gymnasium.vector.utils import batch_space

from ..engine.encode import OBSERVATION_DIM
from ..engine.rules import TOTAL_ACTIONS
from . import core

# Largest value any observation slot can reach: move_count (offset 295) hits
# 2*TURN_LIMIT = 200 at the turn-limit draw.  (The reference — and our
# parity shim — declare Box(0, 50), which their own observations exceed
# past turn 50; this new surface declares the true bound instead.)
_OBS_HIGH = 200


# Module-level jitted kernels, shared by every instance (constructing many
# envs must not retrace/recompile the step graph; cf. core.reset_batch).
_reset_all = jax.jit(jax.vmap(core.reset))
_step_plain = jax.jit(jax.vmap(lambda s, a, m: core.step(s, a, mask=m)))
_step_same = core.step_autoreset  # already jitted


@jax.jit
def _step_next(states, mask, actions, pending, key):
    """NEXT_STEP autoreset: step every lane, then overwrite lanes that
    terminated LAST step with fresh games (their action is ignored, reward
    0, flags cleared — gymnasium 1.x SyncVectorEnv semantics)."""
    n = actions.shape[0]
    next_state, out = jax.vmap(lambda s, a, m: core.step(s, a, mask=m))(
        states, actions, mask
    )
    fresh_state, fresh_obs, fresh_mask = jax.vmap(core.reset)(
        jax.random.split(key, n)
    )

    def pick(fresh, cur):
        d = pending.reshape((n,) + (1,) * (cur.ndim - 1))
        return jnp.where(d, fresh, cur)

    carry = jax.tree.map(pick, fresh_state, next_state)
    obs = pick(fresh_obs, out.obs)
    mask_next = pick(fresh_mask, out.action_mask)
    zero = jnp.zeros((), out.reward.dtype)
    out = out.replace(
        reward=jnp.where(pending, zero, out.reward),
        terminated=jnp.where(pending, False, out.terminated),
        illegal_action=jnp.where(pending, False, out.illegal_action),
        draw=jnp.where(pending, False, out.draw),
        turn_limit=jnp.where(pending, False, out.turn_limit),
        final_rewards=jnp.where(pending[:, None], 0.0, out.final_rewards),
        to_play=jnp.where(pending, 0, out.to_play),
    )
    return carry, out, obs, mask_next


class SplendaxVectorEnv(VectorEnv):
    """N lockstep Splendor games behind the gymnasium vector API."""

    metadata = {"autoreset_mode": {AutoresetMode.NEXT_STEP, AutoresetMode.SAME_STEP}}

    def __init__(
        self,
        num_envs: int = 16,
        autoreset_mode: AutoresetMode = AutoresetMode.NEXT_STEP,
        device: Optional[Any] = None,
        backend: str = "jax",
    ):
        """`backend`: "jax" (default) steps all lanes in one XLA program
        (rng_mode="fast" semantics, threefry streams); "native" steps them in
        one OpenMP-parallel C++ call (`splendax.native.NativeBatch`) with
        CPython-parity streams and SyncVectorEnv-compatible seeding — for a
        scalar reset seed s, lane i seeds its PCG64 like a sub-env reset with
        seed s+i, so `SplendaxVectorEnv(n, backend="native")` is
        bit-identical to `gym.vector.SyncVectorEnv` over n
        `SplendorEnv(backend="native")` shims, autoreset included
        (tests/test_vector_env.py)."""
        self.num_envs = int(num_envs)
        if backend not in ("jax", "native"):
            raise ValueError(f"unknown backend {backend!r}")
        if isinstance(autoreset_mode, str):
            autoreset_mode = AutoresetMode(autoreset_mode)
        if autoreset_mode not in self.metadata["autoreset_mode"]:
            raise ValueError(
                f"unsupported autoreset_mode {autoreset_mode}; supported: "
                f"{self.metadata['autoreset_mode']}"
            )
        if backend == "native":
            from .. import native as native_mod

            if not native_mod.is_available():
                raise RuntimeError(
                    "backend='native' needs the C++ engine (g++ toolchain)"
                )
            self._nb = native_mod.NativeBatch(self.num_envs)
            self._lane_rngs = None
        self.backend = backend
        self.autoreset_mode = autoreset_mode
        self.metadata = dict(self.metadata, autoreset_mode=autoreset_mode)
        self.render_mode = None

        self.single_action_space = spaces.Discrete(TOTAL_ACTIONS)
        self.single_observation_space = spaces.Box(
            low=0, high=_OBS_HIGH, shape=(OBSERVATION_DIM,), dtype=np.int32
        )
        self.action_space = batch_space(self.single_action_space, self.num_envs)
        self.observation_space = batch_space(
            self.single_observation_space, self.num_envs
        )

        if device is None:
            try:
                device = jax.local_devices(backend="cpu")[0]
            except RuntimeError:  # pragma: no cover - no cpu backend
                device = jax.devices()[0]
        self._device = device

        self._states = None
        self._mask = None  # bool[N,45] legality of the carried states
        self._pending = None  # bool[N], NEXT_STEP lanes awaiting reset
        self._key = None


    # -- helpers ---------------------------------------------------------------

    def _info_dict(self, mask, to_play, out=None) -> Dict[str, Any]:
        n = self.num_envs
        infos: Dict[str, Any] = {
            "action_mask": np.asarray(mask, dtype=np.int8),
            "_action_mask": np.ones(n, dtype=bool),
            "to_play": np.asarray(to_play, dtype=np.int32),
            "_to_play": np.ones(n, dtype=bool),
        }
        if out is not None:
            for name in ("illegal_action", "draw", "turn_limit"):
                flag = np.asarray(getattr(out, name), dtype=bool)
                if flag.any():
                    infos[name] = flag
                    infos[f"_{name}"] = flag
            term = np.asarray(out.terminated, dtype=bool)
            if term.any():
                infos["final_rewards"] = np.asarray(out.final_rewards, np.float32)
                infos["_final_rewards"] = term
        return infos

    # -- gymnasium vector API --------------------------------------------------

    def reset(
        self,
        *,
        seed: Optional[Union[int, Sequence[int]]] = None,
        options: Optional[Dict[str, Any]] = None,
    ) -> Tuple[np.ndarray, Dict[str, Any]]:
        if self.backend == "native":
            return self._reset_native(seed)
        if seed is None:
            seed = int(np.random.SeedSequence().generate_state(1)[0])
        if isinstance(seed, (int, np.integer)):
            root = jax.random.PRNGKey(int(seed))
        else:
            seeds = np.asarray(list(seed), dtype=np.uint32)
            if len(seeds) != self.num_envs:
                raise ValueError(
                    f"got {len(seeds)} seeds for {self.num_envs} envs"
                )
            # The carried autoreset stream must depend on EVERY per-env seed
            # (not just seeds[0]), or differently-seeded runs would share all
            # fresh-game deals after termination.
            digest = hashlib.blake2s(seeds.tobytes(), digest_size=4).digest()
            root = jax.random.PRNGKey(int.from_bytes(digest, "little"))
        with jax.default_device(self._device):
            self._key, sub = jax.random.split(jax.device_put(root, self._device))
            if isinstance(seed, (int, np.integer)):
                keys = jax.random.split(sub, self.num_envs)
            else:
                keys = jax.vmap(jax.random.PRNGKey)(jnp.asarray(seeds))
            self._states, obs, mask = _reset_all(keys)
        self._mask = mask
        self._pending = np.zeros(self.num_envs, dtype=bool)
        to_play = np.zeros(self.num_envs, dtype=np.int32)
        return np.asarray(obs, dtype=np.int32), self._info_dict(mask, to_play)

    def step(self, actions):
        if self._states is None:
            raise RuntimeError("Call reset() before step().")
        actions = np.asarray(actions, dtype=np.int32)
        if actions.shape != (self.num_envs,):
            raise ValueError(f"actions must have shape ({self.num_envs},)")
        # Reject out-of-range actions like the single-env shim does — the
        # engine's internal clip would otherwise silently PLAY action 44 for
        # any action >= 45, masking caller bugs.
        if ((actions < 0) | (actions >= TOTAL_ACTIONS)).any():
            bad = actions[(actions < 0) | (actions >= TOTAL_ACTIONS)]
            raise ValueError(
                f"actions out of bounds for Discrete({TOTAL_ACTIONS}): {bad[:8]}"
            )
        if self.backend == "native":
            return self._step_native(actions)
        with jax.default_device(self._device):
            self._key, sub = jax.random.split(self._key)
            if self.autoreset_mode == AutoresetMode.NEXT_STEP:
                if self._pending.any():
                    self._states, out, obs, mask_next = _step_next(
                        self._states,
                        self._mask,
                        actions,
                        jnp.asarray(self._pending),
                        sub,
                    )
                else:
                    self._states, out = _step_plain(
                        self._states, actions, self._mask
                    )
                    obs, mask_next = out.obs, out.action_mask
                final_obs = None
            else:  # SAME_STEP: reset within the terminating step
                self._states, out, obs, mask_next = _step_same(
                    self._states, actions, sub, mask=self._mask
                )
                final_obs = np.asarray(out.obs, dtype=np.int32)
        self._mask = mask_next

        return self._package_step(
            np.asarray(obs, dtype=np.int32),
            np.asarray(out.reward, dtype=np.float64),
            np.asarray(out.terminated, dtype=bool),
            self._info_dict(mask_next, out.to_play, out),
            final_obs,
        )

    def _package_step(self, obs, reward, terminated, infos, final_obs):
        """Shared post-step packaging for both backends: pending-lane
        bookkeeping (NEXT_STEP) or the SyncVectorEnv SAME_STEP convention of
        terminal observations riding in infos as an object array."""
        if self.autoreset_mode == AutoresetMode.NEXT_STEP:
            self._pending = terminated.copy()
        elif terminated.any():
            fo = np.full(self.num_envs, None, dtype=object)
            for i in np.nonzero(terminated)[0]:
                fo[i] = final_obs[i]
            infos["final_obs"] = fo
            infos["_final_obs"] = terminated.copy()
        truncated = np.zeros(self.num_envs, dtype=bool)
        return obs, reward, terminated, truncated, infos

    # -- native (C++ host) backend ----------------------------------------------

    def _engine_seed(self, lane: int) -> int:
        # Exactly the shim's derivation (gym_compat.py: np_random PCG64 ->
        # integers(0, 2**31-1)); the stream persists across autoresets like
        # a sub-env's np_random does.
        return int(self._lane_rngs[lane].integers(0, 2**31 - 1))

    def _reset_native(self, seed):
        if seed is None:
            # Unseeded reset: keep the existing per-lane streams (a gymnasium
            # Env.reset(seed=None) preserves np_random — SyncVectorEnv
            # sub-envs would draw their next engine seeds from the SAME
            # continuing streams, so we must too for bit-identity).
            if self._lane_rngs is None:
                self._lane_rngs = [
                    np.random.default_rng(None) for _ in range(self.num_envs)
                ]
        else:
            if isinstance(seed, (int, np.integer)):
                # gymnasium vector convention: sub-env i gets seed + i.
                lane_seeds = [int(seed) + i for i in range(self.num_envs)]
            else:
                lane_seeds = [int(s) for s in seed]
                if len(lane_seeds) != self.num_envs:
                    raise ValueError(
                        f"got {len(lane_seeds)} seeds for {self.num_envs} envs"
                    )
            self._lane_rngs = [np.random.default_rng(s) for s in lane_seeds]
        engine_seeds = np.asarray(
            [self._engine_seed(i) for i in range(self.num_envs)], np.int64
        )
        obs, mask = self._nb.reset(engine_seeds)
        self._mask = mask
        self._pending = np.zeros(self.num_envs, dtype=bool)
        to_play = np.zeros(self.num_envs, dtype=np.int32)
        self._states = self._nb.states  # non-None marks "reset() called"
        return obs, self._info_dict(mask, to_play)

    def _step_native(self, actions: np.ndarray):
        n = self.num_envs
        if self.autoreset_mode == AutoresetMode.NEXT_STEP:
            pending = self._pending
            if pending.any():
                reset_seeds = np.zeros(n, np.int64)
                for i in np.nonzero(pending)[0]:
                    reset_seeds[i] = self._engine_seed(int(i))
                obs, mask, reward, flags, final = self._nb.step(
                    actions, pending.astype(np.int8), reset_seeds
                )
            else:
                obs, mask, reward, flags, final = self._nb.step(actions)
            final_obs = None
        else:  # SAME_STEP
            obs, mask, reward, flags, final = self._nb.step(actions)
            term = (flags & 1) != 0
            final_obs = obs.copy() if term.any() else None
            if term.any():
                idx = np.nonzero(term)[0]
                self._nb.reset_lanes(idx, [self._engine_seed(int(i)) for i in idx])
                for i in idx:
                    obs[i], mask[i] = self._nb.lane_obs_mask(int(i))
        self._mask = mask

        terminated = (flags & 1) != 0
        out = SimpleNamespace(
            terminated=terminated,
            illegal_action=(flags & 2) != 0,
            draw=(flags & 4) != 0,
            turn_limit=(flags & 8) != 0,
            final_rewards=final.astype(np.float32),
        )
        infos = self._info_dict(mask, self._nb.to_play(), out)
        return self._package_step(obs, reward, terminated, infos, final_obs)

    def close_extras(self, **kwargs):
        self._states = None


def make_vector(num_envs: int = 16, **kwargs) -> SplendaxVectorEnv:
    return SplendaxVectorEnv(num_envs=num_envs, **kwargs)
