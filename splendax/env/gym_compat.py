"""Gymnasium-compatible single-env adapter over the JAX engine.

Drop-in replacement for the reference `SplendorEnv`
(`splendor_gym/envs/splendor_env.py:23-130`): same spaces, same info dict
(`action_mask` int8[45], `to_play`, `final_rewards`, `draw`,
`illegal_action`, `turn_limit`), same reward contract, same
raise-after-terminal behavior.  By default it resets with
`initial_state_parity` and steps with `rng_mode="parity"`, so trajectories
are **bit-identical** to the reference for the same gym seed.

This is the correctness/compat shim; batched on-device rollouts should use
`splendax.env.core` directly.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

try:
    import gymnasium as gym
    from gymnasium import spaces

    _GYM = True
except ImportError:  # pragma: no cover - gymnasium optional
    _GYM = False

    class _Space:  # minimal duck-typed stand-ins
        def __init__(self, n=None, low=None, high=None, shape=None, dtype=None):
            self.n = n
            self.low, self.high, self.shape, self.dtype = low, high, shape, dtype

    class _spaces_mod:
        @staticmethod
        def Discrete(n):
            return _Space(n=n)

        @staticmethod
        def Box(low, high, shape, dtype):
            return _Space(low=low, high=high, shape=shape, dtype=dtype)

    spaces = _spaces_mod()

    class gym:  # type: ignore
        class Env:
            np_random = None

            def reset(self, *, seed=None, options=None):
                if seed is not None:
                    self._np_random = np.random.default_rng(seed)
                return None, {}

            @property
            def np_random(self):
                if getattr(self, "_np_random", None) is None:
                    self._np_random = np.random.default_rng()
                return self._np_random

        class Wrapper:
            def __init__(self, env):
                self.env = env

            def __getattr__(self, name):
                return getattr(self.env, name)


from ..engine import rules
from ..engine.encode import encode_observation, OBSERVATION_DIM
from ..engine.rules import TOTAL_ACTIONS
from ..engine.types import GameState, initial_state_parity
from .core import step as core_step


class SplendorEnv(gym.Env):
    metadata = {"render_modes": ["human"], "name": "Splendax-v0"}

    def __init__(
        self,
        num_players: int = 2,
        render_mode: Optional[str] = None,
        seed: Optional[int] = None,  # accepted-and-ignored like the reference (:26)
        rng_mode: str = "parity",
        backend: str = "auto",
    ):
        """`backend`: "native" steps on the C++ host engine (~450k steps/s,
        bit-identical to rng_mode="parity"), "jax" on the jitted XLA engine,
        "auto" picks native when a toolchain built it and rng_mode is
        "parity", else jax.  Batched workloads should use `splendax.env.core`
        directly — this shim is the single-game host path."""
        super().__init__()
        if num_players != 2:
            raise NotImplementedError("Current env supports 2 players only.")
        self.num_players = num_players
        self.render_mode = render_mode
        self.rng_mode = rng_mode

        self.action_space = spaces.Discrete(TOTAL_ACTIONS)
        # Box(0, 50) reproduces the reference's declared bound
        # (splendor_env.py:33-36) for API parity even though move_count
        # (obs[295]) actually reaches 200 before the turn limit — the
        # reference's own declaration is wrong and gym never validates it.
        # The batched VectorEnv (env/vector.py) declares the TRUE bound
        # Box(0, 200); see docs/DEFECTS.md #11 if composing the two.
        self.observation_space = spaces.Box(
            low=0, high=50, shape=(OBSERVATION_DIM,), dtype=np.int32
        )
        self._jax_state: Optional[GameState] = None
        self._native = None  # NativeGame when the native backend is active
        self.current_player: int = 0

        if backend == "auto":
            backend = "jax"
            if rng_mode == "parity":
                from .. import native

                if native.is_available():
                    backend = "native"
        elif backend == "native":
            from .. import native

            if rng_mode != "parity":
                raise ValueError(
                    "backend='native' implements parity semantics; use "
                    "rng_mode='parity' (or backend='jax' for fast mode)"
                )
            native._load()  # raise now if the toolchain is missing
        self.backend = backend

        if backend == "jax":
            # Single-game host-driven stepping is dispatch-latency-bound; pin
            # it to the local CPU backend (the tunneled TPU pays a network RTT
            # per dispatch, ~100x slower for batch-1 work).
            try:
                self._device = jax.local_devices(backend="cpu")[0]
            except RuntimeError:  # pragma: no cover
                self._device = jax.devices()[0]
            # jit per rng_mode, shared across instances
            self._step = jax.jit(lambda s, a: core_step(s, a, rng_mode=rng_mode))

    @property
    def state(self) -> Optional[GameState]:
        """Current GameState (converted from the native flat state on demand)."""
        if self._native is not None:
            return self._native.to_game_state()
        return self._jax_state

    @state.setter
    def state(self, value: Optional[GameState]) -> None:
        if self._native is not None:
            raise AttributeError(
                "cannot assign state on the native backend; use backend='jax'"
            )
        self._jax_state = value

    # -- helpers -----------------------------------------------------------
    def _mask_np(self) -> np.ndarray:
        return np.asarray(rules.legal_mask(self.state), dtype=np.int8)

    def _obs_np(self) -> np.ndarray:
        return np.asarray(encode_observation(self.state), dtype=np.int32)

    # -- gym API ------------------------------------------------------------
    def reset(
        self, *, seed: Optional[int] = None, options: Optional[Dict[str, Any]] = None
    ) -> Tuple[np.ndarray, Dict[str, Any]]:
        super().reset(seed=seed)
        engine_seed = int(self.np_random.integers(0, 2**31 - 1))
        if self.backend == "native":
            from .. import native

            self._native = native.NativeGame(engine_seed)
            obs = self._native.observation()
            mask = self._native.legal_mask()
            self.current_player = int(self._native.field("to_play"))
            return obs, {"action_mask": mask, "to_play": self.current_player}
        self._jax_state = initial_state_parity(engine_seed, device=self._device)
        self.current_player = int(self._jax_state.to_play)
        obs = self._obs_np()
        info = {"action_mask": self._mask_np(), "to_play": self.current_player}
        return obs, info

    def step(self, action: int):
        if self.backend == "native":
            return self._step_native(action)
        assert self.state is not None, "Call reset() first"
        if bool(rules.is_terminal(self.state)):
            raise RuntimeError(
                "Cannot call step() after episode termination. Call reset()."
            )
        if not (0 <= int(action) < TOTAL_ACTIONS):
            raise ValueError("Action out of bounds for action_space")
        # numpy scalar, NOT jnp: a jnp scalar would materialize on the default
        # (possibly remote) device and cost a transfer round-trip per step.
        self._jax_state, out = self._step(self._jax_state, np.int32(int(action)))
        obs = np.asarray(out.obs, dtype=np.int32)
        terminated = bool(out.terminated)
        info: Dict[str, Any] = {
            "action_mask": np.asarray(out.action_mask, dtype=np.int8),
            "to_play": int(out.to_play),
        }
        if bool(out.illegal_action):
            info["illegal_action"] = True
        if bool(out.draw):
            info["draw"] = True
        if bool(out.turn_limit):
            info["turn_limit"] = True
        # The reference's stalemate-draw branch returns early WITHOUT
        # `final_rewards` (splendor_env.py:56-61); only regular terminations
        # attach it (:86-88).  Downstream wrappers guard with `.get`, exactly
        # as the reference's do (dual_step_native.py:197-198).
        if terminated and not bool(out.draw):
            fr = np.asarray(out.final_rewards, dtype=np.float64)
            info["final_rewards"] = {0: float(fr[0]), 1: float(fr[1])}
        return obs, float(out.reward), terminated, False, info

    def _step_native(self, action: int):
        from .. import native

        assert self._native is not None, "Call reset() first"
        if self._native.is_terminal():
            raise RuntimeError(
                "Cannot call step() after episode termination. Call reset()."
            )
        if not (0 <= int(action) < TOTAL_ACTIONS):
            raise ValueError("Action out of bounds for action_space")
        obs, reward, flags, mask = self._native.env_step(int(action))
        terminated = bool(flags & native.F_TERMINATED)
        info: Dict[str, Any] = {
            "action_mask": mask,
            "to_play": int(self._native.field("to_play")),
        }
        if flags & native.F_ILLEGAL:
            info["illegal_action"] = True
        if flags & native.F_DRAW:
            info["draw"] = True
        if flags & native.F_TURN_LIMIT:
            info["turn_limit"] = True
        # Stalemate draws omit final_rewards, like the reference (see the jax
        # path above).
        if terminated and not (flags & native.F_DRAW):
            fr = self._native.final_rewards()
            info["final_rewards"] = {0: fr[0], 1: fr[1]}
        return obs, reward, terminated, False, info

    def get_final_rewards(self) -> Dict[int, float]:
        """Reference get_final_rewards (splendor_env.py:92-115)."""
        if self._native is not None:
            if not self._native.is_terminal():
                raise RuntimeError("Cannot get final rewards for non-terminal state")
            fr = self._native.final_rewards()
            return {0: fr[0], 1: fr[1]}
        if not bool(rules.is_terminal(self.state)):
            raise RuntimeError("Cannot get final rewards for non-terminal state")
        from .core import final_rewards_of

        fr = np.asarray(final_rewards_of(self.state), dtype=np.float64)
        return {0: float(fr[0]), 1: float(fr[1])}

    def render(self):
        if self.render_mode not in ("human", None):
            return
        assert self.state is not None
        from ..tools.game_logger import format_game_state

        print(format_game_state(self.state))


def make(
    num_players: int = 2, render_mode: Optional[str] = None, seed: Optional[int] = None
) -> SplendorEnv:
    return SplendorEnv(num_players=num_players, render_mode=render_mode, seed=seed)


# Register with gymnasium so `gym.make("Splendax-v0")` works (the reference
# exposes `splendor_gym/envs/__init__.py:make`; we support both idioms).
if _GYM:
    try:
        gym.register(id="Splendax-v0", entry_point="splendax.env.gym_compat:SplendorEnv")
    except gym.error.Error:  # pragma: no cover - double registration
        pass
