"""Native (C++) host engine bindings.

The batched throughput path is JAX/XLA (`splendax.engine.rules`); this module
wraps `engine.cpp` — a bit-identical C++ implementation of the same rules —
for the latency-bound HOST path, where per-step XLA dispatch (~1 ms through a
jit boundary, far worse over a tunneled TPU) caps interactive stepping.  The
native engine steps a single game in ~1 us, beating the reference engine's
>6000 steps/s bar by orders of magnitude (reference perf anchor:
splendor_gym/tests/test_gym_compat.py:135-157).

Bindings are ctypes (no pybind11 in this image); the library is compiled on
first use with g++ and cached under ~/.cache/splendax/native, keyed by source
hash.  Everything degrades gracefully: `is_available()` is False when no
toolchain is present and callers fall back to the JAX engine.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "engine.cpp")

STATE_SIZE = 194  # int32 words; must match engine.cpp State (static_assert'd)
OBS_DIM = 297
TOTAL_ACTIONS = 45

# Flat int32 layout of engine.cpp's State (field -> (offset, shape)).
STATE_LAYOUT = {
    "bank": (0, (6,)),
    "tokens": (6, (2, 6)),
    "bonuses": (18, (2, 5)),
    "prestige": (28, (2,)),
    "reserved_ids": (30, (2, 3)),
    "reserved_revealed": (36, (2, 3)),
    "reserved_count": (42, (2,)),
    "player_nobles": (44, (2, 3)),
    "noble_ids": (50, (3,)),
    "board": (53, (3, 4)),
    "deck_perm": (65, (3, 40)),
    "deck_count": (185, (3,)),
    "to_play": (188, ()),
    "turn_count": (189, ()),
    "move_count": (190, ()),
    "game_over": (191, ()),
    "winner": (192, ()),
    "turn_limit_reached": (193, ()),
}

# Flags returned by spx_env_step.
F_TERMINATED, F_ILLEGAL, F_DRAW, F_TURN_LIMIT = 1, 2, 4, 8

_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _build() -> str:
    """Compile engine.cpp into a cached shared library; return its path."""
    src = open(_SRC, "rb").read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    cache_dir = os.environ.get(
        "SPLENDAX_NATIVE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "splendax", "native"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    lib_path = os.path.join(cache_dir, f"libspxengine-{tag}.so")
    if not os.path.exists(lib_path):
        tmp = lib_path + ".tmp"
        base = ["g++", "-std=c++17", "-O2", "-shared", "-fPIC", "-o", tmp, _SRC]
        try:
            # -fopenmp parallelizes the spx_*_batch entry points across host
            # threads; results are bit-identical either way (lanes are
            # independent), so fall back WITHOUT it only when the failure is
            # actually about OpenMP support — a real source error must
            # surface, not trigger a second doomed compile.
            subprocess.run(base[:1] + ["-fopenmp"] + base[1:], check=True,
                           capture_output=True)
        except subprocess.CalledProcessError as e:
            err = (e.stderr or b"").decode(errors="replace").lower()
            if "openmp" not in err and "gomp" not in err:
                raise
            subprocess.run(base, check=True, capture_output=True)
        os.replace(tmp, lib_path)
    return lib_path


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _load() -> ctypes.CDLL:
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if _build_error is not None:
        raise RuntimeError(f"native engine unavailable: {_build_error}")
    try:
        lib = ctypes.CDLL(_build())
    except (OSError, subprocess.CalledProcessError, FileNotFoundError) as e:
        _build_error = repr(e)
        raise RuntimeError(f"native engine unavailable: {_build_error}") from e

    lib.spx_state_size.restype = ctypes.c_int
    assert lib.spx_state_size() == STATE_SIZE, "state layout drifted"

    from ..engine import data as D

    cost = np.ascontiguousarray(D.CARD_COST, np.int32)
    color = np.ascontiguousarray(D.CARD_COLOR, np.int32)
    points = np.ascontiguousarray(D.CARD_POINTS, np.int32)
    tier = np.ascontiguousarray(D.CARD_TIER, np.int32)
    noble_req = np.ascontiguousarray(D.NOBLE_REQ, np.int32)
    noble_pts = np.ascontiguousarray(D.NOBLE_POINTS, np.int32)
    combo = np.ascontiguousarray(D.COMBO_MASK, np.int32)
    bank = np.ascontiguousarray(D.DEFAULT_BANK, np.int32)
    lib.spx_init_tables(
        _i32p(cost), _i32p(color), _i32p(points), _i32p(tier),
        _i32p(noble_req), _i32p(noble_pts), _i32p(combo), _i32p(bank),
    )
    lib.spx_env_step.restype = ctypes.c_int
    lib.spx_is_terminal.restype = ctypes.c_int
    lib.spx_random_game.restype = ctypes.c_int
    _lib = lib
    return lib


def is_available() -> bool:
    try:
        _load()
        return True
    except RuntimeError:
        return False


class NativeGame:
    """One Splendor game on the native engine (numpy in/out).

    The flat `state` array is the single source of truth and is layout-
    compatible with `splendax.engine.types.GameState` via to_game_state().
    """

    def __init__(self, seed: int):
        self._lib = _load()
        self.state = np.zeros(STATE_SIZE, np.int32)
        self._obs = np.zeros(OBS_DIM, np.int32)
        self._mask = np.zeros(TOTAL_ACTIONS, np.int8)
        self._reward = ctypes.c_double(0.0)
        self._lib.spx_initial_state(ctypes.c_int64(int(seed)), _i32p(self.state))

    def legal_mask(self) -> np.ndarray:
        self._lib.spx_legal_mask(
            _i32p(self.state), self._mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int8))
        )
        return self._mask.copy()

    def observation(self) -> np.ndarray:
        self._lib.spx_encode_obs(_i32p(self.state), _i32p(self._obs))
        return self._obs.copy()

    def is_terminal(self) -> bool:
        return bool(self._lib.spx_is_terminal(_i32p(self.state)))

    def env_step(self, action: int) -> Tuple[np.ndarray, float, int, np.ndarray]:
        """(obs, reward, flags, mask) with the reference env contract."""
        flags = self._lib.spx_env_step(
            _i32p(self.state), ctypes.c_int32(int(action)), _i32p(self._obs),
            self._mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            ctypes.byref(self._reward),
        )
        return self._obs.copy(), float(self._reward.value), int(flags), self._mask.copy()

    def final_rewards(self) -> Tuple[float, float]:
        out = (ctypes.c_double * 2)()
        self._lib.spx_final_rewards(_i32p(self.state), out)
        return float(out[0]), float(out[1])

    def field(self, name: str) -> np.ndarray:
        off, shape = STATE_LAYOUT[name]
        n = int(np.prod(shape)) if shape else 1
        v = self.state[off : off + n]
        return v.reshape(shape) if shape else v[0]

    def to_game_state(self):
        """Convert to a (host-backed) splendax GameState pytree."""
        import jax.numpy as jnp

        from ..engine.types import GameState

        kw = {}
        for name, (off, shape) in STATE_LAYOUT.items():
            n = int(np.prod(shape)) if shape else 1
            v = self.state[off : off + n]
            v = v.reshape(shape) if shape else v[0]
            if name in ("game_over", "turn_limit_reached"):
                kw[name] = jnp.asarray(bool(v))
            else:
                kw[name] = jnp.asarray(v)
        return GameState(**kw)


class NativeBatch:
    """N independent Splendor games stepped in ONE native call.

    The C loop (`spx_env_step_batch`, engine.cpp) is OpenMP-parallel across
    host threads and bit-identical to stepping N `NativeGame`s serially.
    Used by `splendax.env.vector.SplendaxVectorEnv(backend="native")` for the
    host-CPU vector path; the TPU throughput path stays JAX."""

    def __init__(self, n: int):
        self._lib = _load()
        self.n = int(n)
        self.states = np.zeros((n, STATE_SIZE), np.int32)
        self._obs = np.zeros((n, OBS_DIM), np.int32)
        self._mask = np.zeros((n, TOTAL_ACTIONS), np.int8)
        self._reward = np.zeros(n, np.float64)
        self._flags = np.zeros(n, np.int32)
        self._final = np.zeros((n, 2), np.float64)

    def reset(self, seeds: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Re-init ALL lanes from int64 engine seeds; (obs, mask) copies."""
        seeds = np.ascontiguousarray(seeds, np.int64)
        if seeds.shape != (self.n,):
            raise ValueError(f"seeds must have shape ({self.n},), got {seeds.shape}")
        p64 = seeds.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        self._lib.spx_initial_state_batch(p64, self.n, _i32p(self.states))
        self._lib.spx_encode_obs_batch(_i32p(self.states), self.n, _i32p(self._obs))
        self._lib.spx_legal_mask_batch(
            _i32p(self.states), self.n,
            self._mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        )
        return self._obs.copy(), self._mask.copy()

    def step(
        self,
        actions: np.ndarray,
        reset_lane: Optional[np.ndarray] = None,
        reset_seeds: Optional[np.ndarray] = None,
    ):
        """Step every lane; lanes with reset_lane[i] become fresh games from
        reset_seeds[i] instead (action ignored — gymnasium NEXT_STEP).

        Returns (obs, mask, reward f64[n], flags i32[n], final_rewards
        f64[n,2]) as copies; flags bits: 1=terminated 2=illegal 4=draw
        8=turn_limit."""
        actions = np.ascontiguousarray(actions, np.int32)
        if actions.shape != (self.n,):
            raise ValueError(
                f"actions must have shape ({self.n},), got {actions.shape}"
            )
        if reset_lane is None:
            lane_p = None
            seed_p = None
        else:
            reset_lane = np.ascontiguousarray(reset_lane, np.int8)
            reset_seeds = np.ascontiguousarray(reset_seeds, np.int64)
            if reset_lane.shape != (self.n,) or reset_seeds.shape != (self.n,):
                raise ValueError(
                    f"reset_lane/reset_seeds must have shape ({self.n},), got "
                    f"{reset_lane.shape}/{reset_seeds.shape}"
                )
            lane_p = reset_lane.ctypes.data_as(ctypes.POINTER(ctypes.c_int8))
            seed_p = reset_seeds.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        self._lib.spx_env_step_batch(
            _i32p(self.states),
            actions.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            lane_p, seed_p, self.n,
            _i32p(self._obs),
            self._mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            self._reward.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            self._flags.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self._final.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return (self._obs.copy(), self._mask.copy(), self._reward.copy(),
                self._flags.copy(), self._final.copy())

    def reset_lanes(self, idx, seeds) -> None:
        """Re-init a SUBSET of lanes in place (SAME_STEP autoreset); other
        lanes are untouched.  Cheap per-lane calls — resets are sparse."""
        for i, s in zip(np.asarray(idx), np.asarray(seeds)):
            row = self.states[int(i)]
            self._lib.spx_initial_state(ctypes.c_int64(int(s)), _i32p(row))

    def lane_obs_mask(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        """(obs, mask) of one lane's CURRENT state."""
        obs = np.zeros(OBS_DIM, np.int32)
        mask = np.zeros(TOTAL_ACTIONS, np.int8)
        row = self.states[int(i)]
        self._lib.spx_encode_obs(_i32p(row), _i32p(obs))
        self._lib.spx_legal_mask(
            _i32p(row), mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int8))
        )
        return obs, mask

    def to_play(self) -> np.ndarray:
        off, _ = STATE_LAYOUT["to_play"]
        return self.states[:, off].copy()


def random_game(seed: int, max_plies: int = 400) -> Tuple[int, np.ndarray]:
    """Play a full uniform-random-legal game natively; (plies, final_state)."""
    lib = _load()
    final = np.zeros(STATE_SIZE, np.int32)
    plies = lib.spx_random_game(
        ctypes.c_int64(int(seed)), ctypes.c_int(int(max_plies)), _i32p(final)
    )
    return int(plies), final
