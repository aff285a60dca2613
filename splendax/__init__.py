"""splendax: a TPU-native Splendor RL framework.

Brand-new JAX/XLA re-design of the capabilities of `YiyangShao/splendor-gym`:
a pure-functional rules engine (struct-of-arrays GameState, branchless
mask/step), batched lockstep environments, self-play combinators, heuristic
and neural opponents, an on-device PPO self-play trainer, and an evaluation
suite — all jit/vmap/shard_map-able over TPU meshes.

Exports resolve lazily (PEP 562): submodules create device-resident constant
tables at import, so the package must not import them as a side effect of
`import splendax` — CLI entry points first pin the JAX platform
(utils.cache.setup_runtime) and only then touch the engine.  Eager imports
here would commit the card tables to whatever default device exists at
process start (on this image: a tunneled remote TPU, making every later
trace fetch constants over the network).
"""

from __future__ import annotations

import importlib

__version__ = "0.1.0"

_EXPORTS = {
    "GameState": "splendax.engine",
    "initial_state": "splendax.engine",
    "initial_state_parity": "splendax.engine",
    "legal_mask": "splendax.engine",
    "apply_action": "splendax.engine",
    "is_terminal": "splendax.engine",
    "encode_observation": "splendax.engine",
    "TOTAL_ACTIONS": "splendax.engine",
    "OBSERVATION_DIM": "splendax.engine",
    "reset": "splendax.env.core",
    "step": "splendax.env.core",
    "reset_batch": "splendax.env.core",
    "step_batch": "splendax.env.core",
    "step_autoreset": "splendax.env.core",
    "StepOutput": "splendax.env.core",
    "SplendaxVectorEnv": "splendax.env.vector",
    "make_vector": "splendax.env.vector",
    "FreshGameRing": "splendax.env.ring",
    "make_ring": "splendax.env.ring",
    "step_autoreset_ring": "splendax.env.ring",
}

__all__ = sorted(_EXPORTS) + ["__version__"]


def __getattr__(name: str):
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(f"module 'splendax' has no attribute {name!r}")
    value = getattr(importlib.import_module(mod), name)
    globals()[name] = value  # cache for subsequent lookups
    return value


def __dir__():
    return __all__
