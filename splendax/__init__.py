"""splendax: a TPU-native Splendor RL framework.

Brand-new JAX/XLA re-design of the capabilities of `YiyangShao/splendor-gym`:
a pure-functional rules engine (struct-of-arrays GameState, branchless
mask/step), batched lockstep environments, self-play combinators, heuristic
and neural opponents, an on-device PPO self-play trainer, and an evaluation
suite — all jit/vmap/shard_map-able over TPU meshes.
"""

__version__ = "0.1.0"

from .engine import (
    GameState,
    initial_state,
    initial_state_parity,
    legal_mask,
    apply_action,
    is_terminal,
    encode_observation,
    TOTAL_ACTIONS,
    OBSERVATION_DIM,
)
from .env.core import reset, step, reset_batch, step_batch, step_autoreset, StepOutput
