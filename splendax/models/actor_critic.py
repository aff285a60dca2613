"""ActorCritic policy/value network as a plain functional pytree.

Architecture parity with the reference model (`ppo_splendor.py:41-59`):
two separate MLPs 297 -> 256 -> 256 -> {45 logits, 1 value} with Tanh.
Implemented as explicit param pytrees (no Module machinery) because the
self-play opponent pool stacks N snapshots into one leading axis and gathers
per-game params on device — trivially expressible over raw pytrees.

Init matches torch's `nn.Linear` default (uniform ±1/sqrt(fan_in) for both
weight and bias), which is what the reference uses (it does NOT use CleanRL's
orthogonal init for this model).

The masked-categorical contract matches `masked_categorical`
(ppo_splendor.py:27-38): illegal logits -> -inf, except rows with no legal
action are left unmasked to avoid NaNs (the env turns those into draws).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

OBS_DIM = 297
ACT_DIM = 45
HIDDEN = 256


def _linear_init(key, fan_in, fan_out):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def init_params(key, obs_dim: int = OBS_DIM, act_dim: int = ACT_DIM, hidden: int = HIDDEN):
    ks = jax.random.split(key, 6)
    return {
        "actor": [
            _linear_init(ks[0], obs_dim, hidden),
            _linear_init(ks[1], hidden, hidden),
            _linear_init(ks[2], hidden, act_dim),
        ],
        "critic": [
            _linear_init(ks[3], obs_dim, hidden),
            _linear_init(ks[4], hidden, hidden),
            _linear_init(ks[5], hidden, 1),
        ],
    }


def _mlp(layers, x):
    x = x @ layers[0]["w"] + layers[0]["b"]
    x = jnp.tanh(x)
    x = x @ layers[1]["w"] + layers[1]["b"]
    x = jnp.tanh(x)
    return x @ layers[2]["w"] + layers[2]["b"]


def actor_logits(params, obs):
    """obs int32/float [..., 297] -> logits [..., 45]."""
    return _mlp(params["actor"], obs.astype(jnp.float32))


def critic_value(params, obs):
    """obs [..., 297] -> value [...]."""
    return _mlp(params["critic"], obs.astype(jnp.float32))[..., 0]


def forward(params, obs):
    return actor_logits(params, obs), critic_value(params, obs)


BIG_NEG = -1e9  # finite stand-in for -inf: keeps grads NaN-free through
# softmax/entropy while still zeroing illegal-action probabilities


def masked_logits(logits, mask):
    """Illegal actions -> -1e9; rows with no legal action left unmasked
    (the reference's NaN-avoidance contract, ppo_splendor.py:27-38)."""
    any_legal = mask.any(axis=-1, keepdims=True)
    return jnp.where(mask | ~any_legal, logits, BIG_NEG)


def _select_at(values, action):
    """values[..., action] via one-hot contraction — bit-exact (one nonzero
    term in the sum) and fused by XLA, where `take_along_axis` lowers to a
    per-row gather costing ~0.08 ms per [16384,45] call on v5e
    (docs/PERF.md trace notes)."""
    oh = (jnp.arange(values.shape[-1]) == action[..., None]).astype(values.dtype)
    return (values * oh).sum(axis=-1)


def sample_action(key, logits, mask):
    ml = masked_logits(logits, mask)
    action = jax.random.categorical(key, ml)
    logp = jax.nn.log_softmax(ml)
    return action.astype(jnp.int32), _select_at(logp, action)


def greedy_action(logits, mask):
    """Argmax of masked logits (reference model_greedy_policy_from,
    eval_suite.py:131-141)."""
    return jnp.argmax(masked_logits(logits, mask), axis=-1).astype(jnp.int32)


def log_prob_entropy(logits, mask, action):
    """Per-sample log-prob of `action` and per-sample entropy of the masked
    categorical (the sound definition; the reference's batch-mean entropy
    quirk is reproduced at the loss level in train/ppo.py)."""
    ml = masked_logits(logits, mask)
    logp = jax.nn.log_softmax(ml)
    p = jnp.exp(logp)
    ent = -jnp.sum(jnp.where(p > 0, p * logp, 0.0), axis=-1)
    lp = _select_at(logp, action.astype(jnp.int32))
    return lp, ent


def model_policy(params, greedy: bool = True):
    """Device opponent policy closure: (obs, mask, state, key) -> action."""

    def policy(obs, mask, state, key):
        logits = actor_logits(params, obs)
        if greedy:
            return greedy_action(logits, mask)
        a, _ = sample_action(key, logits, mask)
        return a

    return policy


# Torch-interop helpers (capability parity with reference .pt checkpoints) ---


def from_torch_state_dict(sd) -> dict:
    """Convert a reference `ActorCritic.state_dict()` to a splendax pytree."""
    import numpy as np

    def grab(prefix, i):
        w = np.asarray(sd[f"{prefix}.{i*2}.weight"]).T  # torch stores [out, in]
        b = np.asarray(sd[f"{prefix}.{i*2}.bias"])
        return {"w": jnp.asarray(w), "b": jnp.asarray(b)}

    return {
        "actor": [grab("actor", i) for i in range(3)],
        "critic": [grab("critic", i) for i in range(3)],
    }
