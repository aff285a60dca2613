"""Pallas TPU kernel: fused actor-critic forward.

Fuses the full policy+value network — six matmuls, four tanh activations,
the int32->f32 observation cast, and the masked-logits select — into ONE
kernel that reads the observation tile from HBM exactly once and keeps every
activation in VMEM.  The unfused XLA path materializes each [B, 256] hidden
layer to HBM between matmuls; at rollout batch sizes the network is
bandwidth- not FLOP-bound, so the fusion removes most of the traffic.

All parameters (~300 KB f32) stay resident in VMEM across the batch-tile
grid.  Tiles: batch is swept in blocks of `TILE_B`; weights use no blocking
(whole-array index maps), letting the pipeline keep them live between grid
steps.

Numerics match `splendax.models.actor_critic.forward` to float32 rounding in
interpreter mode (tests/test_pallas_ops.py asserts 1e-5 allclose plus the
masked-logits contract).  On TPU hardware both paths run the MXU with bf16
multiplier inputs and round differently per-lowering: measured max
|Δlogit| ≈ 5e-4 at unit logit scale — irrelevant for sampling/argmax.
Measured v5e, batch 16384: ~324 us/call vs ~352 us for the unfused XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.actor_critic import ACT_DIM, BIG_NEG, HIDDEN, OBS_DIM

TILE_B = 256


def _kernel(obs_ref, mask_ref,
            aw0, ab0, aw1, ab1, aw2, ab2,
            cw0, cb0, cw1, cb1, cw2, cb2,
            logits_ref, value_ref):
    x = obs_ref[:].astype(jnp.float32)  # [TILE_B, OBS_DIM]

    h = jnp.tanh(jnp.dot(x, aw0[:], preferred_element_type=jnp.float32) + ab0[:])
    h = jnp.tanh(jnp.dot(h, aw1[:], preferred_element_type=jnp.float32) + ab1[:])
    logits = jnp.dot(h, aw2[:], preferred_element_type=jnp.float32) + ab2[:]

    v = jnp.tanh(jnp.dot(x, cw0[:], preferred_element_type=jnp.float32) + cb0[:])
    v = jnp.tanh(jnp.dot(v, cw1[:], preferred_element_type=jnp.float32) + cb1[:])
    value = jnp.dot(v, cw2[:], preferred_element_type=jnp.float32) + cb2[:]

    # Masked-logits contract (models/actor_critic.py:80-84): illegal -> -1e9,
    # rows with no legal action left unmasked.
    mask = mask_ref[:]
    any_legal = mask.any(axis=-1, keepdims=True)
    logits_ref[:] = jnp.where(mask | ~any_legal, logits, BIG_NEG)
    value_ref[:] = value


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_masked_forward(params, obs, mask, interpret: bool = False):
    """(params, int32 obs[B, 297], bool mask[B, 45]) ->
    (masked logits[B, 45] f32, value[B] f32) in one pallas kernel.

    B is padded up to a TILE_B multiple internally.
    """
    B = obs.shape[0]
    padded = pl.cdiv(B, TILE_B) * TILE_B
    if padded != B:
        obs = jnp.pad(obs, ((0, padded - B), (0, 0)))
        mask = jnp.pad(mask, ((0, padded - B), (0, 0)))

    a, c = params["actor"], params["critic"]
    weights = [a[0]["w"], a[0]["b"], a[1]["w"], a[1]["b"], a[2]["w"], a[2]["b"],
               c[0]["w"], c[0]["b"], c[1]["w"], c[1]["b"], c[2]["w"], c[2]["b"]]

    def wspec(x):
        # Whole-array block, constant index map: stays VMEM-resident.
        return pl.BlockSpec(x.shape, lambda i: (0,) * x.ndim, memory_space=pltpu.VMEM)

    grid = (padded // TILE_B,)
    logits, value = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_B, OBS_DIM), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, ACT_DIM), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *[wspec(w) for w in weights],
        ],
        out_specs=[
            pl.BlockSpec((TILE_B, ACT_DIM), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((padded, ACT_DIM), jnp.float32),
            jax.ShapeDtypeStruct((padded, 1), jnp.float32),
        ],
        interpret=interpret,
    )(obs, mask, *weights)
    return logits[:B], value[:B, 0]


def reference_masked_forward(params, obs, mask):
    """The unfused XLA path with identical semantics (for tests/benches)."""
    from ..models import actor_critic as ac

    logits, value = ac.forward(params, obs)
    return ac.masked_logits(logits, mask), value
