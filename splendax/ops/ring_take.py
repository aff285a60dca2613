"""Pallas TPU kernel: monotone-rank ring-row consumption.

The fresh-game ring hands done lanes CONSECUTIVE entries, so the per-lane
row lookup `rows[i] = window[rank[i]]` has monotone indices that increment
by at most 1 per lane: within any 128-lane block the needed rows span <=129
consecutive window rows.  This kernel keeps the whole consumption window
VMEM-resident and, per block, dynamic-slices one contiguous slab and selects
per-lane rows with a tiny [128, SLAB] x [SLAB, WIDTH] one-hot MXU matmul —
no HBM row gather at all.

MEASURED OUTCOME (v5e, batch 32768; docs/PERF.md): the kernel beats the XLA
row gather in ISOLATION — 205.7 vs 241.3 µs/iter in a dedicated scan — but
wired into the real env step it collapsed end-to-end throughput 3x (14.7M
vs 48.5M env-steps/s, bit-identical outputs): inside the fused step body a
pallas_call is a scheduling island XLA cannot fuse or overlap with the
surrounding program.  It is therefore NOT wired into `env.ring.take`; it is
kept (with its interpret-mode parity test) as the measured record of that
boundary.  An equivalent pure-XLA slab formulation also lost (38.7M — XLA
materializes the [nb, SLAB, WIDTH] slab tensor in HBM).

Exactness contract matches `splendax.env.ring.take`: exact whenever
`max(rank) <= W` (the window bound); callers clamp rank and count overflow.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_B = 128  # lanes per grid block
SLAB = TILE_B + 8  # slab rows per block: >= TILE_B + 1, sublane-padded


def _kernel(block_base_ref, local_ref, win_ref, out_ref):
    b = pl.program_id(0)
    base = pl.multiple_of(block_base_ref[b], 8)  # aligned by the caller
    slab = win_ref[pl.ds(base, SLAB), :].astype(jnp.float32)  # [SLAB, width]
    local = local_ref[b, :]  # [TILE_B], values in [0, SLAB)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_B, SLAB), 1) == local[:, None]
    ).astype(jnp.float32)
    rows = jnp.dot(onehot, slab, preferred_element_type=jnp.float32)
    out_ref[:] = rows.astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def slab_take_rows(win: jnp.ndarray, rank: jnp.ndarray, interpret: bool = False):
    """rows[i] = win[rank[i]] for monotone int32 `rank` (increments <= 1).

    win: int8[W + SLAB, width] — the ring's consumption window plus SLAB
         slack rows so every block's slab slice stays in bounds.
    rank: int32[B] with B % TILE_B == 0 and max(rank) <= W.
    Values must be int8-exact small ints (they are card/noble ids) — the
    one-hot select runs through an f32 MXU matmul.
    """
    B = rank.shape[0]
    nb = B // TILE_B
    # Slab starts are aligned DOWN to a sublane multiple (Mosaic requires a
    # provably 8-aligned dynamic-slice start); the <=7-row offset lands in
    # the slab's 8 slack rows, so local stays in [0, SLAB).
    block_base = (rank[::TILE_B] // 8) * 8  # [nb]
    local = (rank - jnp.repeat(block_base, TILE_B)).reshape(nb, TILE_B)
    local_shape = (nb, TILE_B)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # block_base lands in SMEM for pl.ds
        grid=(nb,),
        in_specs=[
            # Whole-array blocks (constant index maps): `local` (~128 KB) and
            # the window stay VMEM-resident across the grid; per-block rows
            # are read in-kernel by program_id (a (1, TILE_B) block would
            # violate the 8-sublane block-shape rule).
            pl.BlockSpec(local_shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(win.shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_B, win.shape[1]), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, win.shape[1]), jnp.int8),
        interpret=interpret,
    )(block_base, local, win)
