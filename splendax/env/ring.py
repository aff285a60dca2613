"""Fresh-game ring: amortized autoreset for lockstep batches.

The naive autoreset (`core.step_autoreset`) generates a fresh game for EVERY
lane on EVERY step and keeps it only where `done` — but only ~0.5-4% of lanes
finish per step, and fresh-game generation (four batched permutation sorts
per lane, reference semantics `state.py:181-211`) plus the full-tree select
costs ~1.6 ms of the ~5.7 ms step body at batch 32768 on v5e.

This module pre-generates a ring of R fresh games ONCE (one batched reset,
amortized over a whole rollout scan) and lets the step consume them with
static-shaped gathers:

    ring = make_ring(key, size)                       # before the scan
    state, out, obs, mask, ring = step_autoreset_ring(state, action, ring)
    ... (ring threaded through the scan carry; ptr advances by #done)

Each consumed entry is a distinct threefry-seeded fresh game, so semantics
match `step_autoreset` exactly up to which RNG stream seeds the new game.
If a rollout consumes more than `size` games the ring wraps and entries are
reused (identical fresh deck order, divergent play); size the ring at
~2x the expected consumption `T * B / avg_game_plies` to keep reuse at zero.

TPU implementation notes (all measured in-scan on v5e, batch 32768):
  * `jnp.cumsum` over the [B] done vector lowers horribly (~1.4 ms); the
    done-lane ranks come from an exclusive prefix-sum built out of two
    strictly-triangular matmuls instead (MXU-friendly, integer-exact in f32).
  * Per-leaf gathers over a 19-leaf state pytree pay a fixed per-op cost;
    the ring stores each fresh game's VARIABLE content packed into a single
    row, so `take` is ONE [B, K] gather.
  * Selecting gathered rows into the carry costs ~1 ms of serial tail, but
    selecting from scan-INVARIANT values is fused for free — and a fresh
    game is almost entirely constant.  Only `deck_perm`, `board` and
    `noble_ids` depend on the deal (the initial legality mask does not:
    with zero tokens no card is affordable, and all take/reserve actions
    are legal — asserted in tests/test_ring.py).  The other 15 state
    fields are picked from broadcast blank-state constants.
  * The 297-dim fresh observation is NOT stored or gathered: the carried
    observation is re-encoded from the selected carry state
    (`encode(where(done, fresh, next)) == where(done, encode(fresh),
    encode(next))` since encode is a pure per-game function).  One extra
    full-batch encode (~0.05 ms) replaces gathering+selecting a [B, 297]
    int32 payload (~69 % of the old ring row).
  * Packed rows are int8 — every variable field is a card/noble id in
    [-1, 89] — quartering gather bandwidth vs int32.
  Net effect: ring overhead dropped from ~0.74 ms/step to well under the
  step body at batch 32768 (see docs/PERF.md).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..engine import data as D
from ..engine.types import GameState, _blank_state_np

OBS_DIM = 297
ACT_DIM = 45

# The only GameState fields that vary between fresh games (the deal).
_VAR_FIELDS = (("deck_perm", (3, D.MAX_DECK)), ("board", (3, 4)), ("noble_ids", (3,)))
_VAR_SIZES = [int(np.prod(s)) for _, s in _VAR_FIELDS]
PACKED_WIDTH = sum(_VAR_SIZES)


def _pack(state: GameState) -> jnp.ndarray:
    """Variable leaves [R, ...] -> one int8 matrix [R, PACKED_WIDTH].

    int8 is exact: every packed value is a card id (0..89), noble id (0..9)
    or the -1 empty sentinel."""
    R = state.noble_ids.shape[0]
    parts = [getattr(state, name).reshape(R, -1) for name, _ in _VAR_FIELDS]
    return jnp.concatenate(parts, axis=1).astype(jnp.int8)


def _constant_fields(B: int) -> dict:
    """Deal-independent fresh-game fields, broadcast to [B, ...].

    These are scan-invariant constants — selecting against them fuses into
    the step for free (unlike selects against gathered data)."""
    blank = _blank_state_np()
    blank["deck_count"] = np.asarray(D.TIER_SIZES, np.int32) - 4  # 4 dealt/tier
    var = {name for name, _ in _VAR_FIELDS}
    return {
        k: jnp.broadcast_to(jnp.asarray(v), (B,) + np.shape(v))
        for k, v in blank.items()
        if k not in var
    }


def _exclusive_prefix_count(done: jnp.ndarray) -> jnp.ndarray:
    """Exclusive prefix-sum of a 0/1 vector via strictly-upper-triangular
    matmuls (jnp.cumsum over [32768] costs ~1.4 ms on v5e; this is ~µs).
    Integer-exact in f32 for B < 2^24."""
    B = done.shape[0]
    C = min(128, B)
    R = -(-B // C)  # ceil
    x = jnp.zeros(R * C, jnp.float32).at[:B].set(done.astype(jnp.float32))
    x = x.reshape(R, C)
    within = x @ jnp.triu(jnp.ones((C, C), jnp.float32), 1)  # exclusive, per row
    row_sums = x.sum(axis=1)
    row_off = row_sums @ jnp.triu(jnp.ones((R, R), jnp.float32), 1)
    rank = within + row_off[:, None]
    return rank.reshape(R * C)[:B].astype(jnp.int32)


# Max fresh games consumed per step through the fast window path (see
# `take`): done lanes take CONSECUTIVE ring entries, so instead of a gather
# from the full [R, W] ring (~59 MB at bench size; measured 106 µs + 21 µs
# layout copy = 22% of the step body) the step dynamic-slices a contiguous
# _WINDOW-row block at ptr and gathers from that ~1 MB source — measured
# +10% end-to-end on the v5e bench (47.6M vs 43.3M steps/s interleaved).
# A lax.cond fallback to the exact full gather on overflow steps was
# measured SLOWER than the legacy path it was guarding (the conditional
# serializes the scan body; 40.4M vs 43.2M) — instead overflow lanes clamp
# to the last window row (a valid fresh game, possibly duplicating another
# lane's deal) and are COUNTED in `ring.overflow` so callers can assert the
# fast path stayed exact.  Overflow requires > _WINDOW lanes finishing in
# ONE step: impossible when the step batch B <= window (the trainer's case),
# and ~12% of all lanes simultaneously at the bench's B=32768 (steady-state
# done rate is ~1%; measured overflow over 2000 bench steps: 0).
_WINDOW = 4096


@struct.dataclass
class FreshGameRing:
    """R pre-generated fresh games (packed variable rows) + consumption ptr.

    `packed` carries `window` extra rows mirroring rows [0, window) so the
    sliding consumption window never needs a modulo wrap; `size` is the
    logical ring length R (static: ring sizes are compile-time constants).
    """

    packed: jnp.ndarray  # int8[R + window, PACKED_WIDTH]: deck_perm|board|nobles
    mask0: jnp.ndarray  # bool[45], the (deal-independent) initial legal mask
    ptr: jnp.ndarray  # [] int32, next entry to consume
    overflow: jnp.ndarray  # [] int32, lanes ever clamped by the window path
    size: int = struct.field(pytree_node=False)  # logical R

    @property
    def window(self) -> int:
        return self.packed.shape[0] - self.size

    # Unpacked views (tests / inspection; not stored).
    @property
    def state(self) -> GameState:
        return _unpack_state(self.packed[: self.size])

    @property
    def obs(self) -> jnp.ndarray:
        import jax

        from ..engine.encode import encode_observation

        return jax.vmap(encode_observation)(self.state)

    @property
    def mask(self) -> jnp.ndarray:
        return jnp.broadcast_to(self.mask0, (self.size, ACT_DIM))


def _unpack_state(rows: jnp.ndarray) -> GameState:
    """[B, PACKED_WIDTH] -> GameState [B, ...] (constants + variable slices)."""
    B = rows.shape[0]
    fields = dict(_constant_fields(B))
    off = 0
    for (name, shape), size in zip(_VAR_FIELDS, _VAR_SIZES):
        fields[name] = (
            rows[:, off : off + size].reshape((B,) + shape).astype(jnp.int32)
        )
        off += size
    return GameState(**fields)


def make_ring(key: jnp.ndarray, size: int, window: int = _WINDOW) -> FreshGameRing:
    """One batched reset -> a ring of `size` independent fresh games.

    `window` bounds the fast consumption path in `take` (rows [0, window)
    are mirrored after the ring so the sliding window never wraps); pass
    window=0 to force the legacy full-ring gather on every step.
    """
    from . import core

    state, _obs, mask = jax.vmap(core.reset)(jax.random.split(key, size))
    packed = _pack(state)
    w = min(window, size)
    if w:
        packed = jnp.concatenate([packed, packed[:w]], axis=0)
    return FreshGameRing(
        packed=packed,
        mask0=mask[0],
        ptr=jnp.int32(0),
        overflow=jnp.int32(0),
        size=size,
    )


def take(ring: FreshGameRing, done: jnp.ndarray):
    """Hand each done lane the next unconsumed fresh game.

    Done lanes receive CONSECUTIVE ring entries (lane with done-rank r gets
    entry (ptr + r) mod size); non-done lanes receive an arbitrary row as a
    placeholder — callers select with `where(done, fresh, current)` and
    re-encode the observation from the selected carry (module docstring).

    Fast path (window > 0): one contiguous dynamic-slice of `ring.window`
    rows at ptr + a gather from that small block (the mirrored tail makes
    wraparound implicit).  Exact whenever <= window lanes finish this step —
    always true when the batch size <= window; beyond that, overflow lanes
    clamp to the window's last entry and `ring.overflow` counts them (see
    the _WINDOW comment for why this beats an exact lax.cond fallback).
    """
    B = done.shape[0]
    rank = _exclusive_prefix_count(done)
    W = ring.window
    n_done = done.sum().astype(jnp.int32)

    if W == 0:  # legacy exact path (measured 10% slower at bench size)
        idx = jnp.where(done, (ring.ptr + rank) % ring.size, 0)
        rows = ring.packed[idx]
        clamped = jnp.int32(0)
    else:
        # (A pallas slab kernel for this lookup — ops/ring_take.py — beats
        # the row gather in isolation but collapses the fused step 3x when
        # placed inside the scan body; see docs/PERF.md anti-optimizations.)
        win = jax.lax.dynamic_slice(
            ring.packed, (ring.ptr, jnp.int32(0)), (W, PACKED_WIDTH)
        )
        rows = win[jnp.minimum(rank, W - 1)]
        clamped = jnp.maximum(n_done - W, 0)
    fresh_state = _unpack_state(rows)
    fresh_mask = jnp.broadcast_to(ring.mask0, (B, ACT_DIM))
    new_ring = ring.replace(
        ptr=(ring.ptr + n_done) % ring.size, overflow=ring.overflow + clamped
    )
    return fresh_state, fresh_mask, new_ring


@partial(jax.jit, static_argnames=("rng_mode",))
def step_autoreset_ring(
    state: GameState,
    action: jnp.ndarray,
    ring: FreshGameRing,
    rng_mode: str = "fast",
    mask=None,
):
    """`core.step_autoreset` semantics with ring-amortized resets.

    Returns (carry_state, out, obs_next, mask_next, ring) — `out` keeps the
    terminal observation/reward/final_rewards for the lane, while the carried
    state/obs/mask become the consumed fresh game where done.
    """
    from . import core
    from ..engine import rules
    from ..engine.encode import encode_observation

    B = action.shape[0]
    if mask is None:
        next_state, fields = jax.vmap(partial(core.step_core, rng_mode=rng_mode))(
            state, action
        )
    else:
        next_state, fields = jax.vmap(
            lambda s, a, m: core.step_core(s, a, rng_mode=rng_mode, mask=m)
        )(state, action, mask)

    done = fields["terminated"]
    fresh_state, _fresh_mask, ring = take(ring, done)

    def pick(fresh, cur):
        d = done.reshape((B,) + (1,) * (cur.ndim - 1))
        return jnp.where(d, fresh, cur)

    carry = jax.tree.map(pick, fresh_state, next_state)
    # ONE encode + ONE mask build per step, both on the post-reset carry:
    #   * live lanes: carry == next_state, so encode(carry) == encode(next)
    #     and legal_mask(carry) == legal_mask(next) exactly;
    #   * done lanes: carry == fresh game, giving the reset obs/mask.
    # out.obs (the terminal observation) is still encoded from next_state for
    # API parity, but nothing in the hot training/bench loop consumes it, so
    # XLA dead-code-eliminates that second encode.
    obs_next = jax.vmap(encode_observation)(carry)
    mask_next = jax.vmap(rules.legal_mask)(carry)
    out = core.StepOutput(
        obs=jax.vmap(encode_observation)(next_state),
        action_mask=jnp.where(done[:, None], False, mask_next),
        **fields,
    )
    return carry, out, obs_next, mask_next, ring
