"""Robust device synchronization for wall-clock timing.

The tunneled `axon` TPU plugin on this image implements
`jax.block_until_ready` as a no-op (calls return in ~100 µs while the
computation is still in flight on the remote chip), which silently turns any
`time() ... block_until_ready() ... time()` measurement into a dispatch-rate
measurement — observed as a bogus 20.7B env-steps/s bench run.  Host
transfers DO block correctly, so the reliable barrier is pulling a few bytes
of the computation's output to the host.

`sync(tree)` costs one tunnel round-trip (~23 ms on this image — the same
fixed per-dispatch overhead every real consumer of a result pays), so timed
regions should amortize it over long `lax.scan`s exactly as they already
amortize dispatch overhead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def sync(tree) -> None:
    """Block until every array in `tree` is actually computed.

    Works even where `jax.block_until_ready` is a no-op (tunneled backends):
    a full reduction of every leaf is folded into ONE tiny device program
    whose output is pulled to the host — the data dependency forces
    completion of every program that produced a leaf, at the cost of one
    round-trip total (not one per leaf).  The probe reduces over ALL
    elements (not just element 0) so that every shard of a multi-device
    sharded array is a dependency — a one-element probe would only barrier
    the device holding that element.
    """
    jax.block_until_ready(tree)  # correct (and sufficient) on honest backends
    leaves = [x for x in jax.tree.leaves(tree) if isinstance(x, jax.Array)]
    if not leaves:
        return
    probe = jnp.stack([jnp.sum(x, dtype=jnp.float32) for x in leaves])
    np.asarray(jax.device_get(probe))
