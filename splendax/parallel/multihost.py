"""Multi-host initialization for pod-slice training.

The reference has no distributed machinery at all (SURVEY.md §2.7); this is
the TPU-native scale-out entry point.  On a pod slice every host runs the
same program: call `init_multihost()` first, then build the global mesh with
`global_mesh()` — all shardings in `splendax.parallel.mesh` are global-view
(GSPMD), so nothing else changes: `jax.jit(update_step)` on every host, XLA
rides ICI for intra-slice collectives and DCN across slices.

Single-host (including this image's one tunneled chip and the virtual-CPU
test mesh) is a no-op fast path, so the same training script runs anywhere.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed iff running under a multi-host launcher.

    Detection: explicit args, or standard cluster env (TPU pod metadata,
    `JAX_COORDINATOR_ADDRESS`).  Returns True if distributed was initialized.
    """
    explicit = coordinator_address is not None
    # TPU_WORKER_HOSTNAMES indicates a pod slice only when it lists MORE THAN
    # ONE host — single-host images (e.g. the tunneled axon plugin here) export
    # it as just "localhost".
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    has_env = bool(os.environ.get("JAX_COORDINATOR_ADDRESS")
                   or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
                   or ("," in workers))
    if not (explicit or has_env):
        return False  # single-host: nothing to do
    # NOTE: must not query the backend (jax.devices()/process_count()) before
    # initializing — that would pin the non-distributed runtime first.
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # idempotence: train() re-enters after a launcher
        if "once" not in str(e) and "already" not in str(e).lower():
            raise
    return True


def global_mesh(dp: Optional[int] = None, tp: int = 1):
    """Build a dp x tp mesh over ALL devices across hosts (global view)."""
    from .mesh import make_mesh

    n = jax.device_count()
    if dp is None:
        dp = n // tp
    return make_mesh(dp=dp, tp=tp, devices=jax.devices())


def is_coordinator() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
