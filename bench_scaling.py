"""Multi-device scaling bench: env-fleet throughput vs mesh size.

Runs the full env pipeline (mask+sample+step+encode+autoreset) with the game
batch dp-sharded over 1..N devices and reports weak-scaling efficiency
(north-star metric #2: >= 85% from 1 to N devices).  On this image real
multi-chip hardware is unavailable, so the default run uses N virtual CPU
devices (`--xla_force_host_platform_device_count`); on a real pod slice the
same script measures ICI scaling.

Usage: python bench_scaling.py [--devices 8] [--batch-per-device 4096]
Prints one JSON line per mesh size plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--batch-per-device", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--platform", default="cpu",
                    help="'cpu' (default: N virtual devices on this single-"
                         "chip image) or a real multi-chip platform name")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices}"
    )
    import jax

    from splendax.utils.sync import sync

    # Pin the platform BEFORE any backend initialization (jax.devices()).
    # NOTE: this image exports JAX_PLATFORMS=axon globally, and the axon
    # plugin ignores the env var anyway — the config update is authoritative.
    from splendax.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import splendax as sx

    devices = jax.devices()[: args.devices]
    results = {}
    for ndev in sorted({1, 2, len(devices)}):
        B = args.batch_per_device * ndev
        mesh = Mesh(devices[:ndev], axis_names=("dp",))

        def shard(x):
            return jax.device_put(
                x, NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1))))
            )

        key = jax.random.PRNGKey(0)
        states, obs, masks = sx.reset_batch(jax.random.split(key, B))
        states = jax.tree.map(shard, states)
        masks = shard(masks)

        @jax.jit
        def rollout(key, states, masks):
            def body(c, k):
                s, m = c
                ka, kr = jax.random.split(k)
                a = jax.random.categorical(ka, jnp.where(m, 0.0, -1e9)).astype(jnp.int32)
                s, out, on, mn = sx.step_autoreset(s, a, kr, mask=m)
                return (s, mn), None
            return jax.lax.scan(body, (states, masks), jax.random.split(key, args.steps))[0]

        out = rollout(key, states, masks)
        sync(out[1])
        t0 = time.time()
        reps = 3
        for i in range(reps):
            out = rollout(jax.random.fold_in(key, i), *out)
        sync(out[1])
        sps = B * args.steps * reps / (time.time() - t0)
        results[ndev] = sps
        print(json.dumps({"devices": ndev, "batch": B,
                          "steps_per_sec": round(sps, 1)}))

    n_max = max(results)
    eff = results[n_max] / (results[1] * n_max)
    # On virtual CPU devices all "devices" share one host's cores, so weak
    # scaling is meaningless (the 1-device run already uses every core).
    # There, the meaningful number is SHARDING OVERHEAD: same total batch,
    # dp-sharded over N virtual devices vs unsharded on one.
    B = args.batch_per_device * n_max
    mesh1 = Mesh(devices[:1], axis_names=("dp",))
    key = jax.random.PRNGKey(0)
    states, obs, masks = sx.reset_batch(jax.random.split(key, B))

    @jax.jit
    def rollout(key, states, masks):
        def body(c, k):
            s, m = c
            ka, kr = jax.random.split(k)
            a = jax.random.categorical(ka, jnp.where(m, 0.0, -1e9)).astype(jnp.int32)
            s, out, on, mn = sx.step_autoreset(s, a, kr, mask=m)
            return (s, mn), None
        return jax.lax.scan(body, (states, masks), jax.random.split(key, args.steps))[0]

    out = rollout(key, states, masks)
    sync(out[1])
    t0 = time.time()
    for i in range(3):
        out = rollout(jax.random.fold_in(key, i), *out)
    sync(out[1])
    unsharded = B * args.steps * 3 / (time.time() - t0)

    print(json.dumps({
        "metric": "weak_scaling_efficiency",
        "devices": n_max,
        "value": round(eff, 3),
        "sharding_overhead_ratio": round(results[n_max] / unsharded, 3),
        "unsharded_same_batch_sps": round(unsharded, 1),
        "per_device_batch": args.batch_per_device,
        "platform": jax.default_backend(),
        "note": ("virtual CPU devices share one host's cores; weak-scaling "
                 "efficiency is only meaningful on a real multi-chip slice"
                 if jax.default_backend() == "cpu" else ""),
    }))
    sys.exit(0)


if __name__ == "__main__":
    main()
