"""Standalone repro for the in-process compile-accumulation SIGABRT.

docs/DEFECTS.md (second addendum): a single-process full-suite run aborts
inside XLA:CPU's LLVM JIT (`backend_compile_and_load`) while compiling the
first LARGE program after ~125 accumulated test compilations; no <=7-file
subset reproduces it.  The standing mitigation is pytest-xdist sharding
(`-n 2 --dist loadfile`).  This script replaces "needs the accumulated
compile state of the whole suite" with a deterministic one-process loop:

    python scripts/repro_compile_abort.py --max 300

compiles up to --max DISTINCT suite-shaped programs (the 100-turn eval
scan of eval/suite._play_matches at a different n_games each iteration, so
every compile is fresh) in ONE process, logging iteration count and RSS
after each, until the process dies or the cap is reached.  A crash at
iteration K is the repro (the driver prints the last completed iteration);
a clean run at 3x the suite's compile count falsifies the "compile COUNT"
hypothesis and points at program diversity instead (--mix interleaves
eval scans, gumbel searches and distill epochs to test that).

Outcome (measured r4, this image): CRASH REPRODUCED at iteration 68 of
eval-scan-only compiles — a storm of `LLVM compilation error: Cannot
allocate memory` (xla/backends/cpu/codegen execution_engine.cc:54)
followed by SIGSEGV, with process RSS only ~3.1 GB and ~100 GB system RAM
free: the faulting layer is LLVM ORC JIT **code-region allocation**, not
system memory — every jitted executable's machine code stays resident for
process lifetime, and enough large distinct programs exhaust the region.
See docs/DEFECTS.md "Compile-accumulation crash: root cause".

Flags: --mix (diverse program kinds), --no-cache (disable the persistent
compile cache), --rss-limit-mb (stop early if RSS exceeds the limit —
distinguishes OOM-kill from the LLVM abort).
"""

from __future__ import annotations

import argparse
import os
import resource
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Same platform setup as tests/conftest.py: 8 virtual CPU devices.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--max", type=int, default=300,
                    help="distinct programs to compile before declaring "
                         "no-repro (suite crash point was ~125)")
    ap.add_argument("--mix", action="store_true",
                    help="interleave program KINDS (eval scan / gumbel "
                         "search / distill epoch) instead of eval-scan-only")
    ap.add_argument("--no-cache", action="store_true",
                    help="disable the persistent compile cache (the suite "
                         "crash reproduced with AND without it)")
    ap.add_argument("--rss-limit-mb", type=float, default=16384.0)
    ap.add_argument("--clear-every", type=int, default=0,
                    help="call jax.clear_caches() every N iterations — "
                         "tests whether dropping live executables releases "
                         "LLVM JIT code memory (the measured crash cause)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    if not args.no_cache:
        from splendax.utils.cache import host_fingerprint

        jax.config.update(
            "jax_compilation_cache_dir",
            f"/tmp/jax_repro_cache-{host_fingerprint()}",
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp  # noqa: F401

    from splendax.eval import suite
    from splendax.models.actor_critic import init_params

    params = init_params(jax.random.PRNGKey(0), hidden=64)

    def compile_eval_scan(i: int):
        # The crashing program shape: a full 100-turn _play_matches scan.
        # n_games differs each call -> every compile is fresh.
        res = suite.eval_vs_opponent(
            suite.model_greedy_policy(params),
            suite.heuristic_policy("random"),
            n_games=8 + i,
            seed=i,
        )
        return res["n"]

    def compile_gumbel(i: int):
        from splendax.env import core
        from splendax.search import gumbel_search_policy

        fn, _ = gumbel_search_policy(m=4, k0=2, horizon=2, params=params)
        state, obs, mask = jax.vmap(core.reset)(
            jax.random.split(jax.random.PRNGKey(i), 4 + i)
        )
        a = jax.jit(fn)(params, obs, mask, state, jax.random.PRNGKey(i))
        return int(jax.device_get(a)[0])

    def compile_distill_epoch(i: int):
        import numpy as np

        from splendax.train import distill

        n = 64 + 8 * i  # fresh shape per call
        rng = np.random.default_rng(i)
        data = {
            "obs": rng.integers(0, 5, (n, 297)).astype(np.int32),
            "mask": np.ones((n, 45), bool),
            "q": rng.normal(size=(n, 45)).astype(np.float32),
            "logits": rng.normal(size=(n, 45)).astype(np.float32),
            "action": rng.integers(0, 45, n).astype(np.int32),
            "z": rng.normal(size=n).astype(np.float32),
            "weight": np.ones(n, np.float32),
        }
        new_params, hist = distill.distill_fit(
            params, data, epochs=1, minibatch=32, verbose=False
        )
        return hist[0]["loss"]

    kinds = [compile_eval_scan]
    if args.mix:
        kinds = [compile_eval_scan, compile_gumbel, compile_distill_epoch]

    print(f"[repro] starting: max={args.max} mix={args.mix} "
          f"no_cache={args.no_cache} pid={os.getpid()}", flush=True)
    for i in range(args.max):
        fn = kinds[i % len(kinds)]
        fn(i)
        print(f"[repro] iter {i} ok ({fn.__name__}) rss={rss_mb():.0f}MB",
              flush=True)
        if args.clear_every and (i + 1) % args.clear_every == 0:
            jax.clear_caches()
            print(f"[repro] cleared jax caches at iter {i}", flush=True)
        if rss_mb() > args.rss_limit_mb:
            print(f"[repro] RSS limit hit at iter {i} — stopping (looks like "
                  "memory growth, not the LLVM abort)", flush=True)
            return
    print(f"[repro] completed {args.max} fresh compiles without crashing — "
          "compile COUNT alone does not reproduce; see DEFECTS.md", flush=True)


if __name__ == "__main__":
    main()
