"""Driver-interface guard: bench.py must keep producing its JSON contract.

The driver runs `python bench.py` on real TPU hardware after every round and
records the single JSON line; this smoke runs the same code path on a tiny
CPU batch so a refactor can't silently break the entry point.
"""

import json
import subprocess
import sys

import bench


def test_bench_env_steps_tiny():
    r = bench.bench_env_steps(batch=32, steps=4, reps=1)
    assert r["steps_per_sec"] > 0
    assert r["batch"] == 32
    # naive path stays alive too (--naive-reset escape hatch)
    r2 = bench.bench_env_steps(batch=32, steps=4, reps=1, naive=True)
    assert r2["steps_per_sec"] > 0


def test_bench_cli_prints_one_json_line(tmp_path):
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "import bench; bench.BASELINE_STEPS_PER_SEC = 6000.0;"
         "import functools; bench.bench_env_steps = functools.partial("
         "bench.bench_env_steps, batch=32, steps=4, reps=1);"
         "bench.main()"],
        capture_output=True, text=True, timeout=300, cwd=".",
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, out.stdout + out.stderr
    payload = json.loads(lines[0])
    assert payload["metric"] == "env_steps_per_sec_per_chip"
    assert set(payload) >= {"metric", "value", "unit", "vs_baseline"}
