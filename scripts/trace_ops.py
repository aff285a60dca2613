"""Summarize device-side HLO op costs from a jax.profiler trace directory.

Usage: python scripts/trace_ops.py /tmp/envtrace [top_n]

Parses the xplane.pb directly (the installed tensorboard-plugin-profile is
version-incompatible with this image's TF) and prints per-op total device
time, sorted, plus the device-plane total — the methodology behind the
measurements in docs/PERF.md.
"""

from __future__ import annotations

import collections
import glob
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore


def summarize(trace_dir: str, top_n: int = 25):
    paths = glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb")
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        per_op = collections.Counter()
        total_ps = 0
        for line in plane.lines:
            # XLA Ops lines carry the per-HLO timing; skip step/module lines.
            if "XLA Ops" not in line.name and "XLA TraceMe" not in line.name:
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                per_op[name] += ev.duration_ps
                total_ps += ev.duration_ps
        if not per_op:
            continue
        print(f"== plane: {plane.name}  total {total_ps/1e9:.3f} ms")
        for name, ps in per_op.most_common(top_n):
            print(f"  {ps/1e9:9.3f} ms  {100*ps/total_ps:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    summarize(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 25)
