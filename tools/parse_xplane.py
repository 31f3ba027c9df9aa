"""Summarize a jax.profiler trace (.xplane.pb) from tools/profile_forward.py.

Aggregates device-plane op durations and prints the top ops plus the
per-iteration wall time, so perf regressions can be attributed without
TensorBoard (replacement for the reference's tfprof dump, DCSCN.py:453-468).

    python tools/parse_xplane.py tf_log/profile [--top 20]
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import sys


def load_xspace(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        raise SystemExit("no .xplane.pb under %s" % trace_dir)
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    return xspace, paths[-1]


def summarize(xspace, top: int = 20):
    out = {}
    device_planes = [p for p in xspace.planes
                     if "TPU" in p.name or "/device:" in p.name]
    if not device_planes:  # CPU-only traces: fall back to the host plane
        device_planes = [p for p in xspace.planes if p.name == "/host:CPU"]
    for plane in device_planes:
        ev_names = {k: v for k, v in plane.event_metadata.items()}
        durs = collections.defaultdict(float)
        counts = collections.defaultdict(int)
        t_min, t_max = float("inf"), 0.0
        for line in plane.lines:
            for ev in line.events:
                name = ev_names[ev.metadata_id].name
                dur = ev.duration_ps / 1e9  # ms
                durs[name] += dur
                counts[name] += 1
                t0 = (line.timestamp_ns + ev.offset_ps / 1e3) / 1e6  # ms
                t_min = min(t_min, t0)
                t_max = max(t_max, t0 + dur)
        ranked = sorted(durs.items(), key=lambda kv: -kv[1])[:top]
        out[plane.name] = {
            "span_ms": round(t_max - t_min, 3) if durs else 0.0,
            "total_op_ms": round(sum(durs.values()), 3),
            "top_ops": [
                {"name": n[:120], "ms": round(d, 3), "n": counts[n]}
                for n, d in ranked
            ],
        }
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--json", action="store_true", help="print raw JSON only")
    args = ap.parse_args(argv)

    xspace, path = load_xspace(args.trace_dir)
    summary = summarize(xspace, args.top)
    if args.json:
        print(json.dumps({"trace": path, "planes": summary}))
        return
    print("trace:", path, file=sys.stderr)
    for plane, info in summary.items():
        print("== %s  (span %.1f ms, op-sum %.1f ms)"
              % (plane, info["span_ms"], info["total_op_ms"]))
        for op in info["top_ops"]:
            print("  %9.3f ms  x%-4d %s" % (op["ms"], op["n"], op["name"]))


if __name__ == "__main__":
    main()
