#!/usr/bin/env python
"""Categorize device time in a jax.profiler chrome trace.

Answers "where does the step go" at the XLA-op level — convolutions (MXU)
vs elementwise fusions (VPU/HBM) vs copies — including each category's
HBM bytes_accessed and achieved bandwidth, the measurement behind the
design doc's MXU-floor decomposition (docs/design.md §6).  Uses the
``hlo_category`` / ``bytes_accessed`` annotations the TPU profiler attaches
to device op events (host-side events carry neither and are excluded).

Usage:
  python tools/trace_breakdown.py <logdir-or-trace.json.gz>
      [--top 15] [--hbm-gbps 819]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re


def find_trace(path):
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(
        path, "plugins", "profile", "*", "*.trace.json.gz")))
    if not hits:
        raise SystemExit(f"no trace.json.gz under {path}")
    return hits[-1]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("path")
    p.add_argument("--top", type=int, default=15)
    p.add_argument("--hbm-gbps", type=float, default=819.0,
                   help="HBM bandwidth for the traffic-floor column "
                        "(v5e: 819 GB/s)")
    args = p.parse_args()

    trace = find_trace(args.path)
    with gzip.open(trace, "rt") as f:
        events = json.load(f)["traceEvents"]

    cat_us = collections.Counter()
    cat_bytes = collections.Counter()
    op_us = collections.Counter()
    op_bytes = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        a = e.get("args") or {}
        cat = a.get("hlo_category")
        if not cat:  # host-side / umbrella event
            continue
        dur = float(e["dur"])
        nbytes = int(a.get("bytes_accessed", 0) or 0)
        total += dur
        cat_us[cat] += dur
        cat_bytes[cat] += nbytes
        key = re.sub(r"[.\d]+$", "", e.get("name", "?")) or "?"
        op_us[f"{cat} :: {key}"] += dur
        op_bytes[f"{cat} :: {key}"] += nbytes

    if total == 0:
        raise SystemExit("no hlo_category-annotated device events found")
    bw = args.hbm_gbps * 1e9
    print(f"trace: {trace}")
    print(f"total device-op time: {total / 1e3:.2f} ms")
    print(f"\nby hlo_category (floor = bytes_accessed / {args.hbm_gbps:.0f}"
          f" GB/s; achieved column is that traffic's realized bandwidth):")
    for cat, us in cat_us.most_common():
        gb = cat_bytes[cat] / 1e9
        floor_ms = cat_bytes[cat] / bw * 1e3
        ach = (cat_bytes[cat] / (us / 1e6)) / 1e9 if us else 0.0
        print(f"  {cat:>24}: {us / 1e3:9.2f} ms ({us / total * 100:5.1f}%)"
              f"  {gb:8.2f} GB  floor {floor_ms:8.2f} ms"
              f"  achieved {ach:6.0f} GB/s")
    print(f"\ntop {args.top} op groups:")
    for name, us in op_us.most_common(args.top):
        gb = op_bytes[name] / 1e9
        print(f"  {us / 1e3:9.2f} ms  {gb:7.2f} GB  {name[:80]}")


if __name__ == "__main__":
    main()
