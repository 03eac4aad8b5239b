#!/usr/bin/env python
"""Categorize device time in a jax.profiler chrome trace.

Answers "where does the step go" at the XLA-op level: convolutions/matmuls
(MXU) vs elementwise fusions (VPU/HBM) vs copies vs loop overhead — the
measurement behind the design doc's MXU-floor decomposition
(docs/design.md §6).  Works on any ``<logdir>/plugins/profile/*/
*.trace.json.gz`` produced by ``train.py --profile-steps N``.

Usage:
  python tools/trace_breakdown.py <logdir-or-trace.json.gz> [--top 15]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re

CATEGORIES = [
    ("conv/matmul", re.compile(r"^(%?)(convolution|dot|cudnn|conv)", re.I)),
    ("while-loop", re.compile(r"^(%?)while", re.I)),
    ("copy/transpose", re.compile(r"^(%?)(copy|transpose|bitcast)", re.I)),
    ("dynamic-slice", re.compile(r"^(%?)dynamic", re.I)),
    ("reduce", re.compile(r"^(%?)(reduce|all-reduce)", re.I)),
    ("elementwise-fusion", re.compile(r"^(%?)(fusion|loop_fusion|input_fusion)", re.I)),
]


def find_trace(path):
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(
        path, "plugins", "profile", "*", "*.trace.json.gz")))
    if not hits:
        raise SystemExit(f"no trace.json.gz under {path}")
    return hits[-1]


def load_events(trace_path):
    with gzip.open(trace_path, "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", [])


def device_lanes(events):
    """pid/tid lanes that look like accelerator op streams (XLA op names)."""
    lanes = set()
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") in ("process_name",
                                                    "thread_name"):
            key = (e.get("pid"), e.get("tid"), e["name"])
            names[key] = e.get("args", {}).get("name", "")
    for (pid, tid, kind), n in names.items():
        ln = n.lower()
        if kind == "process_name" and ("tpu" in ln or "device" in ln
                                       or "/device" in ln or "xla" in ln):
            lanes.add(pid)
    return lanes, names


def main():
    p = argparse.ArgumentParser()
    p.add_argument("path")
    p.add_argument("--top", type=int, default=15)
    args = p.parse_args()

    trace = find_trace(args.path)
    events = load_events(trace)
    lanes, _ = device_lanes(events)

    cat_us = collections.Counter()
    op_us = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if lanes and e.get("pid") not in lanes:
            continue
        name = e.get("name", "")
        # skip derived/step lanes
        if name.startswith(("$", "Steps", "step")):
            continue
        dur = float(e["dur"])
        total += dur
        op_us[name] += dur
        for cat, rx in CATEGORIES:
            if rx.match(name):
                cat_us[cat] += dur
                break
        else:
            cat_us["other"] += dur

    if total == 0:
        raise SystemExit("no device op events found (wrong lane filter?); "
                         "pass the .trace.json.gz directly and check names")
    print(f"trace: {trace}")
    print(f"total device-op time: {total / 1e3:.2f} ms (all events in "
          f"device lanes; overlapping ops double-count)")
    print("\nby category:")
    for cat, us in cat_us.most_common():
        print(f"  {cat:>20}: {us / 1e3:9.2f} ms  ({us / total * 100:5.1f}%)")
    print(f"\ntop {args.top} ops:")
    for name, us in op_us.most_common(args.top):
        print(f"  {us / 1e3:9.2f} ms  {name[:100]}")


if __name__ == "__main__":
    main()
