#!/usr/bin/env python
"""Compare training runs: overlay loss curves + milestone table.

Used for the AMP-vs-fp32 convergence evidence in ``samples/`` (the
reference's claim surface is a single loss curve + demo audio,
``/root/reference/README.md:72-73``; comparing precision modes at matched
steps is the TPU-side addition).

Usage:
  python tools/compare_runs.py a/metrics.jsonl b/metrics.jsonl \
      --labels amp fp32 --out cmp.png [--milestones 1000 5000 10000]

Accepts full ``metrics.jsonl`` files or the downsampled
``metrics_excerpt.jsonl`` from ``tools/make_samples.py``.
"""

from __future__ import annotations

import argparse
import json


def load(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def smoothed(steps, loss, win):
    import numpy as np

    if len(loss) < win:
        return steps, loss
    k = np.ones(win) / win
    sm = np.convolve(loss, k, mode="valid")
    off = (win - 1) // 2
    return steps[off:off + len(sm)], sm


def loss_at(rows, step, win=51):
    """Windowed mean loss around ``step`` (None when the run is shorter)."""
    w = [m["loss"] for m in rows if abs(m["step"] - step) <= win * 2]
    if not w:
        return None
    return sum(w) / len(w)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("runs", nargs="+", help="metrics.jsonl paths")
    p.add_argument("--labels", nargs="+", default=None)
    p.add_argument("--out", default="compare_runs.png")
    p.add_argument("--milestones", nargs="+", type=int, default=None)
    p.add_argument("--win", type=int, default=51)
    args = p.parse_args()

    labels = args.labels or [f"run{i}" for i in range(len(args.runs))]
    assert len(labels) == len(args.runs)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    runs = [load(r) for r in args.runs]
    fig, ax = plt.subplots(figsize=(7.5, 3.8), dpi=120)
    for rows, lab in zip(runs, labels):
        steps = np.array([m["step"] for m in rows])
        loss = np.array([m["loss"] for m in rows])
        s, l = smoothed(steps, loss, args.win)
        stride = max(1, len(s) // 2000)
        ax.plot(s[::stride], l[::stride], lw=1.3, label=lab)
    ax.set_xlabel("step"), ax.set_ylabel("WaveGlowLoss (smoothed)")
    ax.legend(), ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.out)

    max_common = min(max(m["step"] for m in rows) for rows in runs)
    miles = args.milestones or sorted(
        {max(200, max_common // 8), max_common // 4, max_common // 2,
         max_common})
    table = []
    for s in miles:
        row = {"step": int(s)}
        for rows, lab in zip(runs, labels):
            v = loss_at(rows, s, args.win)
            row[lab] = None if v is None else round(v, 4)
        table.append(row)
    print(json.dumps(table, indent=1))


if __name__ == "__main__":
    main()
