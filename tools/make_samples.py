#!/usr/bin/env python
"""Assemble trained-model evidence from a training run into ``samples/``.

The analog of the reference's ``samples/`` directory (demo audio referenced
from ``/root/reference/README.md:72-73``): loss curve (PNG + downsampled
JSONL excerpt), a few per-epoch reconstruction wavs, a reconstruction-quality
(LSD) table against the ground-truth test file, and a lean (fused,
optimizer-free) checkpoint exported next to them.

Usage:
  python tools/make_samples.py <logdir> <out_dir> [--test-file f.wav]
                               [--steps 200 2000 latest] [--no-ckpt]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# assembling evidence must never touch (or wait on) the TPU — the trainer
# may still hold the chip; everything here is host-side work
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("logdir")
    p.add_argument("out")
    p.add_argument("--test-file", default=None,
                   help="ground truth wav for the LSD table")
    p.add_argument("--steps", nargs="+", default=["first", "mid", "latest"],
                   help="which reconstruction_audio_<step>.wav to copy")
    p.add_argument("--no-ckpt", action="store_true")
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)

    # ---------------------------------------------------------- loss curve
    metrics = []
    with open(os.path.join(args.logdir, "metrics.jsonl")) as f:
        for line in f:
            metrics.append(json.loads(line))
    stride = max(1, len(metrics) // 500)
    with open(os.path.join(args.out, "metrics_excerpt.jsonl"), "w") as f:
        for m in metrics[::stride]:
            f.write(json.dumps(m) + "\n")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    steps = np.array([m["step"] for m in metrics])
    loss = np.array([m["loss"] for m in metrics])
    k = max(1, len(loss) // 2000)
    win = 25 if len(loss) >= 50 else 1  # short runs: no smoothing window
    smooth = np.convolve(loss, np.ones(win) / win, mode="valid")
    off = (win - 1) // 2
    fig, ax = plt.subplots(figsize=(7, 3.5), dpi=120)
    ax.plot(steps[::k], loss[::k], lw=0.4, alpha=0.35, label="loss")
    ax.plot(steps[off:off + len(smooth)][::k], smooth[::k], lw=1.4,
            label="loss (smoothed)")
    ax.set_xlabel("step"), ax.set_ylabel("WaveGlowLoss")
    ax.legend(), ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "loss_curve.png"))
    print(f"loss: step {steps[0]}..{steps[-1]}, "
          f"{loss[0]:.3f} -> {smooth[-1]:.3f} (smoothed)")

    # ------------------------------------------------- reconstruction audio
    audio_dir = os.path.join(args.logdir, "audio")
    avail = {}
    if os.path.isdir(audio_dir):
        for fn in os.listdir(audio_dir):
            m = re.match(r"reconstruct_audio_(\d+)\.wav$", fn)
            if m:
                avail[int(m.group(1))] = os.path.join(audio_dir, fn)
    picked = []
    if avail:
        ordered = sorted(avail)
        for s in args.steps:
            if s == "first":
                picked.append(ordered[0])
            elif s == "latest":
                picked.append(ordered[-1])
            elif s == "mid":
                picked.append(ordered[len(ordered) // 2])
            else:
                picked.append(min(ordered, key=lambda x: abs(x - int(s))))
        for s in sorted(set(picked)):
            shutil.copy(avail[s],
                        os.path.join(args.out, f"reconstruct_step{s}.wav"))

    # --------------------------------------------------------- LSD table
    if args.test_file and avail:
        from constant_memory_waveglow_tpu.utils.audio import load_wav
        from vctk_wsrglow_infer import lsd

        ref, _sr = load_wav(args.test_file)
        rows = []
        for s in sorted(avail):
            y, _ = load_wav(avail[s])
            n = min(len(ref), len(y))
            rows.append({"step": s, "lsd": round(float(lsd(ref[:n], y[:n])), 3)})
        with open(os.path.join(args.out, "reconstruction_lsd.json"), "w") as f:
            json.dump(rows, f, indent=1)
        print("LSD:", {r["step"]: r["lsd"] for r in rows[:: max(1, len(rows) // 6)]})

    # ------------------------------------------------------ lean checkpoint
    if not args.no_ckpt:
        ckpt = os.path.join(args.logdir, "ckpt")
        out_ckpt = os.path.join(args.out, "checkpoint")
        r = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "export_inference.py"),
             ckpt, out_ckpt, "--platform", "cpu"])
        if r.returncode:
            sys.exit(r.returncode)


if __name__ == "__main__":
    main()
