"""Metrics / observability.

Parity surface with the reference (SURVEY.md §5): per-step scalars
(loss, logdet/numel, z_mean, z_std — ``model/lightning.py:58-64``), per-epoch
reconstruction audio (``train.py:17-34``), all to TensorBoard when available,
always to a JSONL stream for headless runs.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


class MetricsLogger:
    def __init__(self, logdir):
        self.logdir = os.path.abspath(os.path.expanduser(logdir))
        os.makedirs(self.logdir, exist_ok=True)
        self._jsonl = open(os.path.join(self.logdir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(self.logdir)
        except Exception:
            pass

    def log_scalars(self, step, scalars: dict):
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), int(step))

    def log_audio(self, step, tag, audio, sample_rate):
        audio = np.asarray(audio, dtype=np.float32).reshape(-1)
        from ..utils.audio import save_wav

        wav_dir = os.path.join(self.logdir, "audio")
        os.makedirs(wav_dir, exist_ok=True)
        save_wav(os.path.join(wav_dir, f"{tag}_{step}.wav"), audio, sample_rate)
        if self._tb is not None:
            self._tb.add_audio(tag, audio[None, :], int(step), sample_rate=sample_rate)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
