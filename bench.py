#!/usr/bin/env python
"""Benchmark: WaveGlow synthesis throughput on one chip.

Prints ONE JSON line:
  {"metric": "waveglow_synthesis", "value": kHz, "unit": "kHz", "vs_baseline": x}

Baseline: the reference reports ~470 kHz WaveGlow synthesis on a GTX 1080 Ti
(``README.md:64-67``; see BASELINE.md).  Here: the canonical
waveglow_LJ_speech arch (256-ch WN, 12 flows), weight norms fused, batched
synthesis of 10-second utterances, steady-state timing (compile excluded).
Extra measurements ride along in "details".
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def bench_synthesis(batch=4, seconds=10.0, sr=22050, hop=256, dtype=jnp.float32,
                    precision="default"):
    from constant_memory_waveglow_tpu.ops import set_default_precision
    from constant_memory_waveglow_tpu.ops.weightnorm import fuse_weight_norms
    from constant_memory_waveglow_tpu.models import WaveGlow

    set_default_precision(precision)

    model = WaveGlow(flows=12, n_group=8, n_early_every=4, n_early_size=2,
                     hop_size=hop, n_mels=80, memory_efficient=False,
                     dilation_channels=256, residual_channels=256,
                     skip_channels=256, depth=8, radix=3, bias=False)
    params = fuse_weight_norms(model.init(jax.random.PRNGKey(0)))
    if dtype != jnp.float32:
        params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)

    frames = int(seconds * sr) // hop
    h = jax.random.normal(jax.random.PRNGKey(1), (batch, 80, frames), dtype)

    infer = jax.jit(lambda p, h, k: model.infer(p, h, k, 0.7))
    key = jax.random.PRNGKey(2)
    jax.block_until_ready(infer(params, h, key))  # compile
    times = []
    for _ in range(7):
        t0 = time.time()
        jax.block_until_ready(infer(params, h, key))
        times.append(time.time() - t0)
    dt = sorted(times)[len(times) // 2]  # median, per-iter device sync
    samples = batch * frames * hop
    return samples / dt / 1000.0  # kHz


def bench_train_step(batch=8, segment=16000, dtype=jnp.float32, precision="default",
                     sr=22050):
    from constant_memory_waveglow_tpu.ops import set_default_precision
    from constant_memory_waveglow_tpu.training import Experiment

    set_default_precision(precision)
    cfg = {
        "arch": {"type": "WaveGlow", "args": {
            "flows": 12, "n_group": 8, "n_early_every": 4, "n_early_size": 2,
            "hop_size": 256, "n_mels": 80, "memory_efficient": True,
            "dilation_channels": 256, "residual_channels": 256,
            "skip_channels": 256, "depth": 8, "radix": 3, "bias": False}},
        "optimizer": {"type": "Adam", "args": {"lr": 1e-4, "weight_decay": 0}},
        "loss": {"type": "WaveGlowLoss", "args": {"sigma": 0.7, "elementwise_mean": True}},
        "conditioner": {"type": "MelSpec", "args": {
            "sr": sr, "n_fft": 1024, "hop_length": 256, "f_max": 8000, "n_mels": 80}},
    }
    exp = Experiment(cfg)
    state = exp.init_state(jax.random.PRNGKey(0))
    step = exp.make_train_step(donate=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, segment), jnp.float32) * 0.1
    state2, m = step(state, x)
    jax.block_until_ready(m)  # compile
    times = []
    for _ in range(5):
        t0 = time.time()
        state2, m = step(state, x)
        jax.block_until_ready(m)
        times.append(time.time() - t0)
    dt = sorted(times)[len(times) // 2]
    return batch * segment / sr / dt  # audio-seconds per second per chip


def main():
    baseline_khz = 470.0
    details = {}
    khz = bench_synthesis()
    details["synthesis_khz_b4_fp32"] = round(khz, 1)
    try:
        details["train_audio_s_per_s"] = round(bench_train_step(), 2)
    except Exception as e:  # keep the headline metric robust
        details["train_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps({
        "metric": "waveglow_synthesis",
        "value": round(khz, 1),
        "unit": "kHz",
        "vs_baseline": round(khz / baseline_khz, 2),
        "details": details,
    }))


if __name__ == "__main__":
    sys.exit(main())
