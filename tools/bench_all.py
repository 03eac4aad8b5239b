#!/usr/bin/env python
"""Per-model synthesis throughput on one chip (manual companion to bench.py).

Usage: python tools/bench_all.py [waveglow waveflow melglow wsrglow mrwaveglow]
Prints one line per model: synthesis kHz at the model's canonical config.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed_scalar(f, *args, n=3):
    # two forced warmups: the first post-compile execution pays a one-time
    # runtime penalty on the tunneled PJRT backend (~15%, see bench.py)
    for _ in range(2):
        r = f(*args)
        float(np.asarray(r.ravel()[0]))
    ts = []
    for _ in range(n):
        t0 = time.time()
        r = f(*args)
        float(np.asarray(r.ravel()[0]))
        ts.append(time.time() - t0)
    return sorted(ts)[n // 2]


def overhead():
    f = jax.jit(lambda x: x + 1.0)
    return timed_scalar(f, jnp.zeros((8, 128)), n=7)


def bench_model(name, batch=4, seconds=4.0, precision="default"):
    from constant_memory_waveglow_tpu.models import build_model
    from constant_memory_waveglow_tpu.ops import set_default_precision
    from constant_memory_waveglow_tpu.ops.weightnorm import fuse_weight_norms
    from constant_memory_waveglow_tpu.utils.config import load_config

    set_default_precision(precision)

    cfgs = {
        "waveglow": "configs/waveglow_LJ_speech.json",
        "waveflow": "configs/waveflow_LJ_speech.json",
        "melglow": "configs/melglow_LJ_speech.json",
        "wsrglow": "configs/wsrglow_vctk_2x.json",
        "mrwaveglow": "configs/mr_waveglow_LJ_speech.json",
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    config = load_config(os.path.join(root, cfgs[name]))
    model = build_model(config["arch"])
    variables = model.init(jax.random.PRNGKey(0))
    params = fuse_weight_norms(variables)

    sr = 22050
    if name == "wsrglow":
        t_low = int(seconds * sr) // 16 * 8  # low-rate waveform cond
        h = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (batch, t_low))
        samples_out = t_low * 2
    else:
        frames = int(seconds * sr) // 256
        h = jax.random.normal(jax.random.PRNGKey(1), (batch, 80, frames))
        samples_out = frames * 256

    infer = jax.jit(lambda p, h, k: model.infer(p, h, k, 0.7))
    dt = timed_scalar(infer, params, h, jax.random.PRNGKey(2))
    dt = max(dt - overhead(), 1e-6)
    khz = batch * samples_out / dt / 1000.0
    print(f"{name}: {khz:.0f} kHz total (batch {batch}, {seconds:.0f}s each, "
          f"{dt * 1e3:.0f} ms/call)", flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or ["waveglow", "waveflow", "melglow", "wsrglow", "mrwaveglow"]
    for n in names:
        try:
            bench_model(n)
        except Exception as e:
            print(f"{n}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
