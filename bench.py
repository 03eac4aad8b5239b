#!/usr/bin/env python
"""Benchmark: WaveGlow synthesis + training throughput on one chip.

Prints ONE JSON line:
  {"metric": "waveglow_synthesis", "value": kHz, "unit": "kHz", "vs_baseline": x}

Baseline: the reference reports ~470 kHz WaveGlow synthesis on a GTX 1080 Ti
(``README.md:64-67``; see BASELINE.md).  Here: the canonical
waveglow_LJ_speech arch (256-ch WN, 12 flows), weight norms fused, batched
synthesis of 10-second utterances.

Timing methodology: on this runtime ``block_until_ready`` can return before
execution completes, so each measurement forces execution with a scalar
device->host fetch and subtracts the measured null-dispatch overhead
(~25 ms, measured the same way on a trivial jitted op).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timed_scalar(f, *args, n=5):
    """Median wall time of f(*args) forced by a scalar device->host fetch."""
    r = f(*args)
    float(np.asarray(r.ravel()[0]))  # compile + first exec
    ts = []
    for _ in range(n):
        t0 = time.time()
        r = f(*args)
        float(np.asarray(r.ravel()[0]))
        ts.append(time.time() - t0)
    return sorted(ts)[n // 2]


_OVERHEAD = None


def _dispatch_overhead():
    """Fixed per-call dispatch + scalar-fetch cost on this runtime."""
    global _OVERHEAD
    if _OVERHEAD is None:
        f = jax.jit(lambda x: x + 1.0)
        _OVERHEAD = _timed_scalar(f, jnp.zeros((8, 128)), n=7)
    return _OVERHEAD


def bench_synthesis(batch=16, seconds=10.0, sr=22050, hop=256,
                    dtype=jnp.float32, precision="default"):
    from constant_memory_waveglow_tpu.ops import set_default_precision
    from constant_memory_waveglow_tpu.ops.weightnorm import fuse_weight_norms
    from constant_memory_waveglow_tpu.models import WaveGlow

    set_default_precision(precision)

    model = WaveGlow(flows=12, n_group=8, n_early_every=4, n_early_size=2,
                     hop_size=hop, n_mels=80, memory_efficient=False,
                     dilation_channels=256, residual_channels=256,
                     skip_channels=256, depth=8, radix=3, bias=False)
    params = fuse_weight_norms(model.init(jax.random.PRNGKey(0)))
    params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)

    frames = int(seconds * sr) // hop
    h = jax.random.normal(jax.random.PRNGKey(1), (batch, 80, frames), dtype)

    infer = jax.jit(lambda p, h, k: model.infer(p, h, k, 0.7))
    dt = _timed_scalar(infer, params, h, jax.random.PRNGKey(2))
    dt = max(dt - _dispatch_overhead(), 1e-6)
    return batch * frames * hop / dt / 1000.0  # kHz


def bench_train_step(batch=8, segment=16000, precision="default", sr=22050):
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
    state0 = exp.init_state(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, segment)) * 0.1

    step = exp.make_train_step(donate=False)

    @jax.jit
    def stepped(s, b):
        new_state, m = step(s, b)
        # fingerprint over every updated leaf so nothing (especially the
        # whole backward pass) can be dead-code-eliminated
        fp = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(new_state["params"]))
        return jnp.stack([m["loss"], fp])  # fetching [0] still executes fp

    dt = _timed_scalar(stepped, state0, x)
    dt = max(dt - _dispatch_overhead(), 1e-6)
    return batch * segment / sr / dt  # audio-seconds per second per chip


def main():
    import os

    baseline_khz = 470.0
    details = {}
    khz = bench_synthesis()
    details["synthesis_khz_b16_fp32"] = round(khz, 1)
    try:
        details["train_audio_s_per_s"] = round(bench_train_step(), 2)
    except Exception as e:  # keep the headline metric robust
        details["train_error"] = f"{type(e).__name__}: {e}"[:200]
    if os.environ.get("CMWG_BENCH_FULL"):  # extra (slow-compile) variants
        for tag, kw in [("b4_fp32", dict(batch=4)),
                        ("b16_bf16", dict(batch=16, dtype=jnp.bfloat16))]:
            try:
                details[f"synthesis_khz_{tag}"] = round(bench_synthesis(**kw), 1)
            except Exception as e:
                details[f"synthesis_{tag}_error"] = str(e)[:120]
    print(json.dumps({
        "metric": "waveglow_synthesis",
        "value": round(khz, 1),
        "unit": "kHz",
        "vs_baseline": round(khz / baseline_khz, 2),
        "details": details,
    }))


if __name__ == "__main__":
    sys.exit(main())
