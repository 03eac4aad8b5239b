#!/usr/bin/env python
"""Verify the constant-memory claim on the compiler level: compile the
training step for increasing flow counts and report XLA's buffer-assignment
peak temp memory (the TPU analog of the reference's README table,
``README.md:50-57``).

Covers every ``memory_efficient`` family the reference's storage-freeing
trick covers (``model/efficient_modules.py:99-279`` used by
``model/waveglow.py:163-175``, ``model/melglow.py:203-258``,
``model/mr_waveglow.py:46,87-90``), plus the construct-inverted
(``reverse_mode``) WaveGlow — each must show a ~flat peak-temp-by-flows
series under the scan-group engine.

Usage:
  python tools/memory_check.py [--arch waveglow|melglow|mr_waveglow|waveglow_rm]
                               [--flows 4 8 12 16] [--channels 256]
                               [--batch 4] [--segment 16000] [--naive]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARCHS = ("waveglow", "melglow", "mr_waveglow", "waveglow_rm")


def build_config(arch, flows, channels, depth, memory_efficient):
    """Train config for the swept flow count.  Shapes follow the shipped LJ
    configs (configs/*_LJ_speech.json) with ``channels``/``depth`` knobs;
    early outputs are disabled so every flow is equal-width (the same
    simplification the WaveGlow series always used)."""
    if arch in ("waveglow", "waveglow_rm"):
        a = {"type": "WaveGlow", "args": {
            "flows": flows, "n_group": 8, "n_early_every": 10000,
            "n_early_size": 2, "hop_size": 256, "n_mels": 80,
            "memory_efficient": memory_efficient,
            "reverse_mode": arch == "waveglow_rm",
            "dilation_channels": channels, "residual_channels": channels,
            "skip_channels": channels, "depth": depth, "radix": 3,
            "bias": False}}
    elif arch == "melglow":
        # melglow_LJ_speech.json ratios: 48ch LVC at depth 7, 64x3
        # predictor.  predict_channels scales with the channel knob so
        # scaled-down test configs keep params/flow small — the LVC
        # predictor's output head is O(channels^2 * radix * predict), and
        # params-sized per-flow buffers (the stacked gradients, present in
        # ANY training step incl. naive) would otherwise dominate the
        # activation slope the measurement is after
        a = {"type": "MelGlow", "args": {
            "flows": flows, "n_group": 8, "n_early_every": 10000,
            "n_early_size": 2, "hop_size": 256, "n_mels": 80,
            "memory_efficient": memory_efficient,
            "dilation_channels": channels, "residual_channels": channels,
            "skip_channels": channels, "depth": depth, "radix": 3,
            "predict_channels": min(64, channels), "predict_layers": 3,
            "bias": False}}
    elif arch == "mr_waveglow":
        # mr_waveglow_LJ_speech.json: 3-level pyramid; the swept variable is
        # the per-level flow count (total flows = flows*(levels-1)+prior)
        a = {"type": "MRWaveGlow", "args": {
            "prior_flows": 4, "n_group": 8, "hop_size": 256, "n_mels": 80,
            "levels": 3, "flows": flows,
            "memory_efficient": memory_efficient,
            "dilation_channels": channels, "residual_channels": channels,
            "skip_channels": channels, "depth": depth, "radix": 3,
            "bias": False}}
    else:
        raise ValueError(f"unknown arch {arch!r}; choose from {ARCHS}")
    return {
        "arch": a,
        "optimizer": {"type": "Adam", "args": {"lr": 1e-4, "weight_decay": 0}},
        "loss": {"type": "WaveGlowLoss", "args": {"sigma": 0.7,
                                                  "elementwise_mean": True}},
        "conditioner": {"type": "MelSpec", "args": {
            "sr": 22050, "n_fft": 1024, "hop_length": 256, "f_max": 8000,
            "n_mels": 80}},
    }


def total_flows(arch, flows):
    """Flow count the slope normalizes by (MRWaveGlow sweeps per-level)."""
    if arch == "mr_waveglow":
        return flows * 2 + 4  # levels=3, prior_flows=4 (build_config)
    return flows


def peak_temp_bytes(flows, channels, depth, batch, segment, memory_efficient,
                    arch="waveglow"):
    import jax
    import jax.numpy as jnp

    from constant_memory_waveglow_tpu.training import Experiment

    exp = Experiment(build_config(arch, flows, channels, depth,
                                  memory_efficient))
    state = exp.init_state(jax.random.PRNGKey(0))
    x = jnp.zeros((batch, segment), jnp.float32)
    step = exp.make_train_step(donate=False)
    compiled = jax.jit(step).lower(state, x).compile()
    mem = compiled.memory_analysis()
    if mem is None:
        return None, None
    temp = getattr(mem, "temp_size_in_bytes", None)
    total = getattr(mem, "peak_memory_in_bytes", None) or (
        (getattr(mem, "argument_size_in_bytes", 0) or 0)
        + (getattr(mem, "output_size_in_bytes", 0) or 0)
        + (temp or 0))
    return temp, total


def main():

    from constant_memory_waveglow_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--arch", type=str, default="waveglow", choices=ARCHS)
    p.add_argument("--flows", type=int, nargs="+", default=[4, 8, 12])
    p.add_argument("--channels", type=int, default=256)
    p.add_argument("--depth", type=int, default=8)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--segment", type=int, default=16000)
    p.add_argument("--naive", action="store_true",
                   help="also measure naive (non-constant-memory) autodiff")
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    modes = [True] + ([False] if args.naive else [])
    print(f"arch: {args.arch}")
    print(f"{'flows':>6} {'mode':>10} {'temp (MB)':>12} {'total (MB)':>12}")
    for eff in modes:
        prev = None
        for flows in args.flows:
            temp, total = peak_temp_bytes(flows, args.channels, args.depth,
                                          args.batch, args.segment, eff,
                                          arch=args.arch)
            name = "efficient" if eff else "naive"
            t = f"{temp / 1e6:.1f}" if temp is not None else "n/a"
            tt = f"{total / 1e6:.1f}" if total is not None else "n/a"
            slope = ""
            nf = total_flows(args.arch, flows)
            if temp is not None and prev is not None:
                slope = (f"  (+{(temp - prev[1]) / max(nf - prev[0], 1) / 1e6:.1f}"
                         f" MB/flow)")
            prev = (nf, temp)
            print(f"{flows:>6} {name:>10} {t:>12} {tt:>12}{slope}")


if __name__ == "__main__":
    main()
