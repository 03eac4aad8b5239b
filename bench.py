#!/usr/bin/env python
"""Benchmark: WaveGlow synthesis + training throughput on one chip.

Prints ONE JSON line:
  {"metric": "waveglow_synthesis", "value": kHz, "unit": "kHz", "vs_baseline": x}

Baseline: the reference reports ~470 kHz WaveGlow synthesis on a GTX 1080 Ti
(``README.md:64-67``; see BASELINE.md) — the ratio is cross-hardware by
nature and labeled as such in details.  Here: the canonical
waveglow_LJ_speech arch (256-ch WN, 12 flows), weight norms fused, batched
synthesis of 10-second utterances.

Timing methodology: every measurement times an N-step *chained* run inside
one wall-clock interval — each step consumes the previous step's output, so a
single scalar fetch at the end forces the whole chain and dispatch overhead
amortizes to nothing.  (Round-1 timed single dispatches minus a measured
null-dispatch constant; VERDICT.md round 1, weak #4, asked for this.)

Precision: the headline training number is the trainer's SHIPPED default
(``train.py`` with no flags = AMP: bf16 compute, fp32 master params,
'default' matmul precision — the evidence-backed fast path, see
``samples/waveglow_lj_256ch_amp``), with the conservative ``--fp32`` path
reported alongside.  Synthesis is benched fp32-params at ``default``
precision, matching ``inference.py`` defaults.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# rough bf16 peak FLOP/s by device kind, for the MFU *estimate*
_PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5": 459e12,
    "TPU v5e": 197e12,
    "TPU v5 lite": 197e12,
    "TPU v5p": 459e12,
    "TPU v6e": 918e12,
    "TPU v6 lite": 918e12,
}


def _device_kind():
    try:
        return jax.devices()[0].device_kind
    except Exception:
        return "unknown"


def _peak_flops():
    kind = _device_kind()
    if kind in _PEAK_FLOPS:  # exact device_kind first ('TPU v5' IS the
        return _PEAK_FLOPS[kind]  # v5p-class entry, not a v5e truncation)
    # then longest prefix: 'TPU v5 lite foo' resolves to the v5e entry,
    # not the 'TPU v5' prefix
    for k in sorted(_PEAK_FLOPS, key=len, reverse=True):
        if kind.startswith(k):
            return _PEAK_FLOPS[k]
    return None


def _time_chained_steps(step, state, batch, n=10, warmup=2):
    """Wall-time per step of ``state, m = step(state, batch)`` over an n-step
    chain; one fetch at the end forces every step transitively."""
    s = state
    for _ in range(warmup):
        s, m = step(s, batch)
    jax.block_until_ready(m)
    float(np.asarray(m.ravel()[0]))  # hard sync: device->host scalar
    t0 = time.perf_counter()
    for _ in range(n):
        s, m = step(s, batch)
    float(np.asarray(m.ravel()[0]))
    return (time.perf_counter() - t0) / n


def _time_chained_calls(f, x, n=5, warmup=2):
    """Per-call wall time of ``y = f(x_i)`` where each call's input is
    perturbed by the previous output's first element (forces sequencing).

    The warmup iterations run the SAME chain update as the timed loop:
    the tiny ``x + out.ravel()[0]`` chaining ops are eagerly compiled on
    first use per dtype, and on this runtime's remote-compile tunnel that
    costs hundreds of ms — inside the timed region it read as a ~25%
    throughput loss on the first-benched dtype (diagnosed by per-exec
    timing: every individual execution was already at steady state)."""
    out = None
    for _ in range(warmup):
        if out is not None:
            x = x + out.ravel()[0] * 1e-12
        out = f(x)
        float(np.asarray(out.ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        x = x + out.ravel()[0] * 1e-12  # data dependency chains the calls
        out = f(x)
    float(np.asarray(out.ravel()[0]))
    return (time.perf_counter() - t0) / n


_WAVEGLOW_ARGS = dict(
    flows=12, n_group=8, n_early_every=4, n_early_size=2, hop_size=256,
    n_mels=80, dilation_channels=256, residual_channels=256,
    skip_channels=256, depth=8, radix=3, bias=False)

# shipped-config arch args for the per-family entries (configs/*_LJ_speech
# .json / wsrglow_vctk_2x.json)
_MELGLOW_ARGS = dict(
    flows=12, n_group=8, n_early_every=4, n_early_size=2, hop_size=256,
    n_mels=80, dilation_channels=48, residual_channels=48, skip_channels=48,
    depth=7, radix=3, predict_channels=64, predict_layers=3, bias=False)
_MRWG_ARGS = dict(
    prior_flows=4, n_group=8, hop_size=256, n_mels=80, levels=3, flows=4,
    dilation_channels=256, residual_channels=256, skip_channels=256, depth=8,
    radix=3, bias=False)
_WAVEFLOW_ARGS = dict(
    flows=8, n_group=64, n_mels=80, use_conv1x1=False, dilation_channels=64,
    residual_channels=64, skip_channels=64, bias=False)


def bench_synthesis(batch=16, seconds=10.0, sr=22050, hop=256,
                    dtype=jnp.float32, precision="default"):
    from constant_memory_waveglow_tpu.ops import set_default_precision
    from constant_memory_waveglow_tpu.ops.weightnorm import fuse_weight_norms
    from constant_memory_waveglow_tpu.models import WaveGlow

    set_default_precision(precision)

    model = WaveGlow(memory_efficient=False, **_WAVEGLOW_ARGS)
    params = fuse_weight_norms(model.init(jax.random.PRNGKey(0)))
    params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)

    frames = int(seconds * sr) // hop
    h = jax.random.normal(jax.random.PRNGKey(1), (batch, 80, frames), dtype)

    # params ride as runtime args, NOT a closure: closed-over trees bake
    # into the lowered module as constants and the HLO upload blows past
    # the remote-compile request-size limit at family scale (HTTP 413)
    params = jax.device_put(params)
    jfn = jax.jit(lambda p, h: model.infer(p, h, jax.random.PRNGKey(2), 0.7))
    infer = lambda h: jfn(params, h)
    dt = _time_chained_calls(infer, h)
    return batch * frames * hop / dt / 1000.0  # kHz


def bench_analysis(batch=16, seconds=10.0, sr=22050, hop=256,
                   arch="WaveGlow", precision="default"):
    """Forward (analysis) pass kHz — the reference CLI's first timed
    number (``/root/reference/inference.py:38-48``; VERDICT r4 next #8).
    Audio -> (z, logdet) on fused fp32 params at the inference defaults."""
    from constant_memory_waveglow_tpu.ops import set_default_precision
    from constant_memory_waveglow_tpu.ops.weightnorm import fuse_weight_norms
    from constant_memory_waveglow_tpu.models import WaveGlow, MRWaveGlow

    set_default_precision(precision)
    if arch == "WaveGlow":
        model = WaveGlow(memory_efficient=False, **_WAVEGLOW_ARGS)
    else:
        model = MRWaveGlow(memory_efficient=False, **_MRWG_ARGS)
    params = fuse_weight_norms(model.init(jax.random.PRNGKey(0)))
    n = int(seconds * sr) // hop * hop
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, n)) * 0.1
    frames = n // hop
    h = jax.random.normal(jax.random.PRNGKey(2), (batch, 80, frames))
    params = jax.device_put(params)
    jfn = jax.jit(lambda p, xx, hh: model.forward(p, xx, hh))
    fwd = lambda xx: jfn(params, xx, h)[0]
    dt = _time_chained_calls(fwd, x)
    return batch * n / dt / 1000.0  # kHz


def _train_cfg(arch="WaveGlow", arch_args=None, conditioner=None, sigma=0.7):
    return {
        "arch": {"type": arch, "args": dict(
            arch_args or dict(_WAVEGLOW_ARGS, memory_efficient=True))},
        "optimizer": {"type": "Adam", "args": {"lr": 1e-4, "weight_decay": 0}},
        "loss": {"type": "WaveGlowLoss", "args": {"sigma": sigma,
                                                  "elementwise_mean": True}},
        "conditioner": conditioner or {"type": "MelSpec", "args": {
            "sr": 22050, "n_fft": 1024, "hop_length": 256, "f_max": 8000,
            "n_mels": 80}},
    }


def bench_train_step(batch=8, segment=16000, precision="high", sr=22050,
                     cfg=None, n=10, with_flops=False, compute_dtype=None,
                     autotune_unroll=False):
    """audio-seconds/s/chip of the jitted train step (donated state chain).

    ``compute_dtype='bfloat16'`` benches the AMP path (bf16 activations,
    fp32 master params) — the training step is HBM-bandwidth-bound
    (arithmetic intensity ~35 flop/byte), so halving activation bytes is
    the dominant lever.  Returns (audio_s_per_s, model_tflops_per_s or None)."""
    from constant_memory_waveglow_tpu.ops import set_default_precision
    from constant_memory_waveglow_tpu.training import Experiment

    set_default_precision(precision)
    exp = Experiment(cfg or _train_cfg())
    state = exp.init_state(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, segment)) * 0.1

    from constant_memory_waveglow_tpu.flows import scan_group

    chosen_unroll = None
    prev_unroll = scan_group._SCAN_UNROLL
    try:
        if autotune_unroll:  # the shipped train.py default (--scan-unroll auto)
            chosen_unroll, _ = exp.autotune_scan_unroll(
                state, (batch, segment), compute_dtype=compute_dtype,
                donate=False)
        step = exp.make_train_step(donate=False, compute_dtype=compute_dtype)

        def chained(s, b):
            new_state, m = step(s, b)
            # fingerprint every updated leaf so nothing is dead-code-eliminated
            fp = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(new_state["params"]))
            return new_state, jnp.stack([m["loss"], fp])

        chained = jax.jit(chained)
        flops = None
        if with_flops:
            try:
                cost = chained.lower(state, x).compile().cost_analysis()
                if isinstance(cost, (list, tuple)):
                    cost = cost[0]
                flops = float(cost.get("flops", 0.0)) or None
            except Exception:
                flops = None
        dt = _time_chained_steps(chained, state, x, n=n)
    finally:
        # a compile/timing failure mid-run must not leak the autotuned
        # unroll into every later bench entry (they'd be silently measured
        # at the wrong unroll and mislabeled in BENCH output)
        scan_group.set_scan_unroll(prev_unroll)
    tflops = flops / dt / 1e12 if flops else None
    return batch * segment / sr / dt, tflops, chosen_unroll


def bench_waveflow_synthesis(batch=16, seconds=10.0, sr=22050, hop=256):
    """WaveFlow AR inverse (canonical 64x64 config) via the fused Pallas
    AR-step kernel; kHz at fp32 params, 'default' precision."""
    from constant_memory_waveglow_tpu.models import WaveFlow
    from constant_memory_waveglow_tpu.ops import set_default_precision
    from constant_memory_waveglow_tpu.ops.weightnorm import fuse_weight_norms

    set_default_precision("default")
    model = WaveFlow(flows=8, n_group=64, n_mels=80, use_conv1x1=False,
                     memory_efficient=False, dilation_channels=64,
                     residual_channels=64, skip_channels=64, bias=False)
    params = fuse_weight_norms(model.init(jax.random.PRNGKey(0)))
    frames = int(seconds * sr) // hop
    h = jax.random.normal(jax.random.PRNGKey(1), (batch, 80, frames))
    params = jax.device_put(params)  # runtime args, not baked constants
    jfn = jax.jit(lambda p, h: model.infer(p, h, jax.random.PRNGKey(2), 1.0))
    infer = lambda h: jfn(params, h)
    dt = _time_chained_calls(infer, h, n=3)
    return batch * frames * hop / dt / 1000.0


def bench_family_synthesis(family, batch=16, seconds=10.0, sr=22050):
    """Batched synthesis kHz for the non-flagship families at their shipped
    configs (fp32 params, 'default' precision — inference.py defaults).
    The reference's per-model claims: ``/root/reference/README.md:64-82``."""
    from constant_memory_waveglow_tpu.models import (MelGlow, MRWaveGlow,
                                                     WSRGlow)
    from constant_memory_waveglow_tpu.ops import set_default_precision
    from constant_memory_waveglow_tpu.ops.weightnorm import fuse_weight_norms

    set_default_precision("default")
    key = jax.random.PRNGKey(0)
    if family == "wsrglow":
        model = WSRGlow(upsample_rate=2, memory_efficient=False)
        t_low = (int(seconds * sr) // 2 // 8) * 8
        h = jax.random.normal(jax.random.PRNGKey(1), (batch, t_low)) * 0.1
        out_samples = t_low * model.upsample_rate
    else:
        # melglow runs the scan-group reverse: the unrolled 12-flow LVC
        # graph exceeds the remote-compile service's request-size limit
        # (HTTP 413); scanned vs unrolled values are identical
        # (tests/test_constant_memory_families.py)
        cls, args = ((MelGlow, _MELGLOW_ARGS) if family == "melglow"
                     else (MRWaveGlow, _MRWG_ARGS))
        model = cls(memory_efficient=(family == "melglow"), **args)
        frames = int(seconds * sr) // 256
        h = jax.random.normal(jax.random.PRNGKey(1), (batch, 80, frames))
        out_samples = frames * 256
    params = jax.device_put(fuse_weight_norms(model.init(key)))
    # runtime args, not baked constants (see bench_synthesis note)
    jfn = jax.jit(lambda p, h: model.infer(p, h, jax.random.PRNGKey(2), 0.7))
    infer = lambda h: jfn(params, h)
    dt = _time_chained_calls(infer, h, n=3)
    return batch * out_samples / dt / 1000.0


def _backend_alive(timeout_s=180):
    """Probe backend init in a disposable subprocess.

    The remote-TPU tunnel can die in a way that makes ``jax.devices()``
    block forever inside C++ backend setup; probing in a child process
    (killable by timeout) lets the bench fail fast with a well-formed JSON
    line instead of hanging its caller.
    """
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices(); print('ok')"],
            timeout=timeout_s, capture_output=True, text=True)
        return r.returncode == 0 and "ok" in r.stdout
    except Exception:
        return False


def main():
    import os

    if not _backend_alive():
        print(json.dumps({
            "metric": "waveglow_synthesis", "value": 0.0, "unit": "kHz",
            "vs_baseline": 0.0,
            "details": {"error": "backend init unavailable or hung "
                                 "(probe subprocess timed out)"},
        }))
        return 1

    from constant_memory_waveglow_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    baseline_khz = 470.0
    details = {"device": _device_kind(),
               "vs_baseline_note": "cross-hardware AND cross-batch: the ref "
                                   "number is a single-utterance run on a "
                                   "GTX 1080 Ti; the headline is batched "
                                   "(16) one-chip throughput, the BASELINE.md "
                                   "target ('>470 kHz batched synthesis'); "
                                   "synthesis_khz_b1 is the like-for-like "
                                   "single-utterance figure"}
    khz = bench_synthesis()
    details["synthesis_khz_b16_fp32"] = round(khz, 1)
    try:
        # the --bf16 inference path (params + activations bf16)
        details["synthesis_khz_b16_bf16"] = round(
            bench_synthesis(dtype=jnp.bfloat16), 1)
    except Exception as e:
        details["synthesis_khz_b16_bf16"] = f"failed: {e}"
    try:
        details["synthesis_khz_b1"] = round(bench_synthesis(batch=1), 1)
    except Exception as e:  # pragma: no cover - diagnostic only
        details["synthesis_khz_b1"] = f"failed: {e}"
    # forward/analysis direction (the reference CLI's first timed number,
    # /root/reference/inference.py:38-48; VERDICT r4 next #8)
    for key, kw in (("analysis_khz_b16", {}),
                    ("analysis_khz_b1", {"batch": 1}),
                    ("mr_waveglow_analysis_khz_b16", {"arch": "MRWaveGlow"})):
        try:
            details[key] = round(bench_analysis(**kw), 1)
        except Exception as e:
            details[key] = f"failed: {e}"[:120]
    try:
        # the SHIPPED trainer default (train.py with no flags): AMP (bf16
        # compute, fp32 master params) at 'default' matmul precision,
        # --scan-unroll auto (compile-time memory autotune; picks 4 on a
        # v5e with headroom)
        a_s, tflops, unroll = bench_train_step(precision="default",
                                               compute_dtype="bfloat16",
                                               with_flops=True,
                                               autotune_unroll=True)
        details["train_audio_s_per_s_b8"] = round(a_s, 2)
        details["train_b8_auto_unroll"] = unroll
        if tflops:
            details["train_tflops_per_s"] = round(tflops, 1)
            peak = _peak_flops()
            if peak:
                details["train_mfu_est_vs_bf16_peak"] = round(
                    tflops * 1e12 / peak, 3)
        # the constant-memory contract point (--scan-unroll 1): strictly
        # one flow's WN internals live at a time
        details["train_audio_s_per_s_b8_unroll1"] = round(
            bench_train_step(precision="default",
                             compute_dtype="bfloat16")[0], 2)
        # the conservative opt-out (train.py --fp32): fp32 compute, 'high'
        details["train_audio_s_per_s_b8_fp32"] = round(
            bench_train_step(precision="high")[0], 2)
        # the reference's headline config is batch 24 (README.md:53-57)
        a_s24, _, unroll24 = bench_train_step(batch=24, precision="default",
                                              compute_dtype="bfloat16", n=6,
                                              autotune_unroll=True)
        details["train_audio_s_per_s_b24"] = round(a_s24, 2)
        details["train_b24_auto_unroll"] = unroll24
        details["train_audio_s_per_s_b24_fp32"] = round(
            bench_train_step(batch=24, precision="high", n=6)[0], 2)
        # batch 12 (the shipped WaveFlow/WSRGlow sample batch): covered by
        # the (8, 4) microbatch plan since round 5 (VERDICT r4 next #3)
        details["train_audio_s_per_s_b12"] = round(
            bench_train_step(batch=12, precision="default",
                             compute_dtype="bfloat16", n=6)[0], 2)
    except Exception as e:  # keep the headline metric robust
        details["train_error"] = f"{type(e).__name__}: {e}"[:200]
    try:
        details["waveflow_synthesis_khz_b16"] = round(bench_waveflow_synthesis(), 1)
    except Exception as e:
        details["waveflow_error"] = f"{type(e).__name__}: {e}"[:200]

    # ---- per-family table: synthesis kHz + train audio-s/s at the shipped
    # trainer default (AMP), batch 8 — every family, every round (VERDICT r3
    # next #3; the reference's per-model claims, README.md:64-82)
    for fam in ("melglow", "mr_waveglow", "wsrglow"):
        for attempt in (1, 2):  # the remote-compile tunnel can drop a pipe
            try:
                details[f"{fam}_synthesis_khz_b16"] = round(
                    bench_family_synthesis(fam), 1)
                details.pop(f"{fam}_synth_error", None)
                break
            except Exception as e:
                details[f"{fam}_synth_error"] = f"{type(e).__name__}: {e}"[:200]
    family_train = {
        "waveflow": dict(cfg=_train_cfg(
            "WaveFlow", dict(_WAVEFLOW_ARGS, memory_efficient=True)),
            segment=16000),
        "melglow": dict(cfg=_train_cfg(
            "MelGlow", dict(_MELGLOW_ARGS, memory_efficient=True)),
            segment=22016),
        "mr_waveglow": dict(cfg=_train_cfg(
            "MRWaveGlow", dict(_MRWG_ARGS, memory_efficient=True)),
            segment=16000),
        "wsrglow": dict(cfg=_train_cfg(
            "WSRGlow", {"upsample_rate": 2, "memory_efficient": True},
            conditioner={"type": "STFTDecimate", "args": {"r": 2}},
            sigma=1.0), segment=8192),
    }
    for fam, spec in family_train.items():
        try:
            # autotune_unroll = the shipped train.py default, extended to
            # every family in round 5 (WaveFlow's checkpointed scan honors
            # the knob too; WSRGlow measured 39.9 -> ~44 at unroll 4)
            a_s, _, unroll = bench_train_step(
                batch=8, segment=spec["segment"], precision="default",
                compute_dtype="bfloat16", cfg=spec["cfg"], n=6,
                autotune_unroll=True)
            details[f"{fam}_train_audio_s_per_s_b8"] = round(a_s, 2)
            details[f"{fam}_train_b8_auto_unroll"] = unroll
        except Exception as e:
            details[f"{fam}_train_error"] = f"{type(e).__name__}: {e}"[:200]

    # ---- constant-memory headline: XLA peak temp at the reference's README
    # table config (ch256, bs24; README.md:53-57 reports 4951 MB total),
    # measured as a SERIES over flow counts so the flat-in-depth claim is
    # machine-checked every round — for EVERY memory_efficient family plus
    # the construct-inverted mode (the reference's guarantee covers them
    # all, model/efficient_modules.py:99-279), and contrasted against naive
    # autodiff (the reference's README table's missing row: naive did not
    # fit at 12 flows)
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tools"))
        from memory_check import peak_temp_bytes, total_flows
        from constant_memory_waveglow_tpu.ops import set_default_precision
        set_default_precision("highest")  # tools/memory_check.py default
        flows_series, temps = [4, 8, 12, 16], []
        for nf in flows_series:
            temp, total = peak_temp_bytes(flows=nf, channels=256, depth=8,
                                          batch=24, segment=16000,
                                          memory_efficient=True)
            temps.append(temp)
            if temp is not None and nf == 12:
                details["train_peak_temp_mb_ch256_bs24"] = round(temp / 2**20, 1)
                details["train_peak_total_mb_ch256_bs24"] = round(total / 2**20, 1)
        if all(t is not None for t in temps):
            details["train_peak_temp_mb_by_flows"] = {
                str(nf): round(t / 2**20, 1)
                for nf, t in zip(flows_series, temps)}
            details["train_peak_temp_mb_per_flow_slope"] = round(
                (temps[-1] - temps[0]) / (flows_series[-1] - flows_series[0])
                / 2**20, 2)
        # naive contrast at the same config (compile-level, so it reports
        # even where execution would not fit on the chip)
        naive = {}
        for nf in (4, 12):
            temp, total = peak_temp_bytes(flows=nf, channels=256, depth=8,
                                          batch=24, segment=16000,
                                          memory_efficient=False)
            if temp is not None:
                naive[nf] = temp
                if nf == 12:
                    details["train_peak_temp_mb_naive_12flows"] = round(
                        temp / 2**20, 1)
                    details["train_peak_total_mb_naive_12flows"] = round(
                        total / 2**20, 1)
        if len(naive) == 2:
            details["train_peak_temp_mb_per_flow_slope_naive"] = round(
                (naive[12] - naive[4]) / 8 / 2**20, 1)
    except Exception as e:
        details["memcheck_error"] = f"{type(e).__name__}: {e}"[:200]
    mem_specs = {
        "melglow": dict(flows=[4, 12], channels=48, depth=7, batch=8,
                        segment=22016),
        "mr_waveglow": dict(flows=[2, 6], channels=256, depth=8, batch=24,
                            segment=16000),
        "waveglow_rm": dict(flows=[4, 12], channels=256, depth=8, batch=24,
                            segment=16000),
    }
    for arch, spec in mem_specs.items():
        try:
            series = {}
            for nf in spec["flows"]:
                temp, _ = peak_temp_bytes(
                    flows=nf, channels=spec["channels"], depth=spec["depth"],
                    batch=spec["batch"], segment=spec["segment"],
                    memory_efficient=True, arch=arch)
                if temp is not None:
                    series[total_flows(arch, nf)] = temp
            if len(series) == 2:
                ks = sorted(series)
                details[f"train_peak_temp_mb_by_flows_{arch}"] = {
                    str(k): round(series[k] / 2**20, 1) for k in ks}
                details[f"train_peak_temp_slope_{arch}"] = round(
                    (series[ks[1]] - series[ks[0]]) / (ks[1] - ks[0])
                    / 2**20, 2)
        except Exception as e:
            details[f"memcheck_{arch}_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps({
        "metric": "waveglow_synthesis",
        "value": round(khz, 1),
        "unit": "kHz",
        "vs_baseline": round(khz / baseline_khz, 2),
        "details": details,
    }))


if __name__ == "__main__":
    sys.exit(main())
