#!/usr/bin/env python
"""Inference CLI — analysis + synthesis benchmark, parity with reference
``inference.py:13-73``.

Usage:
  python inference.py <ckpt> <in.wav> <out.wav> [-s sigma] [-n n_group] [--bf16]

Loads a checkpoint (config embedded), fuses weight norms, runs a timed
analysis pass (prints z stats + forward log-likelihood + kHz) and a timed
synthesis pass (prints kHz), and writes the generated audio.  ``--bf16`` is
the TPU analog of the reference's ``--half``.
"""

from __future__ import annotations

import argparse
import math
import time


def main(ckpt, infile, outfile, sigma, bf16, n_group=None, platform=None,
         precision="default", chunk_frames=0):
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp
    import numpy as np

    from constant_memory_waveglow_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from constant_memory_waveglow_tpu.ops import set_default_precision

    # synthesis runs at 'default' matmul precision (bf16 MXU passes) unless
    # overridden — the same numeric path bench.py measures; training keeps
    # its own higher default (see train.py --precision)
    set_default_precision(precision)

    from constant_memory_waveglow_tpu.ops.weightnorm import fuse_weight_norms
    from constant_memory_waveglow_tpu.training import Experiment, checkpoint
    from constant_memory_waveglow_tpu.utils.audio import load_wav, save_wav

    config = checkpoint.load_config_from_checkpoint(ckpt)
    exp = Experiment(config)
    state = exp.native_state(checkpoint.restore_raw(ckpt))
    params = exp._infer_params(state)
    params = fuse_weight_norms(params)  # remove_weight_norms (inference.py:17)

    y, sr = load_wav(infile)
    y = y[None]  # [1, T]

    if n_group is None:  # default: crop to the model's own group size
        n_group = getattr(exp.model, "n_group", None)
    if n_group:
        offset = y.shape[1] % n_group
        if offset:
            y = y[:, :-offset]

    cond = exp.conditioner(jnp.asarray(y))

    dtype = jnp.bfloat16 if bf16 else jnp.float32
    if bf16:
        params = jax.tree_util.tree_map(
            lambda a: a.astype(dtype) if hasattr(a, "astype") else a, params)
        # quantized-cond models (WSRGlow) take the raw waveform and quantize
        # it in-model: keep it fp32 so mu-law/phase codes aren't shifted by
        # bf16 rounding; the model emits its embedded cond in params' dtype
        if not getattr(exp.model, "quantized_cond", False):
            cond = cond.astype(dtype)
        y = y.astype(np.float32)
    else:
        # checkpoints exported with --bf16 store params half-size; upcast
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32)
            if hasattr(a, "dtype") and a.dtype == jnp.bfloat16 else a, params)

    model = exp.model

    # commit params to the device ONCE: lean (pre-fused) exports restore as
    # host numpy and none of the load-path tree_maps touch them, so without
    # this every jitted dispatch re-uploads the full tree through the PJRT
    # tunnel (measured: 158 MB/call = 3.45 s vs 0.11 s on the MusicNet-config
    # forward — a 33x hit that scales with model size, not compute)
    params = jax.device_put(params)
    cond = jax.device_put(cond)
    jax.block_until_ready(params)

    # timing note: block_until_ready can return early on this runtime; a
    # scalar host fetch forces execution with negligible transfer cost.
    fwd = jax.jit(lambda p, x, h: model.forward(p, x, h))
    x_in = jnp.asarray(y, dtype)
    z, logdet = fwd(params, x_in, cond)
    float(np.asarray(z.ravel()[0]))  # compile + first exec
    start = time.time()
    z, logdet = fwd(params, x_in, cond)
    float(np.asarray(z.ravel()[0]))
    cost = time.time() - start
    z = np.asarray(z, np.float64).squeeze()

    print(float(z.mean()), float(z.std(ddof=1)))
    print("Forward LL:", float(np.asarray(logdet, np.float64).mean()) / z.shape[0] - 0.5 *
          (float((z**2).mean()) / sigma**2 + math.log(2 * math.pi) + 2 * math.log(sigma)))
    print("Time cost: {:.4f}, Speed: {:.4f} kHz".format(cost, z.size / cost / 1000))

    key = jax.random.PRNGKey(0)
    if chunk_frames:
        # overlap-discard chunking: bounded memory for arbitrarily long
        # files; bit-equal to the one-pass synthesis for the WaveGlow
        # family, approximately equal (WAVEFLOW_AR_ROUNDS-bounded,
        # checkpoint-dependent — measured at serving export; 'highest'
        # precision only, see streaming.py) for WaveFlow's AR inverse
        from constant_memory_waveglow_tpu.streaming import synthesize_streaming

        infer = lambda p, h, k: synthesize_streaming(
            model, p, h, key=k, sigma=sigma, chunk_frames=chunk_frames)
    else:
        infer = jax.jit(lambda p, h, k: model.infer(p, h, k, sigma))
    x = infer(params, cond, key)
    float(np.asarray(x.ravel()[0]))  # compile + first exec
    start = time.time()
    x = infer(params, cond, key)
    float(np.asarray(x.ravel()[0]))
    cost = time.time() - start

    x = np.asarray(x, np.float32)
    print("Time cost: {:.4f}, Speed: {:.4f} kHz".format(cost, x.size / cost / 1000))
    print(float(x.max()), float(x.min()))

    save_wav(outfile, x.reshape(-1), sr)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Inferencer")
    parser.add_argument("ckpt", type=str)
    parser.add_argument("infile", type=str)
    parser.add_argument("outfile", type=str)
    parser.add_argument("-s", "--sigma", type=float, default=0.6)
    parser.add_argument("-n", "--n-group", type=int, default=None)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--platform", type=str, default=None)
    parser.add_argument("--precision", type=str, default="default",
                        choices=["default", "high", "highest"],
                        help="matmul precision for synthesis (default: bf16 "
                             "MXU passes, the path bench.py measures). "
                             "Also selects the WaveFlow AR kernel: 'default' "
                             "runs the VMEM-resident Pallas flow inverse, "
                             "'high'/'highest' the fp32 DMA kernel or XLA "
                             "scan (~5-6x slower by design; see "
                             "docs/design.md precision->kernel matrix)")
    parser.add_argument("--chunk-frames", type=int, default=0,
                        help="overlap-discard synthesis in chunks of N "
                             "conditioner frames (bounded memory for long "
                             "files; bit-equal for WaveGlow/WSRGlow/MelGlow/"
                             "MRWaveGlow, <=1e-5 for WaveFlow's "
                             "approximate AR halo)")
    args = parser.parse_args()

    main(args.ckpt, args.infile, args.outfile, args.sigma, args.bf16,
         args.n_group, args.platform, args.precision, args.chunk_frames)
