#!/usr/bin/env python
"""WSRGlow super-resolution evaluation over a VCTK-style directory — parity
with reference ``vctk_wsrglow_infer.py:30-89``.

Downsamples each test wav by ``q`` (STFT decimation, or kaiser-sinc with
``--downsample-type sinc`` — both reference modes), super-resolves with the
model's inverse pass, and reports mean log-spectral distance (LSD, NU-Wave
protocol: n_fft 2048, hop 512).

Usage:
  python vctk_wsrglow_infer.py <vctk_test_dir> --ckpt <ckpt> [-q 2]
"""

from __future__ import annotations

import argparse
from pathlib import Path


def lsd(y_hat, y, n_fft=2048, hop=512):
    """Log-spectral distance (reference LSD module,
    ``vctk_wsrglow_infer.py:13-27``)."""
    import jax.numpy as jnp

    from constant_memory_waveglow_tpu.ops.stft import hann_window, stft_center

    w = jnp.asarray(hann_window(n_fft))
    sp = jnp.log10(jnp.clip(jnp.abs(stft_center(y_hat, n_fft, hop, w)) ** 2, 1e-8))
    st = jnp.log10(jnp.clip(jnp.abs(stft_center(y, n_fft, hop, w)) ** 2, 1e-8))
    return float(jnp.mean(jnp.sqrt(jnp.mean((sp - st) ** 2, axis=-2))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("vctk", type=str)
    parser.add_argument("-q", type=int, default=2)
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--sigma", type=float, default=1.0)
    parser.add_argument("--downsample-type", type=str,
                        choices=["sinc", "stft"], default="stft",
                        help="degradation before super-resolving: 'stft' "
                             "(the training degradation) or 'sinc' (kaiser-"
                             "windowed sinc, the kazane.Decimate calibration "
                             "most NU-Wave-protocol papers report against; "
                             "reference vctk_wsrglow_infer.py:46-58)")
    parser.add_argument("--len-bucket", type=int, default=16384,
                        help="pad each low-rate input up to a multiple of "
                             "this many low-rate samples before synthesis "
                             "and trim the output back.  A real VCTK sweep "
                             "has ~unique file lengths, and jitting the "
                             "reverse pass per distinct length means a "
                             "full XLA compile per FILE on a remote-"
                             "compile runtime (docs/design.md §7); buckets "
                             "bound the sweep at O(max_len/bucket) "
                             "compiles.  Zero-padding the tail perturbs "
                             "only the final reverse-receptive-field of "
                             "the kept audio (tests/test_cli.py::"
                             "test_wsrglow_bucket_padding_is_tail_local). "
                             "0 = exact per-file lengths (one compile per "
                             "length)")
    parser.add_argument("--platform", type=str, default=None)
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from constant_memory_waveglow_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from constant_memory_waveglow_tpu.ops import SincDecimate, STFTDecimate
    from constant_memory_waveglow_tpu.ops.weightnorm import fuse_weight_norms
    from constant_memory_waveglow_tpu.training import Experiment, checkpoint
    from constant_memory_waveglow_tpu.utils.audio import load_wav

    config = checkpoint.load_config_from_checkpoint(args.ckpt)
    exp = Experiment(config)
    # convert to the model's compute layout ONCE at load: scan_flows
    # checkpoints are stored per-flow, and without this every re-jitted
    # call (one per unique file length) restacks the params on device
    state = exp.native_state(checkpoint.restore_raw(args.ckpt))
    params = fuse_weight_norms(exp._infer_params(state))
    # commit to the device ONCE — lean exports restore as host numpy, and a
    # numpy arg tree is re-uploaded through the PJRT tunnel on EVERY jitted
    # call (minutes per file at WSRGlow size; see inference.py)
    params = jax.device_put(params)
    model = exp.model

    if args.downsample_type == "sinc":
        # reference calibration: roll_off 0.962, 128 zeros, kaiser beta
        # 14.7697 (vctk_wsrglow_infer.py:46-52)
        downsampler = SincDecimate(args.q)
    else:
        downsampler = STFTDecimate(args.q)
    reverse = jax.jit(lambda p, z, h: model.reverse(p, z, h))

    test_files = sorted(Path(args.vctk).glob("**/*.wav"))
    chunk = 8 * args.q
    bucket = max(8, args.len_bucket // 8 * 8) if args.len_bucket else 0
    lsds = []
    shapes = set()
    key = jax.random.PRNGKey(0)
    for i, f in enumerate(test_files):
        raw_y, sr = load_wav(str(f))
        offset = raw_y.shape[0] % chunk
        y = raw_y[:-offset] if offset else raw_y
        y_low = downsampler(jnp.asarray(y)[None])
        if bucket:
            low_len = y_low.shape[-1]
            padded = -(-low_len // bucket) * bucket
            y_low = jnp.pad(y_low, ((0, 0), (0, padded - low_len)))
        key, sub = jax.random.split(key)
        z = args.sigma * jax.random.normal(sub, (1, y_low.shape[-1] * args.q))
        shapes.add(z.shape)
        y_hat, _ = reverse(params, z, y_low)
        y_hat = np.asarray(y_hat).reshape(-1)[: y.shape[0]]
        if offset:
            y_hat = np.concatenate([y_hat, np.zeros(offset, np.float32)])
        val = lsd(jnp.asarray(y_hat), jnp.asarray(raw_y))
        lsds.append(val)
        print(f"[{i + 1}/{len(test_files)}] {f.name}: lsd={val:.4f}", flush=True)

    print(f"distinct synthesis shapes: {len(shapes)} over "
          f"{len(test_files)} files", flush=True)
    print(sum(lsds) / len(lsds))


if __name__ == "__main__":
    main()
