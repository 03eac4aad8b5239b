"""Conditioner parity tests against torch (CPU) reference implementations.

torchaudio is not on the image, so STFT semantics are checked against
``torch.stft``/``torch.istft`` directly, and the full MelSpec pipeline against
a torch re-implementation using the same (independently validated) filterbank
formula."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from constant_memory_waveglow_tpu.ops.stft import (
    hann_window, stft_center, stft_no_center, istft_center, mel_filterbank, MelSpec)
from constant_memory_waveglow_tpu.ops.lowpass import LowPass, STFTDecimate
from constant_memory_waveglow_tpu.ops.mulaw import mu_law_encode


def test_hann_window_matches_torch():
    w = hann_window(1024)
    wt = torch.hann_window(1024).numpy()
    assert np.allclose(w, wt, atol=1e-6)


@pytest.mark.parametrize("n_fft,hop", [(1024, 256), (16, 8)])
def test_stft_center_matches_torch(n_fft, hop):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    w = hann_window(n_fft)
    z = stft_center(jnp.asarray(x), n_fft, hop, jnp.asarray(w))
    zt = torch.stft(torch.from_numpy(x), n_fft, hop,
                    window=torch.from_numpy(w), return_complex=True).numpy()
    assert z.shape == zt.shape
    assert np.abs(np.asarray(z) - zt).max() < 1e-3


def test_stft_no_center_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    n_fft, hop = 1024, 256
    w = hann_window(n_fft)
    z = stft_no_center(jnp.asarray(x), n_fft, hop, jnp.asarray(w))
    zt = torch.stft(torch.from_numpy(x), n_fft, hop, window=torch.from_numpy(w),
                    center=False, return_complex=True).numpy()
    assert z.shape == zt.shape
    assert np.abs(np.asarray(z) - zt).max() < 1e-3


def test_istft_roundtrip_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    n_fft, hop = 1024, 256
    w = hann_window(n_fft)
    z = stft_center(jnp.asarray(x), n_fft, hop, jnp.asarray(w))
    y = istft_center(z, n_fft, hop, jnp.asarray(w))
    yt = torch.istft(torch.from_numpy(np.asarray(z)), n_fft, hop,
                     window=torch.from_numpy(w)).numpy()
    assert y.shape == yt.shape
    assert np.abs(np.asarray(y) - yt).max() < 1e-4
    # and the roundtrip itself reconstructs the signal
    assert np.abs(np.asarray(y) - x[:, : y.shape[-1]]).max() < 1e-4


def test_mel_filterbank_properties():
    fb = mel_filterbank(513, 0.0, 8000.0, 80, 22050)
    assert fb.shape == (513, 80)
    assert fb.min() >= 0
    # triangles peak at 1 nowhere necessarily, but each filter is nonzero
    assert (fb.sum(0) > 0).all()
    # filters ordered in frequency: argmax increases monotonically
    peaks = fb.argmax(0)
    assert (np.diff(peaks) >= 0).all()


def test_melspec_matches_torch_pipeline():
    """End-to-end MelSpec vs a torch implementation of the same definition
    (reflection pad + stft(center=False) + power + fbank + log)."""
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((2, 4096)) * 0.3).astype(np.float32)
    sr, n_fft, hop, n_mels, f_max = 22050, 1024, 256, 80, 8000

    m = MelSpec(sr, n_fft, hop, f_max=f_max, n_mels=n_mels)
    out = np.asarray(m(jnp.asarray(x)))

    xt = torch.from_numpy(x)
    pad_l, pad_r = n_fft // 2 - hop // 2, n_fft // 2 + hop // 2
    xt = torch.nn.functional.pad(xt.unsqueeze(1), (pad_l, pad_r), mode="reflect").squeeze(1)
    zt = torch.stft(xt, n_fft, hop, window=torch.hann_window(n_fft),
                    center=False, return_complex=True)
    spec = zt.abs() ** 2
    fb = torch.from_numpy(mel_filterbank(n_fft // 2 + 1, 0.0, f_max, n_mels, sr))
    melt = torch.einsum("fm,bft->bmt", fb, spec)
    ref = torch.log(melt + 1e-7).numpy()

    assert out.shape == ref.shape
    assert np.abs(out - ref).max() < 2e-3


def test_stft_decimate_matches_torch():
    """STFTDecimate vs the reference pipeline done in torch
    (``model/condition.py:22-66``)."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    r, nfft, hop = 2, 1024, 256

    out = np.asarray(STFTDecimate(r)(jnp.asarray(x)))

    xt = torch.from_numpy(x)
    w = torch.hann_window(nfft)
    xp = torch.nn.functional.pad(xt, (0, nfft))
    z = torch.stft(xp, nfft, hop, window=w, return_complex=True)
    filt = torch.ones(nfft // 2 + 1)
    filt[int((nfft // 2 + 1) / r):] = 0
    z = z * filt[None, :, None]
    y = torch.istft(z, nfft, hop, window=w)[:, :4096]
    ref = y[:, ::r].numpy()

    assert out.shape == ref.shape
    assert np.abs(out - ref).max() < 1e-3


def test_sinc_decimate_matches_scipy_upfirdn():
    """SincDecimate == scipy.signal.upfirdn with the identical kaiser-sinc
    kernel (the kazane.Decimate calibration the reference eval CLI uses,
    ``vctk_wsrglow_infer.py:46-52``), plus its filtering contract."""
    from scipy.signal import upfirdn

    from constant_memory_waveglow_tpu.ops import SincDecimate

    rng = np.random.default_rng(5)
    q, num_zeros = 2, 128
    x = rng.standard_normal((3, 4096)).astype(np.float32)
    dec = SincDecimate(q, num_zeros=num_zeros)
    out = np.asarray(dec(jnp.asarray(x)))
    assert out.shape == (3, 2048)

    ref = upfirdn(np.asarray(dec.kernel, np.float64), x.astype(np.float64),
                  up=1, down=q, axis=-1)[:, num_zeros : num_zeros + 2048]
    assert np.abs(out - ref).max() < 1e-5

    # odd length: ceil(T/q) samples out (kazane convention)
    assert dec(jnp.asarray(x[:, :4095])).shape == (3, 2048)

    # passband tone preserved, stopband tone crushed (cutoff = 0.962*Nyq/q)
    t = np.arange(8192)
    lo = np.sin(2 * np.pi * 0.10 * t, dtype=np.float32)[None]
    hi = np.sin(2 * np.pi * 0.40 * t, dtype=np.float32)[None]
    lo_d = np.asarray(dec(jnp.asarray(lo)))[0, 512:-512]
    hi_d = np.asarray(dec(jnp.asarray(hi)))[0, 512:-512]
    want = np.sin(2 * np.pi * 0.10 * t[::2], dtype=np.float32)[512:-512]
    assert np.abs(lo_d - want).max() < 1e-3   # below cutoff: unit gain
    assert np.abs(hi_d).max() < 1e-3          # above cutoff: rejected


def test_mu_law_matches_torch_formula():
    x = np.linspace(-1.2, 1.2, 1001).astype(np.float32)
    got = np.asarray(mu_law_encode(jnp.asarray(x), 256))
    xt = torch.from_numpy(np.clip(x, -1, 1))
    mu = 255.0
    y = torch.sign(xt) * torch.log1p(mu * torch.abs(xt)) / np.log1p(mu)
    ref = ((y + 1) / 2 * mu + 0.5).to(torch.int64).numpy()
    assert (got == ref).all()


@pytest.mark.parametrize(
    "cin,cog,groups,kernel,stride,pad,t",
    [
        (80, 1, 80, 129, 64, 33, 17),   # MusicNet upsampler (hop 512)
        (80, 1, 80, 65, 32, 17, 23),    # flagship upsampler (hop 256)
        (6, 4, 2, 7, 3, 2, 11),         # grouped, kernel not a stride multiple
        (5, 3, 1, 9, 4, 0, 8),          # dense, no padding
        (4, 2, 1, 5, 1, 2, 13),         # stride-1 degenerate path
        (3, 2, 1, 4, 5, 1, 6),          # kernel < stride (gappy output)
    ],
)
def test_conv_transpose1d_matches_torch(cin, cog, groups, kernel, stride,
                                        pad, t):
    """Polyphase ConvTranspose1d lowering (ops/convs.py) vs torch.

    The textbook lhs_dilation lowering degrades badly in XLA:TPU at large
    stride (measured on the hop-512 MusicNet upsampler); the polyphase
    einsum must stay bit-compatible with torch.nn.functional
    .conv_transpose1d across strides, groups, and paddings.
    """
    from constant_memory_waveglow_tpu.ops.convs import conv_transpose1d

    rng = np.random.default_rng(kernel * 7 + stride)
    x = rng.standard_normal((2, cin, t)).astype(np.float32)
    w = rng.standard_normal((cin, cog, kernel)).astype(np.float32)
    ref = torch.nn.functional.conv_transpose1d(
        torch.from_numpy(x), torch.from_numpy(w), stride=stride,
        padding=pad, groups=groups).numpy()
    got = np.asarray(conv_transpose1d(jnp.asarray(x), jnp.asarray(w),
                                      stride=stride, padding=pad,
                                      groups=groups, precision="highest"))
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() / (np.abs(ref).max() + 1e-12) < 1e-5
