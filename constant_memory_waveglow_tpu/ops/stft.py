"""STFT, mel filterbank, and the on-the-fly MelSpec conditioner.

The reference computes conditioning mel-spectrograms on the fly, on device,
every step (``model/condition.py:7-19``, ``README.md:30``) via torchaudio's
``MelSpectrogram``.  This module re-implements those exact semantics on top of
XLA's FFT: HTK mel scale, ``norm=None``, periodic Hann window, power-2
spectrum, ``center=False`` with the reference's asymmetric reflection padding
``(n_fft/2 - hop/2, n_fft/2 + hop/2)``, and ``log(x + 1e-7)``.

Framing is a static gather; the mel projection is a single [n_mels, n_freqs]
GEMM which XLA places on the MXU.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .convs import get_default_precision


def hann_window(n, dtype=np.float32):
    """Periodic Hann window (torch.hann_window(periodic=True) semantics)."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(dtype)


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(n_freqs, f_min, f_max, n_mels, sample_rate, dtype=np.float32):
    """Triangular mel filterbank [n_freqs, n_mels], HTK scale, no norm.

    Matches ``torchaudio.functional.melscale_fbanks(norm=None,
    mel_scale='htk')``, which is what the reference's ``MelSpectrogram``
    conditioner uses (``model/condition.py:13-16`` with default kwargs).
    """
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_min, m_max = _hz_to_mel_htk(f_min), _hz_to_mel_htk(f_max)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(dtype)


def frame_signal(x, frame_length, hop):
    """[..., T] -> [..., n_frames, frame_length] with no padding (center=False)."""
    t = x.shape[-1]
    n = 1 + (t - frame_length) // hop
    # jnp.arange (not np): n may be a symbolic dimension under jax.export
    # shape polymorphism; for static shapes XLA constant-folds the iota
    idx = jnp.arange(n)[:, None] * hop + jnp.arange(frame_length)[None, :]
    return x[..., idx]


def stft_center(x, n_fft, hop, window):
    """torch.stft(center=True, pad_mode='reflect', onesided) -> complex [..., F, frames]."""
    pad = n_fft // 2
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = frame_signal(x, n_fft, hop) * window
    return jnp.fft.rfft(frames, axis=-1).swapaxes(-1, -2)


def stft_no_center(x, n_fft, hop, window):
    """torch.stft(center=False) -> complex [..., F, frames]."""
    frames = frame_signal(x, n_fft, hop) * window
    return jnp.fft.rfft(frames, axis=-1).swapaxes(-1, -2)


def istft_center(z, n_fft, hop, window):
    """torch.istft(center=True, length=None) inverse of ``stft_center``.

    Overlap-add of windowed inverse FFT frames, normalized by the summed
    squared window, trimmed by n_fft//2 on both ends.
    """
    # z: [..., F, frames]
    frames = jnp.fft.irfft(z.swapaxes(-1, -2), n=n_fft, axis=-1)  # [..., n, n_fft]
    n = frames.shape[-2]
    t_full = n_fft + hop * (n - 1)
    idx = np.arange(n)[:, None] * hop + np.arange(n_fft)[None, :]

    y = jnp.zeros(frames.shape[:-2] + (t_full,), frames.dtype)
    y = y.at[..., idx].add(frames * window)

    wsq = np.zeros(t_full, dtype=np.float64)
    np.add.at(wsq, idx, (np.asarray(window, np.float64) ** 2)[None, :].repeat(n, 0))
    wsq = np.where(wsq > 1e-11, wsq, 1.0).astype(frames.dtype)

    y = y / wsq
    pad = n_fft // 2
    return y[..., pad : t_full - pad]


def stft_magnitude(x, n_fft, hop, window, power=2.0):
    """Power/magnitude spectrogram [..., F, frames], center=False."""
    z = stft_no_center(x, n_fft, hop, window)
    mag = jnp.abs(z)
    if power == 1.0:
        return mag
    if power == 2.0:
        return mag * mag
    return mag**power


class MelSpec:
    """On-device log-mel conditioner; parity with reference ``MelSpec``
    (``model/condition.py:7-19``): ReflectionPad1d((n_fft/2 - hop/2,
    n_fft/2 + hop/2)) + MelSpectrogram(center=False) + log(x + 1e-7).

    Stateless (no trainable parameters); callable on [B, T] or [T] -> [B, n_mels, frames].
    """

    def __init__(self, sr, n_fft, hop_length, f_min=0.0, f_max=None, n_mels=128, **kwargs):
        self.sr = sr
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.n_mels = n_mels
        f_max = sr / 2 if f_max is None else f_max
        self.window = jnp.asarray(hann_window(n_fft))
        self.fbank = jnp.asarray(mel_filterbank(n_fft // 2 + 1, f_min, f_max, n_mels, sr))
        self.pad_l = n_fft // 2 - hop_length // 2
        self.pad_r = n_fft // 2 + hop_length // 2

    def __call__(self, x):
        if x.ndim == 1:
            x = x[None]
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(self.pad_l, self.pad_r)], mode="reflect")
        spec = stft_magnitude(x, self.n_fft, self.hop_length, self.window, power=2.0)
        # [B, F, frames] x [F, n_mels] -> [B, n_mels, frames]
        mel = lax.dot_general(
            self.fbank.T,
            spec,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=get_default_precision(),
        ).transpose(1, 0, 2)
        return jnp.log(mel + 1e-7)
