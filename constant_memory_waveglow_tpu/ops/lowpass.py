"""STFT-domain low-pass filtering and decimation.

Reference: ``LowPass`` / ``STFTDecimate`` (``model/condition.py:22-66``) — the
WSRGlow training degradation and eval downsampler.  Semantics: zero-pad the
signal by n_fft, torch.stft (center=True, reflect), zero all bins at or above
``ratio * (n_fft/2 + 1)``, istft, trim to the original length; STFTDecimate
then subsamples ``[..., ::r]``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .stft import hann_window, stft_center, istft_center


class LowPass:
    def __init__(self, nfft=1024, hop=256,
                 ratio=(1 / 6, 1 / 3, 1 / 2, 2 / 3, 3 / 4, 4 / 5, 5 / 6, 1 / 1)):
        self.nfft = nfft
        self.hop = hop
        self.window = jnp.asarray(hann_window(nfft))
        f = np.ones((len(ratio), nfft // 2 + 1), dtype=np.float32)
        for i, r in enumerate(ratio):
            f[i, int((nfft // 2 + 1) * r):] = 0.0
        self.filters = jnp.asarray(f)

    def __call__(self, x, r):
        """x: [..., T]; r: per-item filter index [B] or scalar int."""
        orig_shape = x.shape
        t = orig_shape[-1]
        x = x.reshape(-1, t)
        x = jnp.pad(x, [(0, 0), (0, self.nfft)])
        z = stft_center(x, self.nfft, self.hop, self.window)  # [B, F, frames]
        filt = self.filters[r]
        if filt.ndim == 1:
            filt = filt[None]
        z = z * filt[:, :, None]
        y = istft_center(z, self.nfft, self.hop, self.window)
        y = y[:, :t]
        return y.reshape(orig_shape)


class STFTDecimate(LowPass):
    """Low-pass at 1/r then subsample by r (``model/condition.py:60-66``)."""

    def __init__(self, r, *args, **kwargs):
        super().__init__(*args, ratio=[1 / r], **kwargs)
        self.r = r

    def __call__(self, x):
        return super().__call__(x, 0)[..., :: self.r]


class SincDecimate:
    """Kaiser-windowed sinc decimation — the ``kazane.Decimate`` analog the
    reference eval CLI offers as ``--downsample-type sinc``
    (``vctk_wsrglow_infer.py:46-58``), with the same calibration: roll-off
    0.962, 128 zero crossings, symmetric kaiser window with beta 14.7697
    (torch.kaiser_window(periodic=False)).

    The kernel is ``sinc(t * roll_off / q) * kaiser(n, beta) * roll_off / q``
    over ``n = 2 * num_zeros * q + 1`` taps centered at 0, applied with
    stride ``q`` and symmetric zero padding of ``num_zeros * q`` — output
    sample i is the filtered input at position ``i*q`` and the output length
    is ``ceil(T / q)``.  Cutoff = ``roll_off`` x the output Nyquist.  On TPU
    this is one strided conv on the MXU.
    """

    def __init__(self, q, num_zeros=128, roll_off=0.962,
                 beta=14.769656459379492):
        self.q = q
        n = 2 * num_zeros * q + 1
        t = (np.arange(n) - (n - 1) / 2) * roll_off / q
        kernel = np.sinc(t) * np.kaiser(n, beta) * roll_off / q
        self.kernel = jnp.asarray(kernel, jnp.float32)
        self.pad = num_zeros * q

    def __call__(self, x):
        """x: [..., T] -> [..., ceil(T/q)]."""
        from jax import lax

        orig_shape = x.shape
        t = orig_shape[-1]
        x = x.reshape(-1, 1, t)
        y = lax.conv_general_dilated(
            x, self.kernel[None, None, :], window_strides=(self.q,),
            padding=[(self.pad, self.pad)],
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=lax.Precision.HIGHEST)
        return y.reshape(orig_shape[:-1] + (y.shape[-1],))
