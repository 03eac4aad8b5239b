"""WSRGlow — waveform super-resolution Glow.

TPU-native re-design of reference ``WSRGlow`` (``model/wsrglow.py:8-56``):
a WaveGlow with fixed hyperparameters (12 flows, n_group = 8*r, hop = 8*r,
aux = 8*400 + 51*9 = 3659) whose conditioner is built from the *low-rate
waveform itself*: per 8 low-rate samples, concat (a) mu-law(256) codes
embedded to 400 dims (3200 ch), (b) STFT n_fft=16 hop=8 magnitudes (9 ch),
(c) phase angles quantized to 120 bins, embedded to 50 dims x 9 freqs
(450 ch).  Embedding lookups are gathers; everything else is the WaveGlow
machinery.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .waveglow import WaveGlow
from ..ops.mulaw import mu_law_encode
from ..ops.stft import hann_window, stft_no_center


class WSRGlow(WaveGlow):
    #: cond is the raw waveform, quantized in _get_cond — AMP must not
    #: pre-round it to bf16 (see FlowBase.quantized_cond)
    quantized_cond = True

    def __init__(self, upsample_rate: int = 2, memory_efficient: bool = False, **kwargs):
        super().__init__(
            12, 8 * upsample_rate, 4, 2, 8 * upsample_rate, 8 * 400 + 51 * 9,
            memory_efficient=memory_efficient, **kwargs)
        self.upsample_rate = upsample_rate
        self.n_fft = 16
        self.stft_hop = 8
        self.window = jnp.asarray(hann_window(self.n_fft))
        self.angle_bins = 120

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        params = super().init(k1)
        # torch nn.Embedding default init: N(0, 1)
        params["mu_embed"] = jax.random.normal(k2, (256, 400))
        params["angle_embed"] = jax.random.normal(k3, (self.angle_bins, 50))
        return params

    def _get_cond(self, params, c):
        """c: low-rate waveform [B, T_low] -> [B, 3659, T_low/8]
        (reference ``model/wsrglow.py:37-50``)."""
        # Quantization (mu-law codes, phase bins) and the STFT run in fp32
        # even under bf16 AMP: bf16's 8-bit mantissa cannot resolve 256
        # mu-law levels, and jnp.abs(complex64) is fp32 anyway.  The
        # conditioner is emitted in the params' compute dtype so the flow
        # stack (and _upsample_h's conv) sees uniform dtypes.
        out_dtype = params["mu_embed"].dtype
        c = jnp.clip(c.astype(jnp.float32), -1.0, 1.0)
        b, t_low = c.shape
        codes = mu_law_encode(c, 256)  # [B, T_low]
        c_emb = params["mu_embed"][codes]  # [B, T_low, 400]
        c_emb = c_emb.reshape(b, t_low // 8, 8 * 400).transpose(0, 2, 1)

        cp = jnp.pad(c, [(0, 0), (4, 4)], mode="reflect")
        spec = stft_no_center(cp, self.n_fft, self.stft_hop, self.window)  # [B, 9, F]
        mag = jnp.abs(spec).astype(out_dtype)
        angle = jnp.angle(spec)
        idx = ((angle / jnp.pi + 1.0) * 0.5 * (self.angle_bins - 1)).astype(jnp.int32)
        phase_emb = params["angle_embed"][idx]  # [B, 9, F, 50]
        phase_emb = phase_emb.transpose(0, 1, 3, 2).reshape(b, 9 * 50, -1)
        return jnp.concatenate([c_emb, mag, phase_emb], axis=1)

    def forward_computation(self, params, x, h):
        return super().forward_computation(params, x, self._get_cond(params, h))

    def reverse_computation(self, params, z, h):
        return super().reverse_computation(params, z, self._get_cond(params, h))

    def infer(self, params, h, key, sigma: float = 1.0):
        """h is the low-rate waveform; output has ``upsample_rate`` x samples.

        (The reference's generic ``FlowBase.infer`` mis-sizes z for WSRGlow
        and its eval CLI calls ``model.reverse`` directly instead —
        ``vctk_wsrglow_infer.py:77-78``; this override makes ``infer`` work.)
        """
        if h.ndim == 1:
            h = h[None]
        batch, t_low = h.shape
        samples = t_low * self.upsample_rate
        # z follows the params' compute dtype, not h's: h stays fp32 for the
        # in-model quantization (quantized_cond), yet bf16 synthesis must
        # still run the flow stack in bf16
        z_dtype = params["mu_embed"].dtype
        z = sigma * jax.random.normal(key, (batch, samples), z_dtype)
        if self._reverse_mode:
            x, _ = self.forward_computation(params, z, h)
        else:
            x, _ = self.reverse_computation(params, z, h)
        return jnp.squeeze(x)
