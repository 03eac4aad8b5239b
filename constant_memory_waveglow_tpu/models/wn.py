"""WN — the non-causal dilated-conv WaveNet stack used inside affine couplings.

Re-design of reference ``NonCausalLayer`` / ``WN`` (``model/waveglow.py:18-105``):
dilations 2^0..2^{depth-1}, gated tanh/sigmoid units, one fused conditioning
projection V: aux -> 2*dilation_channels*depth chunked per layer, residual +
skip connections, and a zero-initialized ``end`` projection so every flow
starts as the identity.  Weight norm on V/start/layers but *not* end
(``model/waveglow.py:72,76,90-96``).

All convolutions run in [B, C, T] layout; the dilated convs and 1x1
projections lower to MXU GEMMs under XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.convs import conv1d, conv1x1, torch_conv_uniform_init
from ..ops.weightnorm import wn_init, wn_weight
from ..ops.gate import gated_tanh_packed


def _conv_param(key, shape, bias, wnorm=True):
    kw, kb = jax.random.split(key)
    w = torch_conv_uniform_init(kw, shape)
    p = {"w": wn_init(w) if wnorm else w}
    if bias:
        fan_in = int(np.prod(shape[1:]))
        bound = 1.0 / np.sqrt(fan_in)
        p["b"] = jax.random.uniform(kb, (shape[0],), minval=-bound, maxval=bound)
    return p


def _apply_conv1x1(p, x):
    y = conv1x1(x, wn_weight(p["w"]))
    if "b" in p:
        y = y + p["b"][None, :, None]
    return y


class WN:
    """Config object; ``init(key) -> params``, ``apply(params, x, y) -> (log_s, t)``."""

    def __init__(self,
                 in_channels,
                 aux_channels,
                 dilation_channels=256,
                 residual_channels=256,
                 skip_channels=256,
                 depth=8,
                 radix=3,
                 bias=False,
                 zero_init=True):
        self.in_channels = in_channels
        self.aux_channels = aux_channels
        self.dilation_channels = dilation_channels
        self.residual_channels = residual_channels
        self.skip_channels = skip_channels
        self.depth = depth
        self.radix = radix
        self.bias = bias
        self.zero_init = zero_init
        self.dilations = [2**i for i in range(depth)]
        self.r_field = sum(self.dilations) + 1  # receptive field (model/waveglow.py:68)

    def init(self, key):
        keys = jax.random.split(key, 3 + self.depth)
        d, r, s, a = (self.dilation_channels, self.residual_channels,
                      self.skip_channels, self.aux_channels)
        params = {
            "V": _conv_param(keys[0], (2 * d * self.depth, a, 1), self.bias),
            "start": _conv_param(keys[1], (r, self.in_channels, 1), self.bias),
            "layers": [],
        }
        for i, _ in enumerate(self.dilations):
            k1, k2 = jax.random.split(keys[3 + i])
            last = i == self.depth - 1
            out_ch = s if last else r + s
            params["layers"].append({
                "W": _conv_param(k1, (2 * d, r, self.radix), self.bias),
                "W_o": _conv_param(k2, (out_ch, d, 1), self.bias),
            })
        end_w = (jnp.zeros((2 * self.in_channels, s, 1))
                 if self.zero_init else torch_conv_uniform_init(keys[2], (2 * self.in_channels, s, 1)))
        params["end"] = {"w": end_w}
        if self.bias:
            params["end"]["b"] = jnp.zeros((2 * self.in_channels,))
        return params

    def apply(self, params, x, y):
        """x: [B, in, T] (the xa half), y: [B, aux, T] -> (log_s, t) each [B, in, T]."""
        d = self.dilation_channels
        x = _apply_conv1x1(params["start"], x)
        v_all = _apply_conv1x1(params["V"], y)  # [B, 2*d*depth, T]

        from ..ops.pallas import fused_wn_enabled, fused_wn_layer
        use_fused = fused_wn_enabled() and not self.bias

        cum_skip = 0.0
        for i, (lp, dil) in enumerate(zip(params["layers"], self.dilations)):
            v = v_all[:, 2 * d * i : 2 * d * (i + 1)]
            last = i == self.depth - 1
            if use_fused:
                out = fused_wn_layer(x, v, wn_weight(lp["W"]["w"]),
                                     wn_weight(lp["W_o"]["w"]), dil,
                                     has_res=not last)
            else:
                xy = conv1d(x, wn_weight(lp["W"]["w"]), dilation=dil)
                if "b" in lp["W"]:
                    xy = xy + lp["W"]["b"][None, :, None]
                z = gated_tanh_packed(xy + v)
                out = _apply_conv1x1(lp["W_o"], z)
                if not last:
                    out = jnp.concatenate(
                        [x + out[:, : self.residual_channels],
                         out[:, self.residual_channels :]], axis=1)
            if last:
                skip = out
            else:
                x = out[:, : self.residual_channels]
                skip = out[:, self.residual_channels :]
            cum_skip = cum_skip + skip

        out = _apply_conv1x1(params["end"], cum_skip)  # [B, 2*in, T]
        log_s, t = jnp.split(out, 2, axis=1)
        return log_s, t
