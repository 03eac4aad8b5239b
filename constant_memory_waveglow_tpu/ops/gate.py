"""Gated activation tanh(a) * sigmoid(b).

Reference: ``@torch.jit.script fused_gate`` (``model/waveglow.py:13-15``).
Under XLA this elementwise pair fuses into the surrounding convolution
epilogue automatically; the deeper fusion of (dilated conv + cond add + gate
+ 1x1) lives in ``ops/pallas``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gated_tanh(a, b):
    return jnp.tanh(a) * jax.nn.sigmoid(b)


def gated_tanh_packed(x):
    """Gate applied to a channel-packed tensor: first half tanh, second sigmoid.

    x: [B, 2C, ...] -> [B, C, ...], matching the reference's
    ``xy.chunk(2, 1)`` + ``fused_gate`` pattern (``model/waveglow.py:42-44``).
    """
    a, b = jnp.split(x, 2, axis=1)
    return gated_tanh(a, b)
