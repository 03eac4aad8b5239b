"""Mu-law companding (torchaudio ``MuLawEncoding`` semantics).

Used by the WSRGlow conditioner (``model/wsrglow.py:27-30``).
"""

from __future__ import annotations

import jax.numpy as jnp


def mu_law_encode(x, quantization_channels=256):
    """x in [-1, 1] -> int32 codes in [0, quantization_channels)."""
    mu = quantization_channels - 1.0
    x = jnp.clip(x, -1.0, 1.0)
    y = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(mu)
    return ((y + 1.0) / 2.0 * mu + 0.5).astype(jnp.int32)
