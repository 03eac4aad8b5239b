"""Negative log-likelihood loss for Gaussian-prior flows.

Reference ``WaveGlowLoss`` (``model/loss.py:4-15``):
  loss = mean_B( 0.5 * sum_t z_t^2 / sigma^2 - logdet ), optionally / T.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.config import Registry

LOSS_REGISTRY = Registry("loss")


@LOSS_REGISTRY.register("WaveGlowLoss")
class WaveGlowLoss:
    def __init__(self, sigma=1.0, elementwise_mean=True):
        self.sigma2 = sigma**2
        self.mean = elementwise_mean

    def __call__(self, z, logdet):
        """z: [B, T], logdet: [B] -> scalar."""
        loss = 0.5 * jnp.sum(z * z, axis=1) / self.sigma2 - logdet
        loss = jnp.mean(loss)
        if self.mean:
            loss = loss / z.shape[1]
        return loss
