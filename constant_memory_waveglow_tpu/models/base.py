"""Base contracts for invertible flow models.

Functional re-design of the reference's ``Reversible`` / ``FlowBase`` OO
dispatch (``model/base.py:7-55``): models are stateless config objects; all
parameters live in external pytrees; ``forward(params, x, h)`` returns
``(z, logdet)`` with ``logdet`` shaped ``[B]`` (or scalar contributions
broadcast into it).

``reverse_mode`` lets a whole model be *constructed inverted* — trained in the
z->x direction — without touching model code, exactly as in the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class Reversible:
    """forward()/reverse() dispatch honoring the ``reverse_mode`` flag
    (reference ``model/base.py:7-28``)."""

    _reverse_mode: bool = False

    def forward_computation(self, params, x, *args, **kwargs):
        raise NotImplementedError

    def reverse_computation(self, params, z, *args, **kwargs):
        raise NotImplementedError

    def forward(self, params, x, *args, **kwargs):
        if self._reverse_mode:
            return self.reverse_computation(params, x, *args, **kwargs)
        return self.forward_computation(params, x, *args, **kwargs)

    def reverse(self, params, z, *args, **kwargs):
        if self._reverse_mode:
            return self.forward_computation(params, z, *args, **kwargs)
        return self.reverse_computation(params, z, *args, **kwargs)


class FlowBase(Reversible):
    """Adds conditioning hop length and z-sampling synthesis
    (reference ``model/base.py:31-55``)."""

    #: True for models that carry mutable state (e.g. MelGlow's BatchNorm).
    has_state: bool = False

    #: True for models whose conditioner input is quantized inside the model
    #: (WSRGlow's mu-law codes / phase bins): the raw cond must NOT be cast
    #: to bf16 by AMP paths — rounding the waveform before quantization
    #: shifts codes near level boundaries.
    quantized_cond: bool = False

    def __init__(self, condition_hop_length: int, reverse_mode: bool = False):
        self._hop_length = condition_hop_length
        self._reverse_mode = reverse_mode

    def init(self, key):
        raise NotImplementedError

    def infer(self, params, h, key, sigma: float = 1.0):
        """Draw z ~ N(0, sigma^2) of length frames*hop and run the inverse
        (reference ``model/base.py:42-55``).  Returns audio with batch dims
        squeezed, matching the reference's ``x.squeeze()``.
        """
        if h.ndim == 2:
            h = h[None]
        batch, _, steps = h.shape
        samples = steps * self._hop_length
        z = sigma * jax.random.normal(key, (batch, samples), h.dtype)
        if self._reverse_mode:
            x, _ = self.forward_computation(params, z, h)
        else:
            x, _ = self.reverse_computation(params, z, h)
        return jnp.squeeze(x)
