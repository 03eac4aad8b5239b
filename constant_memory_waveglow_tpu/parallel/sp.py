"""Time-axis (sequence) sharded synthesis.

The reference synthesizes whole files in one pass on one GPU
(``inference.py`` runs arbitrary lengths; models are fully convolutional).
On TPU we can additionally shard a *single long utterance* across chips:
annotate the time axis of z / conditioning with a mesh axis and let the SPMD
partitioner insert the convolution halo exchanges (receptive field is only
``sum(dilations)+1`` samples at frame rate — ``model/waveglow.py:68``).
This is the optional sequence-parallel capability from SURVEY.md §2.3.

Not applicable to WaveFlow's autoregressive inverse (sequential in height,
but its time axis shards the same way inside each step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def synthesize_time_sharded(model, params, h, key, sigma=1.0, *,
                            mesh: Mesh, axis: str = "data"):
    """Run ``model``'s inverse over conditioning ``h`` with the time axis
    sharded over ``mesh.axis``.  Returns audio [B, T] (sharded on T).

    The number of conditioning frames must be divisible by the axis size.
    """
    if h.ndim == 2:
        h = h[None]
    batch, _, steps = h.shape
    n = mesh.shape[axis]
    assert steps % n == 0, f"frames {steps} not divisible by axis size {n}"
    samples = steps * model._hop_length

    z = sigma * jax.random.normal(key, (batch, samples), h.dtype)
    z = jax.device_put(z, NamedSharding(mesh, P(None, axis)))
    h = jax.device_put(h, NamedSharding(mesh, P(None, None, axis)))

    fn = jax.jit(lambda p, z, h: model.reverse(p, z, h)[0])
    return fn(params, z, h)
