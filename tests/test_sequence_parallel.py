"""Time-axis sharded synthesis must match single-device synthesis exactly:
the SPMD partitioner's conv halo exchanges replace nothing in the math."""

import jax
import jax.numpy as jnp
import numpy as np

from constant_memory_waveglow_tpu.models import WaveGlow
from constant_memory_waveglow_tpu.parallel.mesh import make_mesh
from constant_memory_waveglow_tpu.parallel.sp import synthesize_time_sharded

KW = dict(flows=2, n_group=8, n_early_every=4, n_early_size=2, hop_size=256,
          n_mels=16, dilation_channels=16, residual_channels=16,
          skip_channels=16, depth=3, radix=3, bias=False)


def test_time_sharded_synthesis_matches():
    assert jax.device_count() >= 8
    model = WaveGlow(memory_efficient=False, **KW)
    params = model.init(jax.random.PRNGKey(0))
    h = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16))
    key = jax.random.PRNGKey(2)

    # single device: same z draw as the sharded path
    samples = 16 * 256
    z = 0.7 * jax.random.normal(key, (1, samples))
    ref, _ = model.reverse(params, z, h)

    mesh = make_mesh(data=8, model=1)
    out = synthesize_time_sharded(model, params, h, key, 0.7, mesh=mesh)
    assert out.shape == (1, samples)
    err = float(jnp.abs(np.asarray(out) - np.asarray(ref)).max())
    assert err < 1e-4, err
