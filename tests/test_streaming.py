"""Chunked overlap-discard synthesis == one-pass synthesis, exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from constant_memory_waveglow_tpu.models import WaveFlow, WaveGlow
from constant_memory_waveglow_tpu.models.wsrglow import WSRGlow
from constant_memory_waveglow_tpu.streaming import (reverse_halo_frames,
                                                    synthesize_streaming)


def test_waveglow_streaming_matches_full_pass():
    m = WaveGlow(flows=3, n_group=8, n_early_every=2, n_early_size=2,
                 hop_size=256, n_mels=80, memory_efficient=True,
                 zero_init=False, dilation_channels=16, residual_channels=16,
                 skip_channels=16, depth=3, radix=3, bias=False)
    params = m.init(jax.random.PRNGKey(0))
    frames = 23  # odd: exercises clamped boundary chunks + a short tail
    h = jax.random.normal(jax.random.PRNGKey(1), (2, 80, frames))
    z = 0.7 * jax.random.normal(jax.random.PRNGKey(2), (2, frames * 256))

    full, _ = m.reverse(params, z, h)
    chunked = synthesize_streaming(m, params, h, z=z, chunk_frames=6)
    assert chunked.shape == full.shape
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               atol=1e-5)

    # the key= path draws the same noise infer would
    via_key = synthesize_streaming(m, params, h, key=jax.random.PRNGKey(3),
                                   sigma=0.7, chunk_frames=6)
    want = m.infer(params, h, jax.random.PRNGKey(3), sigma=0.7)
    np.testing.assert_allclose(np.asarray(via_key[0]), np.asarray(want[0]),
                               atol=1e-5)


def test_wsrglow_streaming_matches_full_pass():
    m = WSRGlow(upsample_rate=2, memory_efficient=True, dilation_channels=8,
                residual_channels=8, skip_channels=8, depth=2, radix=3,
                bias=False)
    params = m.init(jax.random.PRNGKey(0))
    t_low = 8 * 21
    h = jax.random.uniform(jax.random.PRNGKey(1), (1, t_low),
                           minval=-0.5, maxval=0.5)
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 2 * t_low))

    full, _ = m.reverse(params, z, h)
    chunked = synthesize_streaming(m, params, h, z=z, chunk_frames=5)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               atol=1e-5)


def test_streaming_halo_bound_is_tight_enough():
    """An intentionally small halo must break equality — i.e. the test
    above is actually sensitive to halo correctness."""
    m = WaveGlow(flows=3, n_group=8, n_early_every=2, n_early_size=2,
                 hop_size=256, n_mels=80, memory_efficient=False,
                 zero_init=False, dilation_channels=16, residual_channels=16,
                 skip_channels=16, depth=3, radix=3, bias=False)
    params = m.init(jax.random.PRNGKey(0))
    h = jax.random.normal(jax.random.PRNGKey(1), (1, 80, 24))
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 24 * 256))
    full, _ = m.reverse(params, z, h)
    bad = synthesize_streaming(m, params, h, z=z, chunk_frames=6,
                               halo_frames=0)
    assert float(jnp.abs(bad - full).max()) > 1e-3
    assert reverse_halo_frames(m) >= 1


def _perturbed_waveflow(flows=2, scale=0.03):
    """Small WaveFlow with non-identity flows: the zero-init 'end' weights
    (the only all-zero leaves) get a trained-scale perturbation so the AR
    inverse actually mixes context."""
    m = WaveFlow(flows=flows, n_group=8, n_mels=80, use_conv1x1=False,
                 memory_efficient=False, dilation_channels=8,
                 residual_channels=8, skip_channels=8, bias=False)
    params = m.init(jax.random.PRNGKey(0))
    leaves, treedef = jax.tree_util.tree_flatten(params)
    key = jax.random.PRNGKey(7)
    out = []
    for leaf in leaves:
        if leaf.ndim and not np.any(np.asarray(leaf)):
            key, sub = jax.random.split(key)
            leaf = scale * jax.random.normal(sub, leaf.shape, leaf.dtype)
        out.append(leaf)
    return m, jax.tree_util.tree_unflatten(treedef, out)


def test_waveflow_streaming_matches_full_pass():
    """WaveFlow chunked synthesis: approximate halo (module docstring) must
    land within 1e-5 of the one-pass at the default WAVEFLOW_AR_ROUNDS."""
    m, params = _perturbed_waveflow()
    frames = 120
    halo = reverse_halo_frames(m)
    assert halo * 2 + 30 < frames, "test must exercise real clipping"
    h = jax.random.normal(jax.random.PRNGKey(1), (1, 80, frames))
    z = 0.7 * jax.random.normal(jax.random.PRNGKey(2), (1, frames * 256))

    full, _ = m.reverse(params, z, h)
    assert float(jnp.abs(full - z).max()) > 1e-2, "flows must be non-trivial"
    chunked = synthesize_streaming(m, params, h, z=z, chunk_frames=30)
    assert chunked.shape == full.shape
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               atol=1e-5)


def test_waveflow_streaming_error_decays():
    """The AR-compounded halo error must decay with halo size (so the
    default is measured, not asserted)."""
    m, params = _perturbed_waveflow()
    frames = 120
    h = jax.random.normal(jax.random.PRNGKey(1), (1, 80, frames))
    z = 0.7 * jax.random.normal(jax.random.PRNGKey(2), (1, frames * 256))
    full, _ = m.reverse(params, z, h)

    errs = []
    for halo in (2, 18, reverse_halo_frames(m)):
        c = synthesize_streaming(m, params, h, z=z, chunk_frames=30,
                                 halo_frames=halo)
        errs.append(float(jnp.abs(c - full).max()))
    # decay must be monotone, but once the error reaches the fp32 noise
    # floor (~2e-7) a larger halo can only tie it — non-strict on the tail
    assert errs[0] > errs[1] >= errs[2], errs
    assert errs[0] > 1e-4  # sensitivity: tiny halos visibly break equality
    assert errs[1] < errs[0] / 10  # the decay itself is substantial
    assert errs[2] <= 1e-5


def test_melglow_streaming_matches_full_pass():
    """MelGlow's LVC halo is closed-form too: the kernel predictor is
    pointwise over frames, so chunking kernels with the conditioner is
    exact."""
    from constant_memory_waveglow_tpu.models import MelGlow

    m = MelGlow(flows=3, n_group=8, n_early_every=2, n_early_size=2,
                hop_size=256, n_mels=80, memory_efficient=True,
                dilation_channels=16, residual_channels=16, skip_channels=16,
                depth=3, radix=3, predict_channels=8, predict_layers=1,
                bias=False)
    v = m.init(jax.random.PRNGKey(0))
    params = {"params": v["params"], "state": v["state"]}
    frames = 21
    h = jax.random.normal(jax.random.PRNGKey(1), (1, 80, frames))
    z = jax.random.normal(jax.random.PRNGKey(2), (1, frames * 256))

    full, _ = m.reverse(params, z, h)
    chunked = synthesize_streaming(m, params, h, z=z, chunk_frames=5)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               atol=1e-5)


def test_mr_waveglow_streaming_matches_full_pass():
    """MRWaveGlow's Haar pyramid splits channels, not time — the closed-form
    halo covers all level + prior flows at the unchanged T'-rate."""
    from constant_memory_waveglow_tpu.models import MRWaveGlow

    m = MRWaveGlow(prior_flows=2, n_group=8, hop_size=256, n_mels=80,
                   memory_efficient=True, levels=3, flows=2,
                   zero_init=False, dilation_channels=16,
                   residual_channels=16, skip_channels=16, depth=3,
                   radix=3, bias=False)
    params = m.init(jax.random.PRNGKey(0))
    frames = 25  # not a multiple of chunk_frames: clamped boundary + tail
    h = jax.random.normal(jax.random.PRNGKey(1), (2, 80, frames))
    z = 0.7 * jax.random.normal(jax.random.PRNGKey(2), (2, frames * 256))

    full, _ = m.reverse(params, z, h)
    chunked = synthesize_streaming(m, params, h, z=z, chunk_frames=6)
    assert chunked.shape == full.shape
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               atol=1e-5)

    # halo sensitivity: too-small halos must visibly break equality
    bad = synthesize_streaming(m, params, h, z=z, chunk_frames=6,
                               halo_frames=0)
    assert float(jnp.abs(bad - full).max()) > 1e-3
