"""Config-space fuzz: inversion roundtrips across randomized architectures.

Fixed-config tests can miss boundary regimes (the fused-AR pad bug only
appeared at unaligned widths; odd channel counts stress the coupling split;
radix/dilation schedules stress halo math).  Each family gets a few seeded
random configurations; forward->reverse must reconstruct the input and the
two directions' logdets must cancel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from constant_memory_waveglow_tpu.models import (MRWaveGlow, MelGlow,
                                                 WaveFlow, WaveGlow)

SEEDS = [11, 22, 33]


def _roundtrip(model, variables, x, h, tol):
    if getattr(model, "has_state", False):
        params = {"params": variables["params"], "state": variables["state"]}
    else:
        params = variables
    z, ld_f = model.forward(params, x, h)
    x2, ld_r = model.reverse(params, z, h)
    assert float(jnp.abs(x2 - x).max()) < tol, float(jnp.abs(x2 - x).max())
    # reverse logdet is the negation of forward's at the reconstructed point
    assert float(jnp.abs(ld_f + ld_r).max()) < 1e-2 * max(
        1.0, float(jnp.abs(ld_f).max()))


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_waveglow(seed):
    r = np.random.default_rng(seed)
    # n_group must divide hop (the depthwise upsampler stride is
    # hop/n_group, reference model/waveglow.py:126-129)
    n_group = int(r.choice([4, 8, 16]))
    cfg = dict(
        flows=int(r.integers(2, 5)), n_group=n_group,
        n_early_every=int(r.choice([2, 3, 100])),
        n_early_size=2, hop_size=256, n_mels=80,
        memory_efficient=bool(r.integers(0, 2)), zero_init=False,
        dilation_channels=int(r.choice([8, 24])),
        residual_channels=int(r.choice([8, 24])),
        skip_channels=int(r.choice([8, 24])),
        depth=int(r.integers(2, 5)), radix=int(r.choice([3, 5])),
        bias=bool(r.integers(0, 2)))
    m = WaveGlow(**cfg)
    v = m.init(jax.random.PRNGKey(seed))
    frames = int(r.choice([7, 12]))
    x = jax.random.normal(jax.random.PRNGKey(seed + 1),
                          (2, frames * 256)) * 0.3
    # audio must be a multiple of n_group (inference.py crops the same way)
    x = x[:, : x.shape[1] - x.shape[1] % n_group]
    h = jax.random.normal(jax.random.PRNGKey(seed + 2), (2, 80, frames))
    _roundtrip(m, v, x, h, 5e-4)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_waveflow(seed):
    r = np.random.default_rng(seed)
    n_group = int(r.choice([8, 16, 32]))  # hd>1 schedules at 32
    cfg = dict(
        flows=int(r.integers(2, 4)), n_group=n_group, n_mels=80,
        use_conv1x1=bool(r.integers(0, 2)),
        memory_efficient=bool(r.integers(0, 2)),
        dilation_channels=int(r.choice([8, 16])),
        residual_channels=int(r.choice([8, 16])),
        skip_channels=int(r.choice([8, 16])),
        bias=False, zero_init=False)
    m = WaveFlow(**cfg)
    v = m.init(jax.random.PRNGKey(seed))
    frames = int(r.choice([3, 5]))
    x = jax.random.normal(jax.random.PRNGKey(seed + 1),
                          (1, frames * 256)) * 0.3
    h = jax.random.normal(jax.random.PRNGKey(seed + 2), (1, 80, frames))
    _roundtrip(m, v, x, h, 2e-3)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_melglow(seed):
    r = np.random.default_rng(seed)
    cfg = dict(
        flows=int(r.integers(2, 4)), n_group=8,
        n_early_every=int(r.choice([2, 100])), n_early_size=2,
        hop_size=256, n_mels=80, memory_efficient=bool(r.integers(0, 2)),
        dilation_channels=int(r.choice([8, 16])),
        residual_channels=int(r.choice([8, 16])),
        skip_channels=int(r.choice([8, 16])),
        depth=int(r.integers(2, 4)), radix=int(r.choice([3, 5])),
        predict_channels=8, predict_layers=int(r.integers(1, 3)), bias=False)
    m = MelGlow(**cfg)
    v = m.init(jax.random.PRNGKey(seed))
    frames = int(r.choice([8, 12]))
    x = jax.random.normal(jax.random.PRNGKey(seed + 1),
                          (1, frames * 256)) * 0.3
    h = jax.random.normal(jax.random.PRNGKey(seed + 2), (1, 80, frames))
    _roundtrip(m, v, x, h, 5e-4)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_mr_waveglow(seed):
    r = np.random.default_rng(seed)
    cfg = dict(
        flows=int(r.integers(2, 4)), prior_flows=int(r.integers(2, 4)),
        n_group=8, hop_size=256, n_mels=80,
        levels=int(r.choice([2, 3])),
        memory_efficient=bool(r.integers(0, 2)),
        dilation_channels=int(r.choice([8, 16])),
        residual_channels=int(r.choice([8, 16])),
        skip_channels=int(r.choice([8, 16])),
        depth=int(r.integers(2, 4)), radix=3, bias=False)
    m = MRWaveGlow(**cfg)
    v = m.init(jax.random.PRNGKey(seed))
    frames = int(r.choice([8, 12]))
    x = jax.random.normal(jax.random.PRNGKey(seed + 1),
                          (1, frames * 256)) * 0.3
    h = jax.random.normal(jax.random.PRNGKey(seed + 2), (1, 80, frames))
    _roundtrip(m, v, x, h, 5e-4)
