"""Pallas fused WN layer (interpret mode on CPU): forward parity vs the XLA
formulation, gradient parity through the custom_vjp fallback, and the
whole-WN-stack path with the fusion flag enabled."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from constant_memory_waveglow_tpu.ops.pallas.wn_layer import (
    fused_wn_layer, wn_layer_xla)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    B, C, T = 2, 64, 1000
    x = jnp.asarray(rng.standard_normal((B, C, T)), jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((B, 2 * C, T)), jnp.float32) * 0.3
    wd = jnp.asarray(rng.standard_normal((2 * C, C, 3)), jnp.float32) * 0.05
    wo = jnp.asarray(rng.standard_normal((2 * C, C)), jnp.float32) * 0.05
    return x, v, wd, wo


@pytest.mark.parametrize("dil", [1, 4, 32])
def test_forward_parity(data, dil):
    x, v, wd, wo = data
    ref = wn_layer_xla(x, v, wd, wo, dil, True)
    got = fused_wn_layer(x, v, wd, wo, dil, True, t_tile=256, interpret=True)
    # kernel uses bf16 MXU operands (XLA 'default'-precision semantics)
    assert float(jnp.abs(ref - got).max()) < 5e-2


def test_last_layer_no_residual(data):
    x, v, wd, _ = data
    wo = jnp.asarray(np.random.default_rng(1).standard_normal((64, 64)),
                     jnp.float32) * 0.05
    ref = wn_layer_xla(x, v, wd, wo, 2, False)
    got = fused_wn_layer(x, v, wd, wo, 2, False, t_tile=256, interpret=True)
    assert float(jnp.abs(ref - got).max()) < 5e-2


def test_grad_parity(data):
    """With an identical fixed cotangent, the fused layer's custom bwd (the
    XLA VJP at the same inputs) must match the direct XLA VJP exactly."""
    x, v, wd, wo = data
    out1, vjp1 = jax.vjp(lambda x, v, wd, wo: fused_wn_layer(
        x, v, wd, wo, 4, True, t_tile=256, interpret=True), x, v, wd, wo)
    out2, vjp2 = jax.vjp(lambda x, v, wd, wo: wn_layer_xla(
        x, v, wd, wo, 4, True), x, v, wd, wo)
    ct = jnp.ones_like(out2)
    for a, b in zip(vjp1(ct), vjp2(ct)):
        assert float(jnp.abs(a - b).max()) < 1e-5


def test_uneven_length_padding(data):
    """T not divisible by the tile: output must match on the valid range."""
    x, v, wd, wo = data
    x, v = x[..., :777], v[..., :777]
    ref = wn_layer_xla(x, v, wd, wo, 8, True)
    got = fused_wn_layer(x, v, wd, wo, 8, True, t_tile=256, interpret=True)
    assert got.shape == ref.shape
    assert float(jnp.abs(ref - got).max()) < 5e-2


def test_fp32_precision_path(data):
    """With global precision HIGHEST the kernel keeps f32 MXU operands —
    parity with the XLA formulation tightens to ~1e-5 (vs 5e-2 for bf16)."""
    from constant_memory_waveglow_tpu.ops import (
        get_default_precision, set_default_precision)

    x, v, wd, wo = data
    prev = get_default_precision()
    try:
        set_default_precision("highest")
        ref = wn_layer_xla(x, v, wd, wo, 4, True)
        got = fused_wn_layer(x, v, wd, wo, 4, True, t_tile=256, interpret=True)
        assert float(jnp.abs(ref - got).max()) < 1e-5
    finally:
        set_default_precision(prev)
