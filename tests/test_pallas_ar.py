"""Fused WaveFlow AR-step kernel (interpret mode on CPU): per-step parity
with WN2D.ar_step (log_s/t and ring contents), across hd=1 and hd>1
schedules, plus whole-flow AR inverse parity with the kernel forced on."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from constant_memory_waveglow_tpu.models.waveflow import WN2D, WaveFlow
from constant_memory_waveglow_tpu.ops.pallas.ar_step import (
    fused_ar_step, pack_ar_weights, ring_indices)
from constant_memory_waveglow_tpu.ops.weightnorm import fuse_weight_norms
from constant_memory_waveglow_tpu.ops.convs import conv1x1
from constant_memory_waveglow_tpu.ops.weightnorm import wn_weight


@pytest.mark.parametrize("n_group", [8, 64])
def test_fused_ar_step_matches_xla(n_group):
    b, w_len, ch = 2, 96, 8
    wn = WN2D(n_group, 6, dilation_channels=ch, residual_channels=ch,
              skip_channels=ch, bias=False, zero_init=False)
    params = fuse_weight_norms(wn.init(jax.random.PRNGKey(0)))
    y = jax.random.normal(jax.random.PRNGKey(1), (b, 6, w_len))

    cond = wn._cond_chunks(params, y)
    cond_all = conv1x1(y, wn_weight(params["V"]["w"]))  # [B, 2D*8, W]
    packed = pack_ar_weights(params)

    from constant_memory_waveglow_tpu.ops.pallas.ar_step import init_rings

    bufs_ref = wn.init_buffers(b, w_len, jnp.float32)
    rings = init_rings(b, ch, wn.h_dilations, w_len, jnp.float32)

    x_row = jax.random.normal(jax.random.PRNGKey(2), (b, 1, 1, w_len))
    for s in range(min(n_group - 1, 6)):
        log_s_ref, t_ref, bufs_ref = wn.ar_step(
            params, x_row, cond, bufs_ref, jnp.asarray(s))
        idx = ring_indices(jnp.asarray(s), tuple(wn.h_dilations))
        log_s, t, rings = fused_ar_step(
            packed, x_row[:, 0, 0], cond_all, rings, idx,
            h_dilations=tuple(wn.h_dilations), dilations=tuple(wn.dilations),
            residual=ch, skip=ch, interpret=True, fast=False)
        np.testing.assert_allclose(log_s, log_s_ref[:, 0, 0], atol=1e-5,
                                   rtol=1e-5)
        np.testing.assert_allclose(t, t_ref[:, 0, 0], atol=1e-5, rtol=1e-5)
        for rg, bu in zip(rings, bufs_ref):
            np.testing.assert_allclose(rg.transpose(0, 2, 1, 3), bu, atol=1e-6)
        # next input row depends on the outputs (AR recursion)
        x_row = (x_row * 0.7 + t_ref * 0.1) * jnp.exp(-log_s_ref * 0.1)


@pytest.mark.parametrize("n_group", [8, 64])
@pytest.mark.parametrize("fast", [False, True])
def test_fused_ar_flow_vmem_matches_v1(n_group, fast):
    """v2 (VMEM-resident) whole-flow kernel == v1 (HBM rings + DMA) kernel,
    interpret mode, identical op order/dtypes -> tight tolerance."""
    from constant_memory_waveglow_tpu.ops.pallas.ar_step import (
        fused_ar_flow, fused_ar_flow_vmem)

    b, w_len, ch = 2, 128, 8
    g = n_group
    wn = WN2D(g, 6, dilation_channels=ch, residual_channels=ch,
              skip_channels=ch, bias=False, zero_init=False)
    params = fuse_weight_norms(wn.init(jax.random.PRNGKey(0)))
    y = jax.random.normal(jax.random.PRNGKey(1), (b, 6, w_len))
    cond_all = conv1x1(y, wn_weight(params["V"]["w"]))
    packed = pack_ar_weights(params)
    z = jax.random.normal(jax.random.PRNGKey(3), (b, g, w_len)) * 0.5

    kw = dict(h_dilations=tuple(wn.h_dilations), dilations=tuple(wn.dilations),
              residual=ch, skip=ch, interpret=True, fast=fast)
    x1, l1 = fused_ar_flow(packed, z[:, :, None, :], cond_all, **kw)
    x2, l2 = fused_ar_flow_vmem(packed, z, cond_all, **kw)
    # fast: v2 additionally stores rings/cond in bf16 (v1 keeps them fp32 and
    # casts at the dot) -> differences at bf16 rounding scale only
    tol = dict(atol=3e-2, rtol=3e-2) if fast else dict(atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(x2[:, 1:], x1[:, 1:, 0], **tol)
    np.testing.assert_allclose(l2, l1[:, :, 0], **tol)
    np.testing.assert_allclose(x2[:, 0], z[:, 0], atol=0)  # passthrough row


def test_fused_ar_flow_vmem_bf16_io(n_group=8):
    """bf16 z/cond (the inference --bf16 path): runs, returns bf16, and
    tracks the fp32-input result at bf16 tolerance."""
    from constant_memory_waveglow_tpu.ops.pallas.ar_step import (
        fused_ar_flow_vmem)

    b, w_len, ch = 1, 128, 8
    wn = WN2D(n_group, 6, dilation_channels=ch, residual_channels=ch,
              skip_channels=ch, bias=False, zero_init=False)
    params = fuse_weight_norms(wn.init(jax.random.PRNGKey(0)))
    y = jax.random.normal(jax.random.PRNGKey(1), (b, 6, w_len))
    cond_all = conv1x1(y, wn_weight(params["V"]["w"]))
    packed = pack_ar_weights(params)
    z = jax.random.normal(jax.random.PRNGKey(3), (b, n_group, w_len)) * 0.5

    kw = dict(h_dilations=tuple(wn.h_dilations), dilations=tuple(wn.dilations),
              residual=ch, skip=ch, interpret=True, fast=True)
    x32, l32 = fused_ar_flow_vmem(packed, z, cond_all, **kw)
    x16, l16 = fused_ar_flow_vmem(packed, z.astype(jnp.bfloat16),
                                  cond_all.astype(jnp.bfloat16), **kw)
    assert x16.dtype == jnp.bfloat16 and l16.dtype == jnp.bfloat16
    np.testing.assert_allclose(x16.astype(jnp.float32), x32, atol=5e-2,
                               rtol=5e-2)
    np.testing.assert_allclose(l16.astype(jnp.float32), l32, atol=5e-2,
                               rtol=5e-2)


def test_waveflow_reverse_with_fused_vmem_kernel():
    """Whole-model AR inverse through the v2 dispatch (DEFAULT precision ->
    fast=True, bf16 MXU ops) vs the fp32 XLA scan: loose bf16 tolerance."""
    from constant_memory_waveglow_tpu.ops.pallas import ar_step as mod
    from constant_memory_waveglow_tpu.ops.convs import (
        get_default_precision, set_default_precision)

    kw = dict(flows=2, n_group=8, n_mels=10, use_conv1x1=False,
              memory_efficient=False, dilation_channels=8,
              residual_channels=8, skip_channels=8, bias=False,
              zero_init=False)
    model = WaveFlow(**kw)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 1024)) * 0.3
    h = jax.random.normal(jax.random.PRNGKey(2), (2, 10, 4))

    z, _ = model.forward_computation(params, x, h)
    x_ref, ld_ref = model.reverse_computation(params, z, h)

    prev, prev_prec = mod._ENABLED, get_default_precision()
    mod.set_fused_ar_enabled(True)
    mod._INTERPRET = True
    set_default_precision("default")
    try:
        # sanity: this config must route to the v2 kernel
        wn = model.WNs[0]
        assert mod.flow_vmem_supported(wn, 128, 8, z.dtype, True)
        x_fused, ld_fused = model.reverse_computation(params, z, h)
    finally:
        mod.set_fused_ar_enabled(prev)
        mod._INTERPRET = False
        set_default_precision(prev_prec)
    np.testing.assert_allclose(x_fused, x_ref, atol=5e-2, rtol=5e-2)
    np.testing.assert_allclose(ld_fused, ld_ref, atol=0.05 * abs(ld_ref).max(),
                               rtol=0.05)


def test_waveflow_reverse_with_fused_kernel():
    """Whole-model AR inverse, kernel forced on (interpret) == XLA scan."""
    from constant_memory_waveglow_tpu.ops.pallas import ar_step as mod

    kw = dict(flows=2, n_group=8, n_mels=10, use_conv1x1=False,
              memory_efficient=False, dilation_channels=8,
              residual_channels=8, skip_channels=8, bias=False,
              zero_init=False)
    model = WaveFlow(**kw)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 1024)) * 0.3
    h = jax.random.normal(jax.random.PRNGKey(2), (2, 10, 4))

    z, _ = model.forward_computation(params, x, h)
    x_ref, ld_ref = model.reverse_computation(params, z, h)

    prev = mod._ENABLED
    mod.set_fused_ar_enabled(True)
    mod._INTERPRET = True
    try:
        x_fused, ld_fused = model.reverse_computation(params, z, h)
    finally:
        mod.set_fused_ar_enabled(prev)
        mod._INTERPRET = False
    np.testing.assert_allclose(x_fused, x_ref, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(ld_fused, ld_ref, atol=1e-3, rtol=1e-5)


@pytest.mark.parametrize("use_vmem", [True, False])
def test_fused_flow_unaligned_width(use_vmem):
    """Regression (round-2 review): at T' not a lane multiple (e.g. 96,
    padded to 128 for the kernel), nonzero values generated in the padded
    columns must NOT feed back through the width-'same' convs into real
    columns — the AR recursion and the intra-row residual chain both cross
    the pad boundary unless rows are re-zeroed beyond the true width.  The
    flagship bench width (3440) is unaligned, so this is the production
    path."""
    from constant_memory_waveglow_tpu.ops.pallas import ar_step as mod
    from constant_memory_waveglow_tpu.ops.convs import (
        get_default_precision, set_default_precision)

    kw = dict(flows=2, n_group=8, n_mels=10, use_conv1x1=False,
              memory_efficient=False, dilation_channels=8,
              residual_channels=8, skip_channels=8, bias=False,
              zero_init=False)
    model = WaveFlow(**kw)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 768)) * 0.3  # T'=96
    h = jax.random.normal(jax.random.PRNGKey(2), (2, 10, 3))

    z, _ = model.forward_computation(params, x, h)
    x_ref, ld_ref = model.reverse_computation(params, z, h)
    np.testing.assert_allclose(x_ref, x, atol=1e-4)  # scan path roundtrip

    prev, prev_prec = mod._ENABLED, get_default_precision()
    prev_vmem = mod.flow_vmem_supported
    mod.set_fused_ar_enabled(True)
    mod._INTERPRET = True
    if use_vmem:
        set_default_precision("default")  # route to the vmem (fast) kernel
        assert mod.flow_vmem_supported(model.WNs[0], 128, 8, z.dtype, True)
    else:
        # force the v1 (DMA) kernel, which vmem support would shadow
        mod.flow_vmem_supported = lambda *a, **k: False
    try:
        x_fused, ld_fused = model.reverse_computation(params, z, h)
    finally:
        mod.set_fused_ar_enabled(prev)
        mod._INTERPRET = False
        mod.flow_vmem_supported = prev_vmem
        set_default_precision(prev_prec)
    tol = 5e-2 if use_vmem else 1e-4  # bf16 vs fp32 kernel math
    np.testing.assert_allclose(np.asarray(x_fused), np.asarray(x_ref), atol=tol)
    np.testing.assert_allclose(np.asarray(ld_fused), np.asarray(ld_ref),
                               rtol=0.05, atol=0.05 * float(np.abs(ld_ref).max()))
