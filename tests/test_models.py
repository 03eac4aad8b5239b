"""Model-level tests for WaveFlow / MelGlow / WSRGlow / MRWaveGlow:
forward-inverse round-trips (including WaveFlow's scan-cached autoregressive
inverse vs its parallel forward), logdet antisymmetry, memory-efficient
gradient parity, sampling shapes, and registry construction from configs."""

import jax
import jax.numpy as jnp
import jax.tree_util as tu
import numpy as np
import pytest

from constant_memory_waveglow_tpu.models import (
    WaveFlow, MelGlow, WSRGlow, MRWaveGlow, build_model)
from constant_memory_waveglow_tpu.ops import STFTDecimate
from constant_memory_waveglow_tpu.training import WaveGlowLoss
from constant_memory_waveglow_tpu.utils.config import load_config

crit = WaveGlowLoss(0.7)


def grad_err(g1, g2):
    return max(tu.tree_leaves(tu.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), g1, g2)))


@pytest.mark.parametrize("use_conv1x1", [False, True])
def test_waveflow_roundtrip_and_ar_cache(use_conv1x1):
    """The lax.scan ring-buffer AR inverse must invert the parallel forward
    exactly (reference ``model/waveflow.py:219-261``)."""
    model = WaveFlow(flows=2, n_group=8, n_mels=80, use_conv1x1=use_conv1x1,
                     memory_efficient=False, dilation_channels=16,
                     residual_channels=16, skip_channels=16, bias=False,
                     zero_init=False)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4096)) * 0.1
    h = jax.random.normal(jax.random.PRNGKey(2), (2, 80, 16))
    z, ld = model.forward_computation(params, x, h)
    assert z.shape == x.shape
    x2, ld2 = model.reverse_computation(params, z, h)
    assert float(jnp.abs(x2 - x).max()) < 1e-5
    assert float(jnp.abs(ld + ld2).max()) < 1e-4

    audio = model.infer(params, h, jax.random.PRNGKey(3), 0.7)
    assert audio.shape == (2, 16 * 256)


def test_waveflow_height_causality():
    """Row i of (log_s, t) must not depend on input rows > i."""
    from constant_memory_waveglow_tpu.models.waveflow import WN2D

    wn = WN2D(8, 10, dilation_channels=8, residual_channels=8, skip_channels=8,
              zero_init=False)
    params = wn.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 7, 64))
    y = jax.random.normal(jax.random.PRNGKey(2), (1, 10, 64))
    log_s, t = wn.apply(params, x, y)
    # perturb the last row; rows 0..5 of the output must not change
    x2 = x.at[:, :, -1].add(10.0)
    log_s2, t2 = wn.apply(params, x2, y)
    assert jnp.allclose(log_s[:, :, :6], log_s2[:, :, :6], atol=1e-5)
    assert not jnp.allclose(log_s[:, :, 6], log_s2[:, :, 6], atol=1e-3)


def test_melglow_roundtrip_grads_state():
    kwargs = dict(flows=2, n_group=8, n_early_every=4, n_early_size=2,
                  hop_size=256, n_mels=80, dilation_channels=16,
                  residual_channels=16, skip_channels=16, depth=2, radix=3,
                  predict_channels=16, predict_layers=1, bias=False)
    model = MelGlow(memory_efficient=False, **kwargs)
    v = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4096)) * 0.1
    h = jax.random.normal(jax.random.PRNGKey(2), (2, 80, 16))

    z, ld = model.forward_computation(v, x, h)
    x2, ld2 = model.reverse_computation(v, z, h)
    assert float(jnp.abs(x2 - x).max()) < 1e-5
    assert float(jnp.abs(ld + ld2).max()) < 1e-3

    def make_loss(m):
        def loss_fn(p):
            z, ld, _ = m.train_forward(p, v["state"], x, h)
            return crit(z, ld)
        return loss_fn

    g1 = jax.grad(make_loss(model))(v["params"])
    g2 = jax.grad(make_loss(MelGlow(memory_efficient=True, **kwargs)))(v["params"])
    assert grad_err(g1, g2) < 1e-5

    # BN running stats move during training
    _, _, new_state = MelGlow(memory_efficient=True, **kwargs).train_forward(
        v["params"], v["state"], x, h)
    moved = max(tu.tree_leaves(tu.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), v["state"], new_state)))
    assert moved > 0


def test_wsrglow_roundtrip_and_infer():
    model = WSRGlow(upsample_rate=2, memory_efficient=True,
                    dilation_channels=16, residual_channels=16,
                    skip_channels=16, depth=2)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 2048), minval=-0.5, maxval=0.5)
    h = STFTDecimate(2)(x)
    assert h.shape == (2, 1024)
    z, ld = model.forward_computation(params, x, h)
    x2, ld2 = model.reverse_computation(params, z, h)
    assert float(jnp.abs(x2 - x).max()) < 1e-4
    out = model.infer(params, h, jax.random.PRNGKey(3), 0.8)
    assert out.shape == (2, 2048)  # upsample_rate x low-rate length


def test_mr_waveglow_roundtrip_and_grads():
    kw = dict(prior_flows=2, n_group=8, hop_size=256, n_mels=80, levels=3,
              flows=2, dilation_channels=16, residual_channels=16,
              skip_channels=16, depth=2, radix=3, bias=False)
    model = MRWaveGlow(memory_efficient=False, **kw)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4096)) * 0.1
    h = jax.random.normal(jax.random.PRNGKey(2), (2, 80, 16))
    z, ld = model.forward_computation(params, x, h)
    x2, ld2 = model.reverse_computation(params, z, h)
    assert float(jnp.abs(x2 - x).max()) < 1e-5

    g1 = jax.grad(lambda p: crit(*model.forward_computation(p, x, h)))(params)
    m2 = MRWaveGlow(memory_efficient=True, **kw)
    g2 = jax.grad(lambda p: crit(*m2.forward_computation(p, x, h)))(params)
    assert grad_err(g1, g2) < 1e-5


@pytest.mark.parametrize("cfg", [
    "configs/waveglow_LJ_speech.json",
    "configs/waveflow_LJ_speech.json",
    "configs/melglow_LJ_speech.json",
    "configs/mr_waveglow_LJ_speech.json",
    "configs/wsrglow_vctk_2x.json",
])
def test_registry_builds_all_configs(cfg):
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), cfg)
    model = build_model(load_config(path)["arch"])
    assert hasattr(model, "forward_computation")


def _residual_bytes(loss_fn, *args):
    from jax._src.ad_checkpoint import saved_residuals
    res = saved_residuals(loss_fn, *args)
    return sum(int(np.prod(v.shape)) * v.dtype.itemsize for v, _ in res)


@pytest.mark.parametrize("family", ["WaveFlow", "MelGlow"])
def test_constant_memory_residuals_other_families(family):
    """The constant-memory property must hold for every family, not just
    WaveGlow: efficient-mode residual bytes grow far slower in flow count
    than naive autodiff (the freed-storage analog of the reference's
    ``efficient_modules.py`` applied to all models)."""
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4096)) * 0.1

    def build(flows, eff):
        if family == "WaveFlow":
            m = WaveFlow(flows=flows, n_group=8, n_mels=80, use_conv1x1=True,
                         memory_efficient=eff, dilation_channels=16,
                         residual_channels=16, skip_channels=16)
            h = jax.random.normal(jax.random.PRNGKey(2), (1, 80, 16))
        else:
            m = MelGlow(flows=flows, n_group=8, n_early_every=100,
                        n_early_size=2, hop_size=256, n_mels=80,
                        memory_efficient=eff, dilation_channels=16,
                        residual_channels=16, skip_channels=16, depth=2,
                        radix=3, predict_channels=8, predict_layers=1,
                        bias=False)
            h = jax.random.normal(jax.random.PRNGKey(2), (1, 80, 16))
        return m, h

    growth = {}
    for eff in [False, True]:
        sizes = []
        for flows in [2, 6]:
            m, h = build(flows, eff)
            v = m.init(jax.random.PRNGKey(0))
            if m.has_state:
                p, s = v["params"], v["state"]
                loss = lambda p, x, h: crit(*m.train_forward(p, s, x, h)[:2])
            else:
                p = v
                loss = lambda p, x, h: crit(*m.forward_computation(p, x, h))
            sizes.append(_residual_bytes(loss, p, x, h))
        growth[eff] = (sizes[1] - sizes[0]) / 4
    assert growth[True] < growth[False] / 3, growth


@pytest.mark.parametrize("use_conv1x1", [False, True])
def test_waveflow_scanned_flows_match_unrolled(use_conv1x1):
    """memory_efficient WaveFlow runs the flow chain as a checkpointed
    lax.scan over flow-stacked params (beyond the reference, whose WaveFlow
    memory_efficient only covers the 1x1 — ``model/waveflow.py:188``):
    forward, gradients, and the AR reverse must match the unrolled path."""
    kw = dict(flows=3, n_group=8, n_mels=80, use_conv1x1=use_conv1x1,
              dilation_channels=16, residual_channels=16, skip_channels=16,
              bias=False, zero_init=False)
    naive = WaveFlow(memory_efficient=False, **kw)
    eff = WaveFlow(memory_efficient=True, **kw)
    assert eff.scan_flows
    p = naive.init(jax.random.PRNGKey(0))
    ps = eff.stack_param_layout(p)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4096)) * 0.1
    h = jax.random.normal(jax.random.PRNGKey(2), (2, 80, 16))

    z1, l1 = naive.forward_computation(p, x, h)
    z2, l2 = eff.forward_computation(ps, x, h)
    assert float(jnp.abs(z1 - z2).max()) < 1e-6
    assert float(jnp.abs(l1 - l2).max()) < 1e-4

    g1 = jax.grad(lambda p: crit(*naive.forward_computation(p, x, h)))(p)
    g2 = eff.unstack_param_layout(
        jax.grad(lambda p: crit(*eff.forward_computation(p, x, h)))(ps))
    assert grad_err(g1, g2) < 1e-6

    # the unrolled AR reverse consumes the stacked layout transparently
    x2, _ = eff.reverse_computation(ps, z2, h)
    assert float(jnp.abs(x2 - x).max()) < 1e-5

    # layout roundtrip is exact
    back = eff.unstack_param_layout(ps)
    assert grad_err(back, p) == 0.0


def test_waveflow_flow_remat_knob_equivalence():
    """The hybrid-remat knob (scan_group.set_flow_remat; VERDICT r4 #4):
    disabling the checkpointed scan body stores residuals instead of
    recomputing, but forward/gradients are identical math."""
    from constant_memory_waveglow_tpu.flows import scan_group

    kw = dict(flows=3, n_group=8, n_mels=80, use_conv1x1=False,
              dilation_channels=16, residual_channels=16, skip_channels=16,
              bias=False, zero_init=False)
    eff = WaveFlow(memory_efficient=True, **kw)
    ps = eff.stack_param_layout(eff.init(jax.random.PRNGKey(0)))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4096)) * 0.1
    h = jax.random.normal(jax.random.PRNGKey(2), (2, 80, 16))

    loss = lambda p: crit(*eff.forward_computation(p, x, h))
    assert scan_group.get_flow_remat()
    l1, g1 = jax.value_and_grad(loss)(ps)
    try:
        scan_group.set_flow_remat(False)
        l2, g2 = jax.value_and_grad(loss)(ps)
    finally:
        scan_group.set_flow_remat(True)
    assert abs(float(l1) - float(l2)) < 1e-6
    assert grad_err(g1, g2) < 1e-6

    # unroll knob composes with the scan the same way
    try:
        scan_group.set_scan_unroll(3)
        l3, g3 = jax.value_and_grad(loss)(ps)
    finally:
        scan_group.set_scan_unroll(1)
    assert abs(float(l1) - float(l3)) < 1e-6
    assert grad_err(g1, g3) < 1e-6
