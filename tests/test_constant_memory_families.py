"""Structural constant-memory guarantee for EVERY memory_efficient family.

The reference's storage-freeing trick is deterministic for every family that
sets ``memory_efficient`` (``model/efficient_modules.py:99-279``, used by
``model/waveglow.py:163-175``, ``model/melglow.py:203-258``,
``model/mr_waveglow.py:46,87-90``) and for construct-inverted
(``reverse_mode``) models.  The scan-group engine must give the same
guarantee: autodiff residuals carry per-flow *parameters and outputs* only —
never WN internals — so residual bytes grow per flow by an order of
magnitude less than naive autodiff's.  (The on-chip analog — XLA
peak-temp-by-flows slope — is measured by tools/memory_check.py --arch and
emitted in BENCH; this is the CPU-runnable structural proof.)

Also: scan-vs-unrolled value/gradient parity and Experiment layout
round-trips for the families round 3 left unrolled (MelGlow, MRWaveGlow,
reverse_mode WaveGlow).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from constant_memory_waveglow_tpu.models.melglow import MelGlow
from constant_memory_waveglow_tpu.models.mr_waveglow import MRWaveGlow
from constant_memory_waveglow_tpu.models.waveglow import WaveGlow
from constant_memory_waveglow_tpu.training import Experiment, WaveGlowLoss

B, T = 2, 4096

MELGLOW_KW = dict(n_group=8, n_early_every=100, n_early_size=2, hop_size=256,
                  n_mels=10, depth=2, dilation_channels=8, residual_channels=8,
                  skip_channels=8, predict_channels=12, predict_layers=1,
                  radix=3, bias=False, zero_init=False)
MRWG_KW = dict(prior_flows=2, n_group=16, hop_size=256, n_mels=10, levels=3,
               depth=2, dilation_channels=8, residual_channels=8,
               skip_channels=8, radix=3, bias=False, zero_init=False)
WG_RM_KW = dict(n_group=8, n_early_every=100, n_early_size=2, hop_size=256,
                n_mels=10, dilation_channels=8, residual_channels=8,
                skip_channels=8, depth=2, radix=3, bias=False,
                zero_init=False, reverse_mode=True)


def _make(family, flows, eff, scan):
    if family == "melglow":
        return MelGlow(flows=flows, memory_efficient=eff, scan_flows=scan,
                       **MELGLOW_KW)
    if family == "mr_waveglow":
        return MRWaveGlow(flows=flows, memory_efficient=eff, scan_flows=scan,
                          **MRWG_KW)
    return WaveGlow(flows=flows, memory_efficient=eff, scan_flows=scan,
                    **WG_RM_KW)


def _data(key=0):
    x = jax.random.normal(jax.random.PRNGKey(key), (B, T)) * 0.3
    h = jax.random.normal(jax.random.PRNGKey(key + 1), (B, 10, T // 256))
    return x, h


def _loss_fn(model):
    crit = WaveGlowLoss(0.7)

    def f(variables, x, h):
        if model.has_state:
            z, ld, _ = model.train_forward(variables["params"],
                                           variables["state"], x, h)
        else:
            z, ld = model.forward(variables, x, h)
        return crit(z, ld)

    return f


@pytest.mark.parametrize("family", ["melglow", "mr_waveglow", "waveglow_rm"])
def test_residuals_free_of_wn_internals(family):
    """Residual bytes per extra flow: scan-group engine << naive autodiff.
    Naive growth is dominated by per-flow WN internals ([B, C, T]-scale
    activations); the engine's residuals are (stacked params, group output,
    cond) — so its growth is the per-flow parameters only."""
    from jax._src.ad_checkpoint import saved_residuals

    def residual_bytes(model):
        variables = model.init(jax.random.PRNGKey(0))
        x, h = _data()
        res = saved_residuals(_loss_fn(model), variables, x, h)
        return sum(int(np.prod(v.shape)) * v.dtype.itemsize for v, _ in res)

    growth = {}
    for eff in [False, True]:
        sizes = [residual_bytes(_make(family, flows, eff, scan=eff))
                 for flows in (2, 6)]
        per_flow = 4
        if family == "mr_waveglow":  # flows is per-level; levels-1 == 2
            per_flow = 8
        growth[eff] = (sizes[1] - sizes[0]) / per_flow
    assert growth[True] < growth[False] / 5, growth


@pytest.mark.parametrize("family", ["melglow", "mr_waveglow", "waveglow_rm"])
def test_scan_matches_unrolled_values_and_grads(family):
    """scan_flows=True == scan_flows=False: same forward values/logdet, an
    exact inverse, and identical parameter gradients (differential oracle,
    the reference's tests/test_fwd_bwd.py strategy at the model level)."""
    flows = 4
    m_s = _make(family, flows, eff=True, scan=True)
    m_u = _make(family, flows, eff=True, scan=False)
    assert m_s.scan_flows and not m_u.scan_flows
    v_s = m_s.init(jax.random.PRNGKey(0))
    v_u = m_u.init(jax.random.PRNGKey(0))
    x, h = _data(3)

    z1, ld1 = m_s.forward(v_s, x, h)
    z2, ld2 = m_u.forward(v_u, x, h)
    np.testing.assert_allclose(z1, z2, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(ld1, ld2, atol=1e-3, rtol=1e-5)

    xr, lir = m_s.reverse(v_s, z1, h)
    t_used = min(xr.shape[1], x.shape[1])
    np.testing.assert_allclose(xr[:, :t_used], x[:, :t_used],
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(lir, -ld1, atol=1e-3, rtol=1e-5)

    g1 = jax.grad(lambda v: _loss_fn(m_s)(v, x, h))(v_s)
    g2 = jax.grad(lambda v: _loss_fn(m_u)(v, x, h))(v_u)
    if m_s.has_state:
        g2 = {"params": m_s.stack_param_layout(g2["params"]),
              "state": m_s.stack_param_layout(g2["state"])}
    else:
        g2 = m_s.stack_param_layout(g2)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(a, b, atol=5e-5, rtol=5e-4)


def _train_cfg(arch, args):
    return {"arch": {"type": arch, "args": args},
            "optimizer": {"type": "Adam", "args": {"lr": 1e-4,
                                                   "weight_decay": 0}},
            "loss": {"type": "WaveGlowLoss",
                     "args": {"sigma": 0.7, "elementwise_mean": True}},
            "conditioner": {"type": "MelSpec", "args": {
                "sr": 22050, "n_fft": 1024, "hop_length": 256,
                "f_max": 8000, "n_mels": 80}}}


@pytest.mark.parametrize("arch,args", [
    ("MelGlow", dict(flows=4, n_group=8, n_early_every=2, n_early_size=2,
                     hop_size=256, n_mels=80, memory_efficient=True, depth=2,
                     dilation_channels=8, residual_channels=8,
                     skip_channels=8, predict_channels=12, predict_layers=1,
                     radix=3, bias=False)),
    ("MRWaveGlow", dict(prior_flows=2, n_group=16, hop_size=256, n_mels=80,
                        levels=3, flows=2, memory_efficient=True, depth=2,
                        dilation_channels=8, residual_channels=8,
                        skip_channels=8, radix=3, bias=False)),
])
def test_experiment_layout_roundtrip(arch, args):
    """Two jitted train steps run in the native stacked layout, and
    canonical_state/native_state round-trip the FULL train state (params +
    BN state + Adam moments) bit-exactly — old checkpoints stay loadable."""
    exp = Experiment(_train_cfg(arch, args))
    st = exp.init_state(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4096)) * 0.1
    step = exp.make_train_step(donate=False)
    s1, m1 = step(st, x)
    s2, m2 = step(s1, x)
    assert np.isfinite(float(m2["loss"]))

    can = exp.canonical_state(jax.device_get(s2))
    nat = exp.native_state(can)
    assert (jax.tree_util.tree_structure(nat)
            == jax.tree_util.tree_structure(jax.device_get(s2)))
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(s2)),
                    jax.tree_util.tree_leaves(nat)):
        np.testing.assert_array_equal(a, b)
    # the canonical tree is the per-flow-list schema round-1 checkpoints
    # (and torch imports) use — no "groups" node anywhere
    assert not any("groups" in d for d in can["params"]
                   if isinstance(d, str))
