"""Flow-group scan engine: value + gradient parity vs the unrolled paths.

The scanned group (``flows/scan_group.py``) must be numerically identical to
the unrolled per-block composition — this is the same differential oracle the
reference uses for its autograd Functions (``tests/test_fwd_bwd.py``), lifted
to the group level.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from constant_memory_waveglow_tpu.flows.scan_group import (
    make_flow_group, stack_flow_params)
from constant_memory_waveglow_tpu.flows.invconv import InvertibleConv1x1
from constant_memory_waveglow_tpu.flows.coupling import AffineCouplingBlock
from constant_memory_waveglow_tpu.models.wn import WN
from constant_memory_waveglow_tpu.models import WaveGlow


def _make_blocks(n_flows, c, aux, key, mem_eff=False):
    wn_cfg = WN(in_channels=c // 2, aux_channels=aux, dilation_channels=16,
                residual_channels=16, skip_channels=16, depth=2, radix=3,
                bias=False, zero_init=False)
    invs = [InvertibleConv1x1(c, memory_efficient=mem_eff) for _ in range(n_flows)]
    cpls = [AffineCouplingBlock(wn_cfg, memory_efficient=mem_eff)
            for _ in range(n_flows)]
    keys = jax.random.split(key, 2 * n_flows)
    inv_p = [b.init(k) for b, k in zip(invs, keys[::2])]
    cpl_p = [b.init(k) for b, k in zip(cpls, keys[1::2])]
    return wn_cfg, invs, cpls, inv_p, cpl_p


def _unrolled_forward(invs, cpls, inv_p, cpl_p, x, y):
    logdet = jnp.zeros((x.shape[0],), x.dtype)
    for inv, cpl, ip, cp in zip(invs, cpls, inv_p, cpl_p):
        x, ldw = inv.forward(ip, x)
        x, log_s = cpl.forward(cp, x, y)
        logdet = logdet + ldw + log_s.sum((1, 2))
    return x, logdet


def _unrolled_reverse(invs, cpls, inv_p, cpl_p, z, y):
    logdet = jnp.zeros((z.shape[0],), z.dtype)
    for inv, cpl, ip, cp in reversed(list(zip(invs, cpls, inv_p, cpl_p))):
        z, log_s = cpl.reverse(cp, z, y)
        z, ldw = inv.reverse(ip, z)
        logdet = logdet + ldw + log_s.sum((1, 2))
    return z, logdet


@pytest.mark.parametrize("direction", ["forward", "reverse"])
@pytest.mark.parametrize("n_flows", [1, 3])
def test_group_matches_unrolled_values(direction, n_flows):
    key = jax.random.PRNGKey(0)
    c, aux, b, t = 8, 6, 2, 64
    wn_cfg, invs, cpls, inv_p, cpl_p = _make_blocks(n_flows, c, aux, key)
    fwd, rev, fwd_eff, rev_eff = make_flow_group(wn_cfg.apply)
    stacked = stack_flow_params(inv_p, cpl_p)

    x = jax.random.normal(jax.random.PRNGKey(1), (b, c, t))
    y = jax.random.normal(jax.random.PRNGKey(2), (b, aux, t))

    if direction == "forward":
        z_ref, ld_ref = _unrolled_forward(invs, cpls, inv_p, cpl_p, x, y)
        for fn in (fwd, fwd_eff):
            z, ld = fn(stacked, x, y)
            np.testing.assert_allclose(z, z_ref, atol=1e-5, rtol=1e-5)
            np.testing.assert_allclose(ld, ld_ref, atol=1e-4, rtol=1e-5)
    else:
        x_ref, ld_ref = _unrolled_reverse(invs, cpls, inv_p, cpl_p, x, y)
        for fn in (rev, rev_eff):
            xo, ld = fn(stacked, x, y)
            np.testing.assert_allclose(xo, x_ref, atol=1e-5, rtol=1e-5)
            np.testing.assert_allclose(ld, ld_ref, atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize("direction", ["forward", "reverse"])
def test_group_eff_grads_match_autodiff(direction):
    """custom_vjp backward (invert-and-recompute in a reversed scan) vs plain
    jax.grad through the naive scan — params, input, and cond gradients."""
    key = jax.random.PRNGKey(3)
    c, aux, b, t, n_flows = 8, 6, 2, 48, 3
    wn_cfg, invs, cpls, inv_p, cpl_p = _make_blocks(n_flows, c, aux, key)
    fwd, rev, fwd_eff, rev_eff = make_flow_group(wn_cfg.apply)
    stacked = stack_flow_params(inv_p, cpl_p)

    x = jax.random.normal(jax.random.PRNGKey(4), (b, c, t))
    y = jax.random.normal(jax.random.PRNGKey(5), (b, aux, t))
    w_out = jax.random.normal(jax.random.PRNGKey(6), (b, c, t))  # fixed cot mix
    w_ld = jax.random.normal(jax.random.PRNGKey(7), (b,))

    naive, eff = (fwd, fwd_eff) if direction == "forward" else (rev, rev_eff)

    def scalar(fn):
        def s(p, x, y):
            out, ld = fn(p, x, y)
            return jnp.sum(out * w_out) + jnp.sum(ld * w_ld)
        return s

    g_ref = jax.grad(scalar(naive), argnums=(0, 1, 2))(stacked, x, y)
    g_eff = jax.grad(scalar(eff), argnums=(0, 1, 2))(stacked, x, y)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_ref),
                     jax.tree_util.tree_leaves(g_eff)):
        np.testing.assert_allclose(a, b_, atol=2e-4, rtol=2e-4)


def test_waveglow_scan_matches_unrolled():
    """Whole-model check: scan_flows=True == scan_flows=False (values+grads),
    across early-output group boundaries."""
    kwargs = dict(flows=6, n_group=8, n_early_every=2, n_early_size=2,
                  hop_size=64, n_mels=10, dilation_channels=8,
                  residual_channels=8, skip_channels=8, depth=2, radix=3,
                  bias=False, zero_init=False)
    m_scan = WaveGlow(memory_efficient=True, scan_flows=True, **kwargs)
    m_unrl = WaveGlow(memory_efficient=True, scan_flows=False, **kwargs)
    assert m_scan.scan_flows and not m_unrl.scan_flows
    # same RNG stream -> same values; scan model stores them flow-stacked
    params_l = m_unrl.init(jax.random.PRNGKey(0))
    params = m_scan.init(jax.random.PRNGKey(0))
    # layout round-trip sanity
    rt = m_scan.stack_param_layout(m_scan.unstack_param_layout(params))
    for a, b in zip(jax.tree_util.tree_leaves(rt),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(a, b)

    b, t = 2, 512
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t)) * 0.3
    h = jax.random.normal(jax.random.PRNGKey(2), (b, 10, t // 64))

    z1, ld1 = m_scan.forward(params, x, h)
    z2, ld2 = m_unrl.forward(params_l, x, h)
    np.testing.assert_allclose(z1, z2, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(ld1, ld2, atol=1e-3, rtol=1e-5)

    x1, li1 = m_scan.reverse(params, z1, h)
    np.testing.assert_allclose(x1, x, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(li1, -ld1, atol=1e-3, rtol=1e-5)

    def loss(m):
        def f(p):
            z, ld = m.forward(p, x, h)
            return jnp.mean(z**2) - jnp.mean(ld) * 1e-4
        return f

    g1 = jax.grad(loss(m_scan))(params)
    g2 = jax.grad(loss(m_unrl))(params_l)
    # compare per-flow grads against the stacked grads
    g2s = m_scan.stack_param_layout(g2)
    for a, b_ in zip(jax.tree_util.tree_leaves(g1),
                     jax.tree_util.tree_leaves(g2s)):
        np.testing.assert_allclose(a, b_, atol=5e-5, rtol=5e-4)
