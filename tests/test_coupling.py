"""Affine coupling block: custom_vjp constant-memory grads vs plain autodiff —
the JAX rewrite of reference ``tests/test_fwd_bwd.py::test_affine_fwd_bwd``
(:82-161), including gradient parity w.r.t. the conditioning tensor."""

import jax
import jax.numpy as jnp
import jax.tree_util as tu
import numpy as np
import pytest

from constant_memory_waveglow_tpu.flows.coupling import AffineCouplingBlock
from constant_memory_waveglow_tpu.models.wn import WN
from constant_memory_waveglow_tpu.training.loss import WaveGlowLoss


def tree_max_err(a, b):
    return max(tu.tree_leaves(tu.tree_map(lambda x, y: float(jnp.abs(x - y).max()), a, b)))


@pytest.mark.parametrize("channels", [16, 32])
@pytest.mark.parametrize("depth", [1, 3])
@pytest.mark.parametrize("aux_channels", [20])
@pytest.mark.parametrize("bwd", [False, True])
def test_affine_fwd_bwd(channels, depth, aux_channels, bwd, batch=2, length=600,
                        wn_channels=64):
    loss_func = WaveGlowLoss()
    wn = WN(in_channels=channels // 2, aux_channels=aux_channels, zero_init=False,
            dilation_channels=wn_channels, residual_channels=wn_channels,
            skip_channels=wn_channels, depth=depth)
    params = AffineCouplingBlock(wn, False).init(jax.random.PRNGKey(7))

    for seed in range(2):
        kx, kh = jax.random.split(jax.random.PRNGKey(seed))
        x = jax.random.uniform(kx, (batch, channels, length)) * 2 - 1
        h = jax.random.normal(kh, (batch, aux_channels, length))

        outs, grads = [], []
        for eff in [False, True]:
            model = AffineCouplingBlock(wn, memory_efficient=eff)

            apply1 = model.reverse if bwd else model.forward
            apply2 = model.forward if bwd else model.reverse

            y, log1 = apply1(params, x, h)
            xinv, log2 = apply2(params, y, h)

            assert jnp.allclose(log1, -log2, atol=0, rtol=0)
            assert jnp.allclose(x, xinv, atol=1e-5, rtol=0), float(jnp.abs(x - xinv).max())

            def loss_fn(p, h):
                y, ld = apply1(p, x, h)
                return loss_func(y.reshape(batch, -1), ld.sum((1, 2)))

            l, g = jax.value_and_grad(loss_fn, argnums=(0, 1))(params, h)
            outs.append(np.asarray(y))
            grads.append(g)

        assert np.allclose(outs[0], outs[1])
        # parameter grads AND conditioning grads must match
        assert tree_max_err(grads[0], grads[1]) < 2e-5


def test_zero_init_identity():
    """zero_init=True makes the coupling an identity at init
    (reference ``model/waveglow.py:92-96``)."""
    wn = WN(in_channels=4, aux_channels=8, zero_init=True, depth=2,
            dilation_channels=16, residual_channels=16, skip_channels=16)
    block = AffineCouplingBlock(wn, False)
    params = block.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 100))
    h = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 100))
    z, log_s = block.forward(params, x, h)
    assert jnp.allclose(z, x)
    assert jnp.allclose(log_s, 0.0)
