"""Invertible 1x1 conv: differential tests of the memory-efficient custom_vjp
path against plain jax autodiff — the JAX rewrite of the reference's
``tests/test_fwd_bwd.py::test_conv1x1_fwd_bwd`` (:19-79)."""

import jax
import jax.numpy as jnp
import jax.tree_util as tu
import numpy as np
import pytest

from constant_memory_waveglow_tpu.flows.invconv import InvertibleConv1x1
from constant_memory_waveglow_tpu.training.loss import WaveGlowLoss


def tree_max_err(a, b):
    return max(tu.tree_leaves(tu.tree_map(lambda x, y: float(jnp.abs(x - y).max()), a, b)))


@pytest.mark.parametrize("batch", [1, 4, 16])
@pytest.mark.parametrize("channels", [2, 4, 8])
@pytest.mark.parametrize("bwd", [False, True])
def test_conv1x1_fwd_bwd(batch, channels, bwd, length=500):
    loss_func = WaveGlowLoss()
    for seed in range(3):
        key = jax.random.PRNGKey(seed)
        x = jax.random.uniform(key, (batch, channels, length)) * 2 - 1
        params = InvertibleConv1x1(channels).init(jax.random.PRNGKey(100 + seed))

        outs, grads = [], []
        for eff in [False, True]:
            model = InvertibleConv1x1(channels, memory_efficient=eff)

            apply1 = model.reverse if bwd else model.forward
            apply2 = model.forward if bwd else model.reverse

            y, log1 = apply1(params, x)
            xinv, log2 = apply2(params, y)

            # logdet antisymmetry (reference asserts exact equality :51)
            assert jnp.allclose(log1, -log2, atol=0, rtol=0)
            # round-trip reconstruction (reference atol 1e-6 :70-72)
            assert jnp.allclose(x, xinv, atol=1e-5, rtol=0), float(jnp.abs(x - xinv).max())

            def loss_fn(p):
                y, ld = apply1(p, x)
                return loss_func(y.reshape(batch, -1), ld * jnp.ones((batch,)))

            l, g = jax.value_and_grad(loss_fn)(params)
            outs.append(np.asarray(y))
            grads.append(g)

        assert np.allclose(outs[0], outs[1])
        assert tree_max_err(grads[0], grads[1]) < 5e-6


def test_orthogonal_init_det_plus_one():
    for seed in range(5):
        p = InvertibleConv1x1(8).init(jax.random.PRNGKey(seed))
        sign, _ = jnp.linalg.slogdet(p["W"])
        assert float(sign) == 1.0
        # orthogonal
        assert jnp.allclose(p["W"] @ p["W"].T, jnp.eye(8), atol=1e-5)
