"""Chains mixing memory-efficient and naive blocks, run through ``.reverse`` —
the JAX rewrite of reference ``tests/test_fwd_bwd.py::test_complx_chained``
(:164-201), which guards gradient flow across heterogeneous blocks."""

import jax
import jax.numpy as jnp
import jax.tree_util as tu
import numpy as np
import pytest

from constant_memory_waveglow_tpu.flows.invconv import InvertibleConv1x1
from constant_memory_waveglow_tpu.training.loss import WaveGlowLoss


@pytest.mark.parametrize("batch", [1, 8])
@pytest.mark.parametrize("channels", [2, 8])
def test_complx_chained(batch, channels, length=500):
    loss_func = WaveGlowLoss()
    params = [InvertibleConv1x1(channels).init(jax.random.PRNGKey(i)) for i in range(3)]

    for seed in range(3):
        x = jax.random.uniform(jax.random.PRNGKey(seed), (batch, channels, length)) * 2 - 1

        grads = []
        for flags in [(True, False, True), (False, True, False)]:
            chain = [InvertibleConv1x1(channels, memory_efficient=f) for f in flags]

            def loss_fn(ps):
                xin, logdet = x, 0.0
                for layer, p in zip(chain, ps):
                    xin, ld = layer.reverse(p, xin)
                    logdet = logdet + ld
                return loss_func(xin.reshape(batch, -1), logdet * jnp.ones((batch,)))

            grads.append(jax.grad(loss_fn)(params))

        err = max(tu.tree_leaves(tu.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), grads[0], grads[1])))
        assert err < 5e-6, err
