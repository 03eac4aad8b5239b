"""WaveGlow model-level tests: invert round-trip, logdet antisymmetry,
efficient-vs-naive gradient parity, sampling, and the constant-memory
residual assertion (the JAX analog of the reference's
``storage().size() == 0`` checks — SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import jax.tree_util as tu
import numpy as np
import pytest

from constant_memory_waveglow_tpu.models import WaveGlow
from constant_memory_waveglow_tpu.ops import MelSpec
from constant_memory_waveglow_tpu.training import WaveGlowLoss

KW = dict(flows=4, n_group=8, n_early_every=2, n_early_size=2, hop_size=256,
          n_mels=80, dilation_channels=32, residual_channels=32,
          skip_channels=32, depth=3, radix=3, bias=False)


@pytest.fixture(scope="module")
def data():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4096)) * 0.1
    h = MelSpec(22050, 1024, 256, f_max=8000, n_mels=80)(x)
    return x, h


@pytest.fixture(scope="module")
def params():
    return WaveGlow(memory_efficient=False, **KW).init(jax.random.PRNGKey(0))


@pytest.mark.parametrize("eff", [False, True])
def test_roundtrip(data, params, eff):
    x, h = data
    model = WaveGlow(memory_efficient=eff, **KW)
    z, logdet = model.forward_computation(params, x, h)
    assert z.shape == x.shape and logdet.shape == (2,)
    x2, logdet2 = model.reverse_computation(params, z, h)
    assert float(jnp.abs(x2 - x).max()) < 1e-5
    assert float(jnp.abs(logdet + logdet2).max()) < 1e-3


def test_grad_parity(data, params):
    x, h = data
    crit = WaveGlowLoss(0.7)
    grads = []
    for eff in [False, True]:
        model = WaveGlow(memory_efficient=eff, **KW)

        def loss_fn(p):
            z, ld = model.forward_computation(p, x, h)
            return crit(z, ld)

        grads.append(jax.grad(loss_fn)(params))
    err = max(tu.tree_leaves(tu.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), grads[0], grads[1])))
    assert err < 1e-5, err


def test_reverse_mode_training(data, params):
    """A model constructed inverted (reverse_mode=True) trains in the z->x
    direction: ``forward`` and ``reverse`` stay mutual inverses, and the
    memory-efficient path gives the same gradients as naive autodiff
    (reference ``model/base.py:7-28`` double dispatch)."""
    x, h = data
    crit = WaveGlowLoss(0.7)
    grads, outs = [], []
    for eff in [False, True]:
        rev_model = WaveGlow(memory_efficient=eff, reverse_mode=True, **KW)
        z, l1 = rev_model.forward(params, x, h)
        x2, l2 = rev_model.reverse(params, z, h)
        assert float(jnp.abs(x2 - x).max()) < 1e-5
        assert float(jnp.abs(l1 + l2).max()) < 1e-3

        def loss_fn(p):
            z, ld = rev_model.forward(p, x, h)
            return crit(z, ld)

        grads.append(jax.grad(loss_fn)(params))
        outs.append(np.asarray(z))
    assert np.allclose(outs[0], outs[1])
    err = max(tu.tree_leaves(tu.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), grads[0], grads[1])))
    assert err < 1e-5, err


def test_infer_shapes(params):
    model = WaveGlow(memory_efficient=False, **KW)
    h = jax.random.normal(jax.random.PRNGKey(3), (1, 80, 16))
    audio = model.infer(params, h, jax.random.PRNGKey(4), sigma=0.7)
    assert audio.shape == (16 * 256,)


def test_constant_memory_residuals(data):
    """Efficient mode must not retain per-flow WN activations: residual bytes
    grow by at most the coupling outputs per flow, an order of magnitude less
    than naive autodiff's growth."""
    from jax._src.ad_checkpoint import saved_residuals

    x, h = data
    crit = WaveGlowLoss(0.7)

    def residual_bytes(model, p):
        def loss_fn(p, x, h):
            z, ld = model.forward_computation(p, x, h)
            return crit(z, ld)

        res = saved_residuals(loss_fn, p, x, h)
        return sum(int(np.prod(v.shape)) * v.dtype.itemsize for v, _ in res)

    growth = {}
    for eff in [False, True]:
        sizes = []
        for flows in [2, 6]:
            kw = dict(KW, flows=flows, n_early_every=100)
            m = WaveGlow(memory_efficient=eff, **kw)
            sizes.append(residual_bytes(m, m.init(jax.random.PRNGKey(0))))
        growth[eff] = (sizes[1] - sizes[0]) / 4  # bytes per extra flow
    # naive growth is dominated by WN internals; efficient by z/log_s outputs
    assert growth[True] < growth[False] / 5, growth
    # absolute: efficient per-flow residual growth ~ a few copies of the
    # squeezed activation [B, n_group, T/n_group] (+ the accounting of the
    # shared upsampled cond, which saved_residuals does not fully dedup)
    act = 2 * 4096 * 4
    assert growth[True] < 10 * act, (growth, act)
