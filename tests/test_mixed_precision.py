"""Mixed-precision training (bf16 compute, fp32 master params) — the AMP
analog of the reference's @custom_fwd/@custom_bwd-decorated Functions."""

import jax
import jax.numpy as jnp
import jax.tree_util as tu

from constant_memory_waveglow_tpu.training import Experiment

CFG = {
    "arch": {"type": "WaveGlow", "args": {
        "flows": 2, "n_group": 8, "n_early_every": 4, "n_early_size": 2,
        "hop_size": 256, "n_mels": 80, "memory_efficient": True,
        "zero_init": False, "dilation_channels": 16, "residual_channels": 16,
        "skip_channels": 16, "depth": 2, "radix": 3, "bias": False}},
    "optimizer": {"type": "Adam", "args": {"lr": 1e-4, "weight_decay": 0}},
    "loss": {"type": "WaveGlowLoss", "args": {"sigma": 0.7, "elementwise_mean": True}},
    "conditioner": {"type": "MelSpec", "args": {
        "sr": 22050, "n_fft": 1024, "hop_length": 256, "f_max": 8000, "n_mels": 80}},
}


def test_bf16_compute_step():
    exp = Experiment(CFG)
    s0 = exp.init_state(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4096)) * 0.1

    s_fp, m_fp = exp.make_train_step(donate=False)(s0, x)
    s_bf, m_bf = exp.make_train_step(donate=False,
                                     compute_dtype="bfloat16")(s0, x)
    # loss close to the fp32 value; master params remain fp32
    assert abs(float(m_fp["loss"]) - float(m_bf["loss"])) < 5e-2
    assert all(l.dtype == jnp.float32 for l in tu.tree_leaves(s_bf["params"]))
    # parameter update direction agrees with fp32 on average
    def flat(t):
        return jnp.concatenate([l.ravel() for l in tu.tree_leaves(t)])
    d_fp = flat(s_fp["params"]) - flat(s0["params"])
    d_bf = flat(s_bf["params"]) - flat(s0["params"])
    cos = jnp.dot(d_fp, d_bf) / (jnp.linalg.norm(d_fp) * jnp.linalg.norm(d_bf) + 1e-12)
    assert float(cos) > 0.8, float(cos)
