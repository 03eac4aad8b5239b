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


WSR_CFG = {
    "arch": {"type": "WSRGlow", "args": {
        "upsample_rate": 2, "memory_efficient": True,
        "dilation_channels": 8, "residual_channels": 8, "skip_channels": 8,
        "depth": 1, "radix": 3, "bias": False}},
    "optimizer": {"type": "Adam", "args": {"lr": 1e-4, "weight_decay": 0}},
    "loss": {"type": "WaveGlowLoss", "args": {"sigma": 1.0, "elementwise_mean": True}},
    "conditioner": {"type": "STFTDecimate", "args": {"r": 2}},
}


def test_bf16_compute_step_wsrglow():
    """Regression: under bf16 compute, WSRGlow's conditioner must emit a
    uniform dtype (the STFT magnitude is fp32 from complex64 while the
    embedding gathers follow the cast params; the fp32-promoted concat used
    to collide with the bf16 upsampler weights in conv_general_dilated),
    and mu-law / phase quantization must run in fp32 (bf16's mantissa can't
    resolve 256 levels)."""
    exp = Experiment(WSR_CFG)
    s0 = exp.init_state(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 2048),
                           minval=-0.5, maxval=0.5)
    s_fp, m_fp = exp.make_train_step(donate=False)(s0, x)
    s_bf, m_bf = exp.make_train_step(donate=False,
                                     compute_dtype="bfloat16")(s0, x)
    assert jnp.isfinite(m_bf["loss"])
    assert abs(float(m_fp["loss"]) - float(m_bf["loss"])) < 0.2
    assert all(l.dtype == jnp.float32 for l in tu.tree_leaves(s_bf["params"]))


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


def test_bf16_compute_wsrglow_quantizes_from_fp32_cond():
    """Regression (round-2 review): the AMP cast must NOT round the raw
    low-rate waveform to bf16 before WSRGlow's in-model mu-law / phase
    quantization — codes near level boundaries shift, a systematic
    train/infer conditioner mismatch.  The jitted bf16 step must equal a
    manual loss that keeps cond fp32 while params/batch are bf16."""
    from constant_memory_waveglow_tpu.ops.mulaw import mu_law_encode

    exp = Experiment(WSR_CFG)
    s0 = exp.init_state(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(7), (2, 2048),
                           minval=-0.9, maxval=0.9)
    c = exp.conditioner(x)

    # this input is actually sensitive: bf16-rounding c changes some codes
    codes_fp = mu_law_encode(c, 256)
    codes_bf = mu_law_encode(c.astype(jnp.bfloat16).astype(jnp.float32), 256)
    assert int((codes_fp != codes_bf).sum()) > 0

    _, m_bf = exp.make_train_step(donate=False,
                                  compute_dtype="bfloat16")(s0, x)

    cast = lambda t: tu.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
    z, logdet = exp.model.forward(cast(s0["params"]), cast(x), c)
    manual = exp.criterion(z.astype(jnp.float32), logdet.astype(jnp.float32))
    assert abs(float(m_bf["loss"]) - float(manual)) < 1e-6


def test_wsrglow_bf16_infer_runs_flows_in_bf16():
    """WSRGlow.infer keeps h fp32 (quantized_cond) yet the flow stack and
    the synthesized audio follow the params' compute dtype."""
    exp = Experiment(WSR_CFG)
    params = exp.init_state(jax.random.PRNGKey(0))["params"]
    params_bf = tu.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
    h = jax.random.uniform(jax.random.PRNGKey(1), (1, 512),
                           minval=-0.5, maxval=0.5)
    pred = exp.model.infer(params_bf, h, jax.random.PRNGKey(2), sigma=0.7)
    assert pred.dtype == jnp.bfloat16
    assert pred.shape[-1] == 1024
    assert bool(jnp.isfinite(pred.astype(jnp.float32)).all())
