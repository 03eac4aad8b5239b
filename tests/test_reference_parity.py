"""Differential parity against the reference PyTorch implementation.

Loads the reference modules from /root/reference (read-only, torch CPU),
copies its initialized weights into our parameter pytrees, and asserts the
TPU-native forward/reverse computations produce the same outputs and logdets.
This is the strongest available oracle that the re-design preserves the
reference's math exactly.  Skipped when the reference tree or torch is
unavailable.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = os.environ.get("REFERENCE_PATH", "/root/reference")

torch = pytest.importorskip("torch")
if not os.path.isdir(REFERENCE):
    pytest.skip("reference tree not available", allow_module_level=True)

sys.path.insert(0, REFERENCE)

# The reference's package __init__ pulls in pytorch_lightning and torchaudio,
# neither of which is on this image; stub just enough for the imports to
# succeed (the parity tests never exercise those classes).
import types

if "pytorch_lightning" not in sys.modules:
    _pl = types.ModuleType("pytorch_lightning")

    class _LM:  # noqa: N801
        def __init__(self, *a, **k):
            pass

    _pl.LightningModule = _LM
    _pl.Callback = object
    _pl.Trainer = object
    sys.modules["pytorch_lightning"] = _pl

if "torchaudio" not in sys.modules:
    _ta = types.ModuleType("torchaudio")
    _tr = types.ModuleType("torchaudio.transforms")

    class _Stub:  # noqa: N801
        def __init__(self, *a, **k):
            raise RuntimeError("torchaudio stub")

    import torch as _torch

    class _MuLawEncoding(_torch.nn.Module):
        """Functional stand-in for torchaudio.transforms.MuLawEncoding —
        the exact mu-law companding formula (already differentially
        validated in test_conditioners.py::test_mu_law_matches_torch_formula),
        so the reference WSRGlow (``model/wsrglow.py:27-30``) can run."""

        def __init__(self, quantization_channels=256):
            super().__init__()
            self.qc = quantization_channels

        def forward(self, x):
            mu = self.qc - 1.0
            x_mu = (_torch.sign(x) * _torch.log1p(mu * _torch.abs(x))
                    / _torch.log1p(_torch.tensor(mu)))
            return ((x_mu + 1) / 2 * mu + 0.5).to(_torch.int64)

    _tr.MelSpectrogram = _Stub
    _tr.MuLawEncoding = _MuLawEncoding
    _ta.transforms = _tr
    sys.modules["torchaudio"] = _ta
    sys.modules["torchaudio.transforms"] = _tr

import jax
import jax.numpy as jnp

torch.manual_seed(0)


# ------------------------------------------------------------- weight mapping
def t2j(t):
    # explicit copy: jnp.asarray can zero-copy alias numpy views of torch
    # storage on CPU, and torch optimizers mutate weights in place
    return jnp.asarray(t.detach().cpu().numpy().copy())


def conv_param(mod):
    """torch conv (possibly weight-normed) -> our param dict."""
    p = {}
    if hasattr(mod, "weight_v"):
        p["w"] = {"v": t2j(mod.weight_v), "g": t2j(mod.weight_g)}
    else:
        p["w"] = t2j(mod.weight)
    if mod.bias is not None:
        p["b"] = t2j(mod.bias)
    return p


def wn_params(wn):
    out = {
        "V": conv_param(wn.V),
        "start": conv_param(wn.start),
        "layers": [],
        "end": {"w": t2j(wn.end.weight)},
    }
    if wn.end.bias is not None:
        out["end"]["b"] = t2j(wn.end.bias)
    for layer in wn.layers:
        out["layers"].append({"W": conv_param(layer.W),
                              "W_o": conv_param(layer.W_o)})
    return out


def waveglow_params(ref):
    return {
        "upsampler": conv_param(ref.upsampler),
        "invconv1x1": [{"W": t2j(c.weight)[..., 0]} for c in ref.invconv1x1],
        "WNs": [{"F": wn_params(b.F)} for b in ref.WNs],
    }


# -------------------------------------------------------------------- helpers
def max_err(a, b):
    return float(np.abs(np.asarray(a) - b.detach().cpu().numpy()).max())


@pytest.mark.parametrize("mem_efficient", [False, True])
def test_waveglow_forward_reverse_parity(mem_efficient):
    from model.waveglow import WaveGlow as RefWaveGlow

    from constant_memory_waveglow_tpu.models import WaveGlow

    kw = dict(flows=4, n_group=8, n_early_every=2, n_early_size=2,
              hop_size=256, n_mels=20, dilation_channels=16,
              residual_channels=16, skip_channels=16, depth=2, radix=3,
              bias=False)
    torch.manual_seed(1)
    ref = RefWaveGlow(memory_efficient=False, zero_init=False, **kw).eval()
    ours = WaveGlow(memory_efficient=mem_efficient, zero_init=False, **kw)
    params = waveglow_params(ref)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4096)).astype(np.float32) * 0.3
    h = rng.standard_normal((2, 20, 18)).astype(np.float32)

    with torch.no_grad():
        z_ref, ld_ref = ref.forward_computation(torch.from_numpy(x),
                                                torch.from_numpy(h))
    z, ld = ours.forward_computation(params, jnp.asarray(x), jnp.asarray(h))
    assert max_err(z, z_ref) < 2e-5
    assert max_err(ld, ld_ref) < 2e-2  # logdet is a large sum

    with torch.no_grad():
        xr_ref, ldr_ref = ref.reverse_computation(z_ref, torch.from_numpy(h))
    xr, ldr = ours.reverse_computation(params, z, jnp.asarray(h))
    assert max_err(xr, xr_ref) < 2e-5
    assert max_err(ldr, ldr_ref) < 2e-2


def test_waveglow_infer_length_matches_reference():
    from model.waveglow import WaveGlow as RefWaveGlow

    from constant_memory_waveglow_tpu.models import WaveGlow

    kw = dict(flows=2, n_group=8, n_early_every=4, n_early_size=2,
              hop_size=256, n_mels=20, dilation_channels=16,
              residual_channels=16, skip_channels=16, depth=2, radix=3,
              bias=False)
    ref = RefWaveGlow(memory_efficient=False, **kw).eval()
    ours = WaveGlow(memory_efficient=False, **kw)
    h = torch.randn(1, 20, 12)
    with torch.no_grad():
        audio_ref = ref.infer(h, 0.7)
    params = waveglow_params(ref)
    audio = ours.infer(params, jnp.asarray(h.numpy()), jax.random.PRNGKey(0), 0.7)
    assert tuple(audio.shape) == tuple(audio_ref.shape)


def test_training_loss_curve_parity():
    """Same init weights, same batches: three Adam steps through the
    reference (torch autograd + torch.optim.Adam) and through our jitted
    constant-memory train step must produce the same loss sequence — the
    loss-curve-parity oracle for the training stack."""
    from model.waveglow import WaveGlow as RefWaveGlow
    from model.loss import WaveGlowLoss as RefLoss

    from constant_memory_waveglow_tpu.training import Experiment

    kw = dict(flows=2, n_group=8, n_early_every=4, n_early_size=2,
              hop_size=256, n_mels=20, dilation_channels=16,
              residual_channels=16, skip_channels=16, depth=2, radix=3,
              bias=False)
    torch.manual_seed(8)
    ref = RefWaveGlow(memory_efficient=False, zero_init=False, **kw).train()
    crit = RefLoss(sigma=0.7, elementwise_mean=True)
    opt = torch.optim.Adam(ref.parameters(), lr=1e-3, weight_decay=0)

    cfg = {
        "arch": {"type": "WaveGlow",
                 "args": dict(kw, memory_efficient=True, zero_init=False)},
        "optimizer": {"type": "Adam", "args": {"lr": 1e-3, "weight_decay": 0}},
        "loss": {"type": "WaveGlowLoss",
                 "args": {"sigma": 0.7, "elementwise_mean": True}},
        "conditioner": {"type": "MelSpec", "args": {
            "sr": 22050, "n_fft": 1024, "hop_length": 256, "f_max": 8000,
            "n_mels": 20}},
    }
    exp = Experiment(cfg)
    state = {"params": waveglow_params(ref), "model_state": {},
             "opt_state": None, "step": jnp.zeros((), jnp.int32)}
    state["opt_state"] = exp.optimizer.init(state["params"])
    step_fn = exp.make_train_step(donate=False)

    rng = np.random.default_rng(9)
    for i in range(3):
        batch = (rng.standard_normal((2, 4096)) * 0.3).astype(np.float32)
        cond = np.asarray(exp.conditioner(jnp.asarray(batch)))

        z_t, ld_t = ref(torch.from_numpy(batch), torch.from_numpy(cond))
        loss_t = crit(z_t, ld_t)
        opt.zero_grad()
        loss_t.backward()
        opt.step()

        state, metrics = step_fn(state, jnp.asarray(batch))
        assert abs(float(metrics["loss"]) - loss_t.item()) < 2e-4, \
            (i, float(metrics["loss"]), loss_t.item())


def test_waveflow_forward_parity():
    from model.waveflow import WaveFlow as RefWaveFlow

    from constant_memory_waveglow_tpu.models import WaveFlow

    kw = dict(flows=2, n_group=8, n_mels=20, use_conv1x1=False,
              memory_efficient=False, dilation_channels=16,
              residual_channels=16, skip_channels=16, bias=False)
    torch.manual_seed(2)
    ref = RefWaveFlow(zero_init=False, **kw).eval()
    ours = WaveFlow(zero_init=False, **kw)

    params = {
        "upsampler": conv_param(ref.upsampler[1]),
        "WNs": [],
    }
    for wn in ref.WNs:
        out = {
            "V": conv_param(wn.V),
            "start": conv_param(wn.start),
            "layers": [{"W": conv_param(l.W), "W_o": conv_param(l.W_o)}
                       for l in wn.layers],
            "end": {"w": t2j(wn.end.weight)},
        }
        params["WNs"].append(out)

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 4096)).astype(np.float32) * 0.3
    h = rng.standard_normal((2, 20, 16)).astype(np.float32)

    with torch.no_grad():
        z_ref, ld_ref = ref.forward_computation(torch.from_numpy(x),
                                                torch.from_numpy(h))
    z, ld = ours.forward_computation(params, jnp.asarray(x), jnp.asarray(h))
    assert max_err(z, z_ref) < 2e-5
    assert max_err(ld, ld_ref) < 2e-2

    # reverse (the scan-cached AR path) against the reference's buffered loop
    with torch.no_grad():
        xr_ref, _ = ref.reverse_computation(z_ref, torch.from_numpy(h))
    xr, _ = ours.reverse_computation(params, z, jnp.asarray(h))
    assert max_err(xr, xr_ref) < 5e-5


def test_melglow_forward_parity():
    from model.melglow import MelGlow as RefMelGlow

    from constant_memory_waveglow_tpu.models import MelGlow

    kw = dict(flows=2, n_group=8, n_early_every=4, n_early_size=2,
              hop_size=256, n_mels=20, dilation_channels=16,
              residual_channels=16, skip_channels=16, depth=2, radix=3,
              predict_channels=8, predict_layers=1, bias=False)
    torch.manual_seed(6)
    ref = RefMelGlow(memory_efficient=False, zero_init=False, **kw).eval()
    ours = MelGlow(memory_efficient=False, zero_init=False, **kw)

    def bn_param(bn):
        return ({"scale": t2j(bn.weight), "bias": t2j(bn.bias)},
                {"mean": t2j(bn.running_mean), "var": t2j(bn.running_var)})

    def pred_params(pred):
        p_start = {"w": t2j(pred.start[0].weight)}
        if pred.start[0].bias is not None:
            p_start["b"] = t2j(pred.start[0].bias)
        sp, ss = bn_param(pred.start[1])
        params = {"start": p_start, "start_bn": sp, "blocks": [],
                  "end": {"w": t2j(pred.end.weight)}}
        if pred.end.bias is not None:
            params["end"]["b"] = t2j(pred.end.bias)
        state = {"start_bn": ss, "blocks": []}
        for blk in pred.res_blocks:
            b1p, b1s = bn_param(blk[1])
            b2p, b2s = bn_param(blk[4])
            c1 = {"w": t2j(blk[0].weight)}
            c2 = {"w": t2j(blk[3].weight)}
            if blk[0].bias is not None:
                c1["b"] = t2j(blk[0].bias)
                c2["b"] = t2j(blk[3].bias)
            params["blocks"].append({"conv1": c1, "bn1": b1p,
                                     "conv2": c2, "bn2": b2p})
            state["blocks"].append({"bn1": b1s, "bn2": b2s})
        return params, state

    variables = {"params": {"invconv1x1": [], "WNs": []},
                 "state": {"WNs": []}}
    for k in range(kw["flows"]):
        variables["params"]["invconv1x1"].append(
            {"W": t2j(ref.invconv1x1[k].weight)[..., 0]})
        wn = ref.WNs[k].F
        wp = {
            "start": conv_param(wn.start),
            "layers": [{"W_o": conv_param(l.W_o)} for l in wn.layers],
            "end": {"w": t2j(wn.end.weight)},
        }
        pp, ps = pred_params(wn.pred)
        wp["pred"] = pp
        variables["params"]["WNs"].append(wp)
        variables["state"]["WNs"].append(ps)

    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 4096)).astype(np.float32) * 0.3
    h = rng.standard_normal((2, 20, 16)).astype(np.float32)

    with torch.no_grad():
        z_ref, ld_ref = ref.forward_computation(torch.from_numpy(x),
                                                torch.from_numpy(h))
    z, ld = ours.forward_computation(variables, jnp.asarray(x), jnp.asarray(h))
    assert max_err(z, z_ref) < 5e-5
    assert max_err(ld, ld_ref) < 5e-2


def test_mr_waveglow_forward_parity():
    from model.mr_waveglow import MRWaveGlow as RefMR

    from constant_memory_waveglow_tpu.models import MRWaveGlow

    kw = dict(prior_flows=2, n_group=8, hop_size=256, n_mels=20, levels=2,
              flows=2, dilation_channels=16, residual_channels=16,
              skip_channels=16, depth=2, radix=3, bias=False)
    torch.manual_seed(4)
    ref = RefMR(memory_efficient=False, zero_init=False, **kw).eval()
    ours = MRWaveGlow(memory_efficient=False, zero_init=False, **kw)

    params = {"levels": [], "prior_invconv1x1": [], "prior_WNs": []}
    for lvl in range(kw["levels"] - 1):
        lv = {"invconv1x1": [], "WNs": []}
        for f in range(kw["flows"]):
            lv["invconv1x1"].append(
                {"W": t2j(ref.invconv1x1_list[lvl][f].weight)[..., 0]})
            lv["WNs"].append({"F": wn_params(ref.WNs_list[lvl][f].F)})
        params["levels"].append(lv)
    for f in range(kw["prior_flows"]):
        params["prior_invconv1x1"].append(
            {"W": t2j(ref.prior_invconv1x1[f].weight)[..., 0]})
        params["prior_WNs"].append({"F": wn_params(ref.prior_WNs[f].F)})

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 4096)).astype(np.float32) * 0.3
    h = rng.standard_normal((2, 20, 16)).astype(np.float32)

    with torch.no_grad():
        z_ref, ld_ref = ref.forward_computation(torch.from_numpy(x),
                                                torch.from_numpy(h))
    z, ld = ours.forward_computation(params, jnp.asarray(x), jnp.asarray(h))
    assert max_err(z, z_ref) < 5e-5
    assert max_err(ld, ld_ref) < 5e-2


@pytest.mark.parametrize("mem_efficient", [False, True])
def test_wsrglow_cond_and_flow_parity(mem_efficient):
    """The most intricate conditioner in the tree: mu-law embedding || STFT
    magnitude || phase-bin embedding (``model/wsrglow.py:27-50``), plus the
    inherited WaveGlow flow stack, against the torch reference with copied
    weights (MuLawEncoding supplied by the functional stub above)."""
    from model.wsrglow import WSRGlow as RefWSRGlow

    from constant_memory_waveglow_tpu.models import WSRGlow

    kw = dict(dilation_channels=16, residual_channels=16, skip_channels=16,
              depth=2, radix=3, bias=False, zero_init=False)
    torch.manual_seed(11)
    ref = RefWSRGlow(upsample_rate=2, memory_efficient=False, **kw).eval()
    ours = WSRGlow(upsample_rate=2, memory_efficient=mem_efficient, **kw)

    params = waveglow_params(ref)
    params["mu_embed"] = t2j(ref.mu_enc[1].weight)
    params["angle_embed"] = t2j(ref.angle_embed.embed.weight)

    rng = np.random.default_rng(12)
    t_low = 512
    x = rng.standard_normal((2, 2 * t_low)).astype(np.float32) * 0.3
    c = (rng.standard_normal((2, t_low)).astype(np.float32) * 0.4).clip(-1, 1)

    # conditioner parity first (isolates the embeddings/STFT from the flows)
    with torch.no_grad():
        cond_ref = ref._get_cond(torch.from_numpy(c.copy()))  # clip_ mutates
    cond = ours._get_cond(params, jnp.asarray(c))
    assert cond.shape == tuple(cond_ref.shape)
    assert max_err(cond, cond_ref) < 2e-4

    with torch.no_grad():
        z_ref, ld_ref = ref.forward_computation(torch.from_numpy(x),
                                                torch.from_numpy(c.copy()))
    z, ld = ours.forward_computation(params, jnp.asarray(x), jnp.asarray(c))
    assert max_err(z, z_ref) < 1e-4
    assert max_err(ld, ld_ref) < 5e-2

    if not mem_efficient:  # reverse once is enough; paths share _get_cond
        with torch.no_grad():
            xr_ref, _ = ref.reverse_computation(z_ref, torch.from_numpy(c.copy()))
        xr, _ = ours.reverse_computation(params, z, jnp.asarray(c))
        assert max_err(xr, xr_ref) < 1e-4


@pytest.mark.parametrize("n_group,use_conv1x1", [(32, True), (64, False)])
def test_waveflow_canonical_ngroup_parity(n_group, use_conv1x1):
    """WaveFlow at the canonical heights: n_group 64 is the shipped config
    (``configs/waveflow_LJ_speech.json``) whose height-dilation schedule
    ``[1,2,4,8,16,1,2,4]`` (``model/waveflow.py:81-87``) exercises the hd>1
    ring-buffer tap gather in the AR inverse; n_group 32 + conv1x1 covers the
    permute-by-1x1 variant at hd>1."""
    from model.waveflow import WaveFlow as RefWaveFlow

    from constant_memory_waveglow_tpu.models import WaveFlow

    kw = dict(flows=2, n_group=n_group, n_mels=20, use_conv1x1=use_conv1x1,
              memory_efficient=False, dilation_channels=16,
              residual_channels=16, skip_channels=16, bias=False)
    torch.manual_seed(21)
    ref = RefWaveFlow(zero_init=False, **kw).eval()
    ours = WaveFlow(zero_init=False, **kw)

    params = {
        "upsampler": conv_param(ref.upsampler[1]),
        "WNs": [],
    }
    for wn in ref.WNs:
        params["WNs"].append({
            "V": conv_param(wn.V),
            "start": conv_param(wn.start),
            "layers": [{"W": conv_param(l.W), "W_o": conv_param(l.W_o)}
                       for l in wn.layers],
            "end": {"w": t2j(wn.end.weight)},
        })
    if use_conv1x1:
        params["invconv1x1"] = [{"W": t2j(c.weight)[..., 0]}
                                for c in ref.invconv1x1]

    rng = np.random.default_rng(22)
    x = rng.standard_normal((2, 4096)).astype(np.float32) * 0.3
    h = rng.standard_normal((2, 20, 16)).astype(np.float32)

    with torch.no_grad():
        z_ref, ld_ref = ref.forward_computation(torch.from_numpy(x),
                                                torch.from_numpy(h))
    z, ld = ours.forward_computation(params, jnp.asarray(x), jnp.asarray(h))
    assert max_err(z, z_ref) < 5e-5
    assert max_err(ld, ld_ref) < 5e-2

    # AR inverse (scan + hd-strided ring buffers) vs reference buffered loop
    with torch.no_grad():
        xr_ref, _ = ref.reverse_computation(z_ref, torch.from_numpy(h))
    xr, _ = ours.reverse_computation(params, z, jnp.asarray(h))
    assert max_err(xr, xr_ref) < 2e-4


def test_torch_checkpoint_import_roundtrip(tmp_path):
    """A (synthetic) Lightning .ckpt of the reference WaveGlow imports into a
    servable framework checkpoint: converted params reproduce the reference
    forward, and the exported checkpoint drives the inference CLI."""
    import subprocess

    from model.waveglow import WaveGlow as RefWaveGlow

    from constant_memory_waveglow_tpu.models import WaveGlow
    from constant_memory_waveglow_tpu.utils.torch_import import (
        torch_state_dict_to_params)

    kw = dict(flows=2, n_group=8, n_early_every=4, n_early_size=2,
              hop_size=256, n_mels=80, dilation_channels=16,
              residual_channels=16, skip_channels=16, depth=2, radix=3,
              bias=False)
    torch.manual_seed(31)
    ref = RefWaveGlow(memory_efficient=False, zero_init=False, **kw).eval()

    config = {
        "name": "imported",
        "arch": {"type": "WaveGlow", "args": dict(kw, memory_efficient=False)},
        "optimizer": {"type": "Adam", "args": {"lr": 1e-4, "weight_decay": 0}},
        "loss": {"type": "WaveGlowLoss",
                 "args": {"sigma": 0.7, "elementwise_mean": True}},
        "conditioner": {"type": "MelSpec", "args": {
            "sr": 22050, "n_fft": 1024, "hop_length": 256, "f_max": 8000,
            "n_mels": 80}},
    }
    sd = {f"model.{k}": v for k, v in ref.state_dict().items()}
    ckpt_file = str(tmp_path / "ref.ckpt")
    torch.save({"state_dict": sd, "hyper_parameters": {"config": config}},
               ckpt_file)

    params = torch_state_dict_to_params(sd, "WaveGlow")
    ours = WaveGlow(memory_efficient=False, zero_init=False, **kw)
    rng = np.random.default_rng(32)
    x = rng.standard_normal((1, 4096)).astype(np.float32) * 0.3
    h = rng.standard_normal((1, 80, 18)).astype(np.float32)
    with torch.no_grad():
        z_ref, ld_ref = ref.forward_computation(torch.from_numpy(x),
                                                torch.from_numpy(h))
    params_j = jax.tree_util.tree_map(jnp.asarray, params)
    z, ld = ours.forward_computation(params_j, jnp.asarray(x), jnp.asarray(h))
    assert max_err(z, z_ref) < 2e-5

    # CLI: convert then run inference on the exported checkpoint
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = str(tmp_path / "converted")
    r = subprocess.run(
        [_sys.executable, os.path.join(repo, "tools", "import_torch_ckpt.py"),
         ckpt_file, out_dir, "--platform", "cpu"], capture_output=True,
        text=True, cwd=repo, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]

    from constant_memory_waveglow_tpu.utils.audio import save_wav

    wav = str(tmp_path / "in.wav")
    save_wav(wav, (rng.uniform(-0.4, 0.4, 8192)).astype(np.float32), 22050)
    r = subprocess.run(
        [_sys.executable, os.path.join(repo, "inference.py"), out_dir, wav,
         str(tmp_path / "out.wav"), "--platform", "cpu"],
        capture_output=True, text=True, cwd=repo, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(str(tmp_path / "out.wav"))

    # the import is a FULL training checkpoint: --ckpt-path resumes from it
    # (fresh Adam state is written, so the structural restore succeeds)
    import json as _json

    cfg2 = dict(config,
                dataset={"type": "RandomWAVDataset",
                         "args": {"data_dir": str(tmp_path), "size": 4,
                                  "segment": 4096}},
                data_loader={"batch_size": 2})
    cfg_file = str(tmp_path / "resume.json")
    with open(cfg_file, "w") as f:
        _json.dump(cfg2, f)
    r = subprocess.run(
        [_sys.executable, os.path.join(repo, "train.py"), "--config", cfg_file,
         "--ckpt-path", out_dir, "--platform", "cpu", "--max-steps", "1",
         "--logdir", str(tmp_path / "resumed"), "--seed", "3"],
        capture_output=True, text=True, cwd=repo, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]


@pytest.mark.parametrize("arch", ["WaveFlow", "WSRGlow"])
def test_torch_state_dict_import_sparse_sequential(arch):
    """state_dict import for architectures whose nn.Sequential members are
    partly parameter-free (WaveFlow's ReplicationPad/LeakyReLU around the
    upsampler ConvTranspose, WSRGlow's MuLawEncoding before the embedding):
    the dotted-key indices are sparse and the importer must keep positions."""
    from constant_memory_waveglow_tpu.utils.torch_import import (
        torch_state_dict_to_params)

    rng = np.random.default_rng(41)
    if arch == "WaveFlow":
        from model.waveflow import WaveFlow as Ref

        from constant_memory_waveglow_tpu.models import WaveFlow as Ours

        kw = dict(flows=2, n_group=8, n_mels=20, use_conv1x1=False,
                  memory_efficient=False, dilation_channels=16,
                  residual_channels=16, skip_channels=16, bias=False)
        torch.manual_seed(42)
        ref = Ref(zero_init=False, **kw).eval()
        ours = Ours(zero_init=False, **kw)
        h = rng.standard_normal((2, 20, 16)).astype(np.float32)
        x = rng.standard_normal((2, 4096)).astype(np.float32) * 0.3
    else:
        from model.wsrglow import WSRGlow as Ref

        from constant_memory_waveglow_tpu.models import WSRGlow as Ours

        kw = dict(dilation_channels=16, residual_channels=16,
                  skip_channels=16, depth=2, radix=3, bias=False)
        torch.manual_seed(43)
        ref = Ref(upsample_rate=2, memory_efficient=False,
                  zero_init=False, **kw).eval()
        ours = Ours(upsample_rate=2, memory_efficient=False,
                    zero_init=False, **kw)
        h = (rng.standard_normal((2, 512)).astype(np.float32) * 0.4
             ).clip(-1, 1)
        x = rng.standard_normal((2, 1024)).astype(np.float32) * 0.3

    sd = {f"model.{k}": v for k, v in ref.state_dict().items()}
    params = jax.tree_util.tree_map(
        jnp.asarray, torch_state_dict_to_params(sd, arch))

    with torch.no_grad():
        z_ref, _ = ref.forward_computation(torch.from_numpy(x),
                                           torch.from_numpy(h.copy()))
    z, _ = ours.forward_computation(params, jnp.asarray(x), jnp.asarray(h))
    assert max_err(z, z_ref) < 2e-4


def test_torch_state_dict_import_melglow():
    """MelGlow state_dict import: the LVC predictors' BatchNorm splits into
    affine params + running-stats model_state (the importer covers all five
    reference-trainable families, ``model/lightning.py:16-68``)."""
    from model.melglow import MelGlow as Ref

    from constant_memory_waveglow_tpu.models import MelGlow as Ours
    from constant_memory_waveglow_tpu.utils.torch_import import (
        torch_state_dict_to_variables)

    kw = dict(flows=2, n_group=8, n_early_every=4, n_early_size=2,
              hop_size=256, n_mels=20, dilation_channels=16,
              residual_channels=16, skip_channels=16, depth=2, radix=3,
              predict_channels=8, predict_layers=2, bias=False)
    torch.manual_seed(44)
    ref = Ref(memory_efficient=False, zero_init=False, **kw).eval()
    ours = Ours(memory_efficient=False, zero_init=False, **kw)

    # non-trivial running stats: a few torch training steps move them off
    # the (0, 1) init, so the import is actually exercised
    ref.train()
    with torch.no_grad():
        for i in range(3):
            ref.forward_computation(
                torch.randn(2, 4096) * (0.1 + 0.2 * i),
                torch.randn(2, 20, 16))
    ref.eval()

    sd = {f"model.{k}": v for k, v in ref.state_dict().items()}
    params, state = torch_state_dict_to_variables(sd, "MelGlow")
    variables = {
        "params": jax.tree_util.tree_map(jnp.asarray, params),
        "state": jax.tree_util.tree_map(jnp.asarray, state),
    }

    rng = np.random.default_rng(45)
    x = rng.standard_normal((2, 4096)).astype(np.float32) * 0.3
    h = rng.standard_normal((2, 20, 16)).astype(np.float32)
    with torch.no_grad():
        z_ref, _ = ref.forward_computation(torch.from_numpy(x),
                                           torch.from_numpy(h.copy()))
    z, _ = ours.forward_computation(variables, jnp.asarray(x), jnp.asarray(h))
    assert max_err(z, z_ref) < 2e-4
