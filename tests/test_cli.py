"""End-to-end CLI tests (subprocess, CPU): train a tiny model for a few
steps, checkpoint, resume, and run the inference CLI against the checkpoint —
the workflow a reference user exercises via ``train.py`` / ``inference.py``."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    wavs = d / "wavs"
    wavs.mkdir()
    from constant_memory_waveglow_tpu.utils.audio import save_wav

    rng = np.random.default_rng(0)
    t = np.arange(22050) / 22050
    for i in range(2):
        x = 0.4 * np.sin(2 * np.pi * (220 + 110 * i) * t)
        save_wav(str(wavs / f"{i}.wav"), x.astype(np.float32), 22050)

    config = {
        "name": "cli_tiny",
        "arch": {"type": "WaveGlow", "args": {
            "flows": 2, "n_group": 8, "n_early_every": 4, "n_early_size": 2,
            "hop_size": 256, "n_mels": 80, "memory_efficient": True,
            "dilation_channels": 16, "residual_channels": 16,
            "skip_channels": 16, "depth": 2, "radix": 3, "bias": False}},
        "dataset": {"type": "RandomWAVDataset", "args": {
            "data_dir": str(wavs), "size": 8, "segment": 4096}},
        "data_loader": {"batch_size": 2, "shuffle": True, "num_workers": 2,
                        "prefetch_factor": 2, "pin_memory": False},
        "optimizer": {"type": "Adam", "args": {"lr": 1e-4, "weight_decay": 0}},
        "loss": {"type": "WaveGlowLoss", "args": {"sigma": 0.7,
                                                  "elementwise_mean": True}},
        "conditioner": {"type": "MelSpec", "args": {
            "sr": 22050, "n_fft": 1024, "hop_length": 256, "f_max": 8000,
            "n_mels": 80}},
    }
    cfg_path = d / "config.json"
    cfg_path.write_text(json.dumps(config))
    return d, cfg_path, wavs


def run(args, timeout=420):
    return subprocess.run([sys.executable] + args, cwd=REPO, timeout=timeout,
                          capture_output=True, text=True)


def test_train_and_infer_cli(workspace):
    d, cfg_path, wavs = workspace
    logdir = str(d / "run")
    r = run(["train.py", "--config", str(cfg_path), "--platform", "cpu",
             "--max-epochs", "1", "--logdir", logdir])
    assert r.returncode == 0, r.stderr[-2000:]
    ckpt = os.path.join(logdir, "ckpt")
    assert os.path.isdir(ckpt) and os.listdir(ckpt)
    assert os.path.exists(os.path.join(logdir, "metrics.jsonl"))

    # resume one more epoch with forced lr
    r = run(["train.py", "--ckpt-path", ckpt, "--platform", "cpu",
             "--max-epochs", "1", "--logdir", logdir, "--lr", "5e-5"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "resumed" in r.stdout

    # inference CLI
    out_wav = str(d / "out.wav")
    r = run(["inference.py", ckpt, str(wavs / "0.wav"), out_wav,
             "-s", "0.7", "--platform", "cpu"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out_wav)
    assert "Forward LL:" in r.stdout
    assert r.stdout.count("kHz") == 2


def test_train_cli_amp(workspace):
    """The recommended fast path (--precision default --bf16-compute: bf16
    activations, fp32 master params) trains end-to-end with finite,
    decreasing loss."""
    d, cfg_path, _ = workspace
    logdir = str(d / "run_amp")
    r = run(["train.py", "--config", str(cfg_path), "--platform", "cpu",
             "--max-epochs", "1", "--logdir", logdir,
             "--precision", "default", "--bf16-compute"])
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = [json.loads(l) for l in
               open(os.path.join(logdir, "metrics.jsonl"))]
    losses = [m["loss"] for m in metrics]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_export_inference_bf16_cli(workspace):
    """Lean inference export with bf16 param storage: half the bytes on disk,
    loadable by inference.py both with and without --bf16 (fp32 path upcasts)."""
    d, cfg_path, wavs = workspace
    ckpt = str(d / "run" / "ckpt")
    if not os.path.isdir(ckpt):
        pytest.skip("train CLI test did not produce a checkpoint")
    lean = str(d / "lean_bf16")
    r = run(["tools/export_inference.py", ckpt, lean,
             "--platform", "cpu", "--bf16"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "exported step" in r.stdout
    out_wav = str(d / "out_lean.wav")
    r = run(["inference.py", lean, str(wavs / "1.wav"), out_wav,
             "-s", "0.7", "--platform", "cpu"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out_wav) and "Forward LL:" in r.stdout
    r = run(["inference.py", lean, str(wavs / "1.wav"), str(d / "out_lb.wav"),
             "-s", "0.7", "--platform", "cpu", "--bf16"])
    assert r.returncode == 0, r.stderr[-2000:]


# ------------------------------------------------------ all model families
ARCHES = {
    "WaveFlow": {"type": "WaveFlow", "args": {
        "flows": 2, "n_group": 8, "n_mels": 80, "use_conv1x1": False,
        "memory_efficient": False, "dilation_channels": 16,
        "residual_channels": 16, "skip_channels": 16, "bias": False}},
    "MelGlow": {"type": "MelGlow", "args": {
        "flows": 2, "n_group": 8, "n_early_every": 4, "n_early_size": 2,
        "hop_size": 256, "n_mels": 80, "memory_efficient": False,
        "dilation_channels": 16, "residual_channels": 16, "skip_channels": 16,
        "depth": 2, "radix": 3, "predict_channels": 8, "predict_layers": 1,
        "bias": False}},
    "MRWaveGlow": {"type": "MRWaveGlow", "args": {
        "prior_flows": 2, "n_group": 8, "hop_size": 256, "n_mels": 80,
        "levels": 2, "flows": 2, "memory_efficient": False,
        "dilation_channels": 16, "residual_channels": 16, "skip_channels": 16,
        "depth": 2, "radix": 3, "bias": False}},
    "WSRGlow": {"type": "WSRGlow", "args": {
        "upsample_rate": 2, "memory_efficient": True,
        "dilation_channels": 8, "residual_channels": 8, "skip_channels": 8,
        "depth": 1, "radix": 3, "bias": False}},
}


@pytest.mark.parametrize("arch", sorted(ARCHES))
def test_family_train_and_infer_cli(workspace, tmp_path, arch):
    """config -> train -> checkpoint -> inference for every remaining model
    family (the reference exercises all of them through the same two CLIs)."""
    d, _, wavs = workspace
    config = {
        "name": f"cli_{arch.lower()}",
        "arch": ARCHES[arch],
        "dataset": {"type": "RandomWAVDataset", "args": {
            "data_dir": str(wavs), "size": 4, "segment": 4096}},
        "data_loader": {"batch_size": 2, "num_workers": 2},
        "optimizer": {"type": "Adam", "args": {"lr": 1e-4, "weight_decay": 0}},
        "loss": {"type": "WaveGlowLoss", "args": {"sigma": 1.0,
                                                  "elementwise_mean": True}},
        "conditioner": (
            {"type": "STFTDecimate", "args": {"r": 2}} if arch == "WSRGlow"
            else {"type": "MelSpec", "args": {
                "sr": 22050, "n_fft": 1024, "hop_length": 256, "f_max": 8000,
                "n_mels": 80}}),
    }
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(config))
    logdir = str(tmp_path / "run")

    r = run(["train.py", "--config", str(cfg_path), "--platform", "cpu",
             "--max-epochs", "1", "--logdir", logdir])
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-2500:])
    ckpt = os.path.join(logdir, "ckpt")
    assert os.path.isdir(ckpt) and os.listdir(ckpt)

    out_wav = str(tmp_path / "out.wav")
    r = run(["inference.py", ckpt, str(wavs / "0.wav"), out_wav,
             "-s", "0.7", "--platform", "cpu"])
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-2500:])
    assert os.path.exists(out_wav)
    assert r.stdout.count("kHz") == 2


def test_wsrglow_eval_cli(workspace, tmp_path):
    """vctk_wsrglow_infer.py end-to-end on a tiny checkpoint + 2 wavs:
    downsample -> super-resolve -> finite mean LSD printed
    (reference ``vctk_wsrglow_infer.py:84-89``)."""
    import jax

    from constant_memory_waveglow_tpu.training import Experiment, checkpoint

    d, _, wavs = workspace
    config = {
        "name": "wsr_eval",
        "arch": ARCHES["WSRGlow"],
        "optimizer": {"type": "Adam", "args": {"lr": 1e-4, "weight_decay": 0}},
        "loss": {"type": "WaveGlowLoss", "args": {"sigma": 1.0,
                                                  "elementwise_mean": True}},
        "conditioner": {"type": "STFTDecimate", "args": {"r": 2}},
    }
    exp = Experiment(config)
    state = jax.device_get(exp.init_state(jax.random.PRNGKey(0)))
    ckpt = str(tmp_path / "ckpt")
    checkpoint.save_checkpoint(ckpt, 0, state, config)

    r = run(["vctk_wsrglow_infer.py", str(wavs), "--ckpt", ckpt, "-q", "2",
             "--platform", "cpu"], timeout=600)
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-2500:])
    lines = [ln for ln in r.stdout.strip().splitlines() if ln]
    assert "lsd=" in r.stdout
    mean_lsd = float(lines[-1])
    assert np.isfinite(mean_lsd) and mean_lsd > 0

    # both reference downsample modes run e2e (sinc = kaiser/kazane
    # calibration, reference vctk_wsrglow_infer.py:46-58)
    r = run(["vctk_wsrglow_infer.py", str(wavs), "--ckpt", ckpt, "-q", "2",
             "--downsample-type", "sinc", "--platform", "cpu"], timeout=600)
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-2500:])
    sinc_lsd = float([ln for ln in r.stdout.strip().splitlines() if ln][-1])
    assert np.isfinite(sinc_lsd) and sinc_lsd > 0
    # (with a zero-init ckpt the flows are identity and LSD is independent
    # of the degradation; that the two modes actually produce different
    # low-rate signals is unit-tested in test_conditioners.py)


def test_wsrglow_eval_cli_bucketed_compiles(workspace, tmp_path):
    """A sweep over files of DISTINCT lengths must not compile per file:
    the default --len-bucket pads low-rate inputs to a shared bucket, so
    the jitted reverse sees O(max_len/bucket) shapes, not O(files)
    (VERDICT r3 next #4; the reference sweeps whole test sets,
    ``vctk_wsrglow_infer.py:70-89``)."""
    import jax

    from constant_memory_waveglow_tpu.training import Experiment, checkpoint
    from constant_memory_waveglow_tpu.utils.audio import save_wav

    config = {
        "name": "wsr_bucket",
        "arch": ARCHES["WSRGlow"],
        "optimizer": {"type": "Adam", "args": {"lr": 1e-4, "weight_decay": 0}},
        "loss": {"type": "WaveGlowLoss", "args": {"sigma": 1.0,
                                                  "elementwise_mean": True}},
        "conditioner": {"type": "STFTDecimate", "args": {"r": 2}},
    }
    exp = Experiment(config)
    state = jax.device_get(exp.init_state(jax.random.PRNGKey(0)))
    ckpt = str(tmp_path / "ckpt")
    checkpoint.save_checkpoint(ckpt, 0, state, config)

    wavs = tmp_path / "varlen"
    wavs.mkdir()
    rng = np.random.default_rng(1)
    for i, n in enumerate([9000, 12000, 15000, 17800]):  # all unique
        save_wav(str(wavs / f"{i}.wav"),
                 rng.uniform(-0.4, 0.4, n).astype(np.float32), 22050)

    r = run(["vctk_wsrglow_infer.py", str(wavs), "--ckpt", ckpt, "-q", "2",
             "--platform", "cpu"], timeout=600)
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-2500:])
    shape_line = [ln for ln in r.stdout.splitlines()
                  if ln.startswith("distinct synthesis shapes:")][0]
    # every file's low length < the default bucket -> ONE shared shape
    assert shape_line.startswith("distinct synthesis shapes: 1 over 4"), \
        shape_line
    assert np.isfinite(float(r.stdout.strip().splitlines()[-1]))

    # opt-out reproduces the per-length behavior (4 distinct shapes)
    r = run(["vctk_wsrglow_infer.py", str(wavs), "--ckpt", ckpt, "-q", "2",
             "--len-bucket", "0", "--platform", "cpu"], timeout=600)
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-2500:])
    shape_line = [ln for ln in r.stdout.splitlines()
                  if ln.startswith("distinct synthesis shapes:")][0]
    assert shape_line.startswith("distinct synthesis shapes: 4 over 4"), \
        shape_line


def test_wsrglow_bucket_padding_is_tail_local():
    """Bucket padding must only perturb the tail of the kept audio: with the
    same noise on the real region, the padded reverse equals the unpadded
    one everywhere except the final reverse-receptive-field."""
    import jax
    import jax.numpy as jnp

    from constant_memory_waveglow_tpu.models.wsrglow import WSRGlow
    from constant_memory_waveglow_tpu.streaming import reverse_halo_frames

    model = WSRGlow(upsample_rate=2, memory_efficient=False,
                    dilation_channels=16, residual_channels=16,
                    skip_channels=16, depth=3, radix=3, bias=False)
    params = model.init(jax.random.PRNGKey(0))
    low_len, pad = 2048, 512
    h = jax.random.normal(jax.random.PRNGKey(1), (1, low_len)) * 0.1
    z = jax.random.normal(jax.random.PRNGKey(2), (1, low_len * 2))
    h_p = jnp.pad(h, ((0, 0), (0, pad)))
    z_p = jnp.concatenate(
        [z, jax.random.normal(jax.random.PRNGKey(3), (1, pad * 2))], -1)

    full, _ = model.reverse(params, z, h)
    padded, _ = model.reverse(params, z_p, h_p)
    kept = np.asarray(padded)[:, : low_len * 2]
    halo = reverse_halo_frames(model) * model._hop_length
    assert halo < low_len * 2  # the test must actually compare a region
    head = slice(0, low_len * 2 - halo)
    np.testing.assert_allclose(kept[:, head], np.asarray(full)[:, head],
                               atol=1e-5, rtol=1e-4)
