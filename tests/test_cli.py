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
