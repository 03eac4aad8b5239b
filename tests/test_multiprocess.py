"""Real multi-process data parallelism: 2 ``jax.distributed`` CPU processes
(2 virtual devices each) run train steps where every process loads only its
slice of the global batch; losses must match a single-process run bit-for-bit
semantics (same global batch, same replicated init).

This is the distributed coverage the reference delegates entirely to
Lightning/NCCL (``train.py:77``); here the whole path — per-process loader
slicing, ``make_array_from_process_local_data`` assembly, replicated state,
XLA-inserted gradient all-reduce — is exercised end-to-end.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from constant_memory_waveglow_tpu.training import (
    Experiment, DataLoader, build_dataset)
from tests.test_training import TINY_CONFIG, wav_dir  # noqa: F401 (fixture)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dp_matches_single_process(wav_dir, tmp_path):  # noqa: F811
    port = _free_port()
    outs = [str(tmp_path / f"rank{i}.json") for i in range(2)]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
             str(i), "2", str(port), wav_dir, outs[i]],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"rank failed:\n{log[-3000:]}"

    results = []
    for o in outs:
        with open(o) as f:
            results.append(json.load(f))
    # both ranks computed the same global losses
    assert results[0]["losses"] == results[1]["losses"]
    assert results[0]["step"] == 2  # size 8 / global batch 4
    # per-epoch reconstruction ran on both ranks with identical output
    # (regression: mesh-replicated cond/key into the jitted infer)
    assert results[0]["pred_sum"] == results[1]["pred_sum"]
    assert np.isfinite(results[0]["pred_sum"]) and results[0]["pred_sum"] > 0

    # single-process reference on the identical global batches
    exp = Experiment(TINY_CONFIG)
    state = exp.init_state(jax.random.PRNGKey(0))
    dataset = build_dataset({"type": "RandomWAVDataset", "args": {
        "data_dir": wav_dir, "size": 8, "segment": 4096, "deterministic": True}})
    loader = DataLoader(dataset, batch_size=4, num_workers=2, seed=0)
    step_fn = exp.make_train_step(donate=False)
    ref_losses = []
    for batch in loader.epoch(0):
        state, metrics = step_fn(state, batch)
        ref_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(results[0]["losses"], ref_losses,
                               atol=1e-5, rtol=1e-6)


def _launch(wav_dir, outs, mode, ckpt=None):  # noqa: F811
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
             str(i), "2", str(port), wav_dir, outs[i], mode]
            + ([ckpt] if ckpt else []),
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"rank failed ({mode}):\n{log[-3000:]}"
    results = []
    for o in outs:
        with open(o) as f:
            results.append(json.load(f))
    return results


def test_two_process_data_model_mesh_step(wav_dir, tmp_path):  # noqa: F811
    """2 processes x 2 devices as a data(2) x model(2) mesh: tensor-parallel
    WN channel shards live on DIFFERENT processes, so the TP psum and the
    gradient all-reduce both cross the process boundary (VERDICT r3 next
    #9a; DDP semantics anchor: reference train.py:77)."""
    outs = [str(tmp_path / f"tp{i}.json") for i in range(2)]
    results = _launch(wav_dir, outs, "tp")
    assert results[0]["losses"] == results[1]["losses"]
    assert len(results[0]["losses"]) == 2
    assert all(np.isfinite(l) for l in results[0]["losses"])


def test_two_process_save_resume_equivalence(wav_dir, tmp_path):  # noqa: F811
    """save -> kill -> resume across processes equals the uninterrupted run:
    epoch 0 ends in a COLLECTIVE orbax save (rank-0-only saves deadlock —
    the round-2 bug class), both ranks exit, fresh processes restore and
    train epoch 1; its losses must match the 2-epoch run's epoch-1 losses
    (VERDICT r3 next #9b)."""
    ckpt = str(tmp_path / "mp_ckpt")
    outs = [str(tmp_path / f"save{i}.json") for i in range(2)]
    full = _launch(wav_dir, outs, "save", ckpt)
    assert len(full[0]["losses"]) == 4  # 2 epochs x 2 steps

    outs2 = [str(tmp_path / f"res{i}.json") for i in range(2)]
    resumed = _launch(wav_dir, outs2, "resume", ckpt)
    assert resumed[0]["losses"] == resumed[1]["losses"]
    np.testing.assert_allclose(resumed[0]["losses"], full[0]["losses"][2:],
                               atol=1e-6, rtol=1e-7)
    assert resumed[0]["step"] == full[0]["step"] == 4
