"""Training-stack tests: loss semantics, dataset/loader, config plumbing,
checkpoint save/restore round-trip, and data-parallel sharding equivalence
(single-device vs 8-device mesh) — the distributed coverage the reference
lacks entirely (SURVEY.md §4)."""

import json
import os

import jax
import jax.numpy as jnp
import jax.tree_util as tu
import numpy as np
import optax
import pytest
import torch

from constant_memory_waveglow_tpu.parallel.mesh import (
    make_mesh, batch_sharding, replicate)
from constant_memory_waveglow_tpu.training import (
    Experiment, DataLoader, WaveGlowLoss, build_dataset, checkpoint)
from constant_memory_waveglow_tpu.utils.audio import save_wav, load_wav


TINY_CONFIG = {
    "name": "tiny",
    "arch": {"type": "WaveGlow", "args": {
        "flows": 2, "n_group": 8, "n_early_every": 4, "n_early_size": 2,
        "hop_size": 256, "n_mels": 80, "memory_efficient": True,
        "dilation_channels": 16, "residual_channels": 16, "skip_channels": 16,
        "depth": 2, "radix": 3, "bias": False}},
    "optimizer": {"type": "Adam", "args": {"lr": 1e-4, "weight_decay": 0}},
    "loss": {"type": "WaveGlowLoss", "args": {"sigma": 0.7, "elementwise_mean": True}},
    "conditioner": {"type": "MelSpec", "args": {
        "sr": 22050, "n_fft": 1024, "hop_length": 256, "f_max": 8000, "n_mels": 80}},
}


def test_loss_matches_torch_reference():
    rng = np.random.default_rng(0)
    z = rng.standard_normal((4, 1000)).astype(np.float32)
    logdet = rng.standard_normal(4).astype(np.float32)
    ours = float(WaveGlowLoss(0.7, True)(jnp.asarray(z), jnp.asarray(logdet)))
    zt, lt = torch.from_numpy(z), torch.from_numpy(logdet)
    ref = ((0.5 * zt.pow(2).sum(1) / 0.49 - lt).mean() / zt.size(1)).item()
    assert abs(ours - ref) < 1e-3


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    for i in range(3):
        save_wav(str(d / f"{i}.wav"), rng.uniform(-0.5, 0.5, 8000).astype(np.float32), 22050)
    # nested dir (VCTK-style layout)
    (d / "spk").mkdir()
    save_wav(str(d / "spk" / "x.wav"), rng.uniform(-0.5, 0.5, 3000).astype(np.float32), 22050)
    return str(d)


def test_dataset_and_loader(wav_dir):
    ds = build_dataset({"type": "RandomWAVDataset",
                        "args": {"data_dir": wav_dir, "size": 16, "segment": 4096}})
    assert len(ds.files) == 4  # recursive glob
    item = ds[0]
    assert item.shape == (4096,) and item.dtype == np.float32
    # short file padded
    loader = DataLoader(ds, batch_size=4, num_workers=2, prefetch_factor=2, seed=0)
    batches = list(loader.epoch(0))
    assert len(batches) == 4
    assert all(b.shape == (4, 4096) for b in batches)


def test_wav_io_roundtrip(tmp_path):
    x = np.sin(np.linspace(0, 100, 5000)).astype(np.float32) * 0.8
    p = str(tmp_path / "t.wav")
    save_wav(p, x, 22050)
    y, sr = load_wav(p)
    assert sr == 22050
    assert np.abs(x - y).max() < 1e-3


def test_train_step_and_checkpoint_roundtrip(tmp_path):
    exp = Experiment(TINY_CONFIG)
    state = exp.init_state(jax.random.PRNGKey(0))
    step = exp.make_train_step(donate=False)
    batch = jax.random.normal(jax.random.PRNGKey(1), (2, 4096)) * 0.1
    state2, metrics = step(state, batch)
    assert int(state2["step"]) == 1
    assert np.isfinite(float(metrics["loss"]))

    ckpt_dir = str(tmp_path / "ckpt")
    checkpoint.save_checkpoint(ckpt_dir, 1, jax.device_get(state2), TINY_CONFIG)
    assert checkpoint.load_config_from_checkpoint(ckpt_dir) == TINY_CONFIG

    restored = checkpoint.restore_checkpoint(ckpt_dir, exp.init_state(jax.random.PRNGKey(5)))
    err = max(tu.tree_leaves(tu.tree_map(
        lambda a, b: float(jnp.abs(jnp.asarray(a, jnp.float32) - jnp.asarray(b, jnp.float32)).max()),
        jax.device_get(state2), restored)))
    assert err == 0.0

    # resume continues deterministically
    s_a, m_a = step(state2, batch)
    s_b, m_b = step(restored, batch)
    assert abs(float(m_a["loss"]) - float(m_b["loss"])) < 1e-6


def test_canonical_layout_checkpoint_roundtrip(tmp_path):
    """On-disk layout is per-flow (round-1 / torch-import compatible) even
    when the model computes in the flow-stacked scan-group layout."""
    exp = Experiment(TINY_CONFIG)
    assert exp.model.scan_flows  # native layout is stacked
    state = exp.init_state(jax.random.PRNGKey(0))
    step = exp.make_train_step(donate=False)
    batch = jax.random.normal(jax.random.PRNGKey(1), (2, 4096)) * 0.1
    state2, _ = step(state, batch)

    canon = exp.canonical_state(jax.device_get(state2))
    # canonical tree is the legacy per-flow layout, Adam moments included
    assert "invconv1x1" in canon["params"] and "groups" not in canon["params"]
    mu = canon["opt_state"][0].mu
    assert "invconv1x1" in mu and "groups" not in mu

    ckpt_dir = str(tmp_path / "ckpt")
    checkpoint.save_checkpoint(ckpt_dir, 1, canon, TINY_CONFIG)
    restored = exp.native_state(checkpoint.restore_checkpoint(
        ckpt_dir, exp.canonical_state(exp.init_state(jax.random.PRNGKey(5)))))

    err = max(tu.tree_leaves(tu.tree_map(
        lambda a, b: float(jnp.abs(jnp.asarray(a, jnp.float32)
                                   - jnp.asarray(b, jnp.float32)).max()),
        jax.device_get(state2), restored)))
    assert err == 0.0

    # resume continues deterministically through the layout round-trip
    _, m_a = step(state2, batch)
    _, m_b = step(restored, batch)
    assert abs(float(m_a["loss"]) - float(m_b["loss"])) < 1e-6


def test_data_parallel_matches_single_device():
    """8-device DP step == single-device step on the same global batch."""
    assert jax.device_count() >= 8
    exp = Experiment(TINY_CONFIG)
    state0 = exp.init_state(jax.random.PRNGKey(0))
    batch = jax.random.normal(jax.random.PRNGKey(1), (8, 4096)) * 0.1

    step = exp.make_train_step(donate=False)
    _, m_single = step(state0, batch)

    mesh = make_mesh(data=8, model=1)
    state_r = replicate(mesh, exp.init_state(jax.random.PRNGKey(0)))
    sharded = jax.device_put(batch, batch_sharding(mesh))
    state_dp, m_dp = step(state_r, sharded)

    assert abs(float(m_single["loss"]) - float(m_dp["loss"])) < 1e-5
    # params after update agree
    err = max(tu.tree_leaves(tu.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        jax.device_get(step(state0, batch)[0]["params"]),
        jax.device_get(state_dp["params"]))))
    assert err < 1e-5


def test_weight_norm_fusion_preserves_outputs():
    from constant_memory_waveglow_tpu.ops.weightnorm import fuse_weight_norms

    exp = Experiment(TINY_CONFIG)
    params = exp.init_state(jax.random.PRNGKey(0))["params"]
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4096)) * 0.1
    h = exp.conditioner(x)
    z1, l1 = exp.model.forward(params, x, h)
    z2, l2 = exp.model.forward(fuse_weight_norms(params), x, h)
    assert float(jnp.abs(z1 - z2).max()) < 1e-5
    assert float(jnp.abs(l1 - l2).max()) < 1e-2


def test_lr_scheduler_changes_applied_lr():
    """torch-named lr_scheduler blocks (legacy musicnet schema) drive an optax
    schedule: the update magnitude follows StepLR's gamma decay."""
    from constant_memory_waveglow_tpu.training.optim import (
        build_lr_schedule, build_optimizer)

    opt = build_optimizer(
        {"type": "SGD", "args": {"lr": 1.0}},
        {"type": "StepLR", "args": {"step_size": 2, "gamma": 0.1}})
    params = {"w": jnp.ones(3)}
    st = opt.init(params)
    g = {"w": jnp.ones(3)}
    deltas = []
    for _ in range(4):
        up, st = opt.update(g, st, params)
        deltas.append(float(up["w"][0]))
    np.testing.assert_allclose(deltas, [-1.0, -1.0, -0.1, -0.1], rtol=1e-6)

    sched = build_lr_schedule(1e-4, {"type": "StepLR",
                                     "args": {"step_size": 10000, "gamma": 0.1}})
    assert abs(float(sched(0)) - 1e-4) < 1e-12
    assert abs(float(sched(10000)) - 1e-5) < 1e-12

    # Experiment carries the schedule when the config has the block
    cfg = dict(TINY_CONFIG, lr_scheduler={"type": "ExponentialLR",
                                          "args": {"gamma": 0.5}})
    exp = Experiment(cfg)
    assert abs(float(exp.lr_schedule(2)) - TINY_CONFIG["optimizer"]["args"]["lr"] * 0.25) < 1e-12


def test_grad_clip_bounds_update_norm():
    """Optional global-norm gradient clipping (Lightning gradient_clip_val
    analog): huge gradients produce updates bounded by clip * lr with SGD,
    untouched when under the threshold; Experiment reads config.grad_clip."""
    from constant_memory_waveglow_tpu.training.optim import build_optimizer

    opt = build_optimizer({"type": "SGD", "args": {"lr": 1.0}},
                          grad_clip=2.0)
    params = {"w": jnp.ones(4)}
    st = opt.init(params)
    g = {"w": jnp.full(4, 100.0)}  # global norm 200 -> clipped to 2
    up, st = opt.update(g, st, params)
    np.testing.assert_allclose(
        float(jnp.linalg.norm(up["w"])), 2.0, rtol=1e-5)
    g_small = {"w": jnp.full(4, 0.5)}  # norm 1 < 2 -> pass through
    up, st = opt.update(g_small, st, params)
    np.testing.assert_allclose(np.asarray(up["w"]), -0.5 * np.ones(4),
                               rtol=1e-6)

    exp = Experiment(dict(TINY_CONFIG, grad_clip=2.0))
    state = exp.init_state(jax.random.PRNGKey(0))
    step = exp.make_train_step(donate=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4096)) * 0.1
    _, metrics = step(state, x)
    assert np.isfinite(float(metrics["loss"]))


def test_microbatched_step_matches_plain():
    """Sublane-aligned gradient accumulation (Experiment.microbatch_plan):
    a forced-chunk step must equal the full-batch step — same updated
    params, loss, and metrics (up to float reassociation)."""
    exp = Experiment(TINY_CONFIG)
    state = exp.init_state(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 4096)) * 0.1

    plain = exp.make_train_step(donate=False, microbatch=None)
    micro = exp.make_train_step(donate=False, microbatch=(4, 2))
    s1, m1 = plain(state, x)
    s2, m2 = micro(state, x)
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                   rtol=2e-4, atol=2e-5)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        s1["params"], s2["params"])
    assert max(jax.tree_util.tree_leaves(diffs)) < 2e-5

    # the auto plan: bf16 splits 24 -> (16, 8); fp32 / stateful / small,
    # unaligned, or already-16-aligned batches (no tile waste to recover)
    # stay whole
    mp = Experiment.microbatch_plan
    assert mp(24, jnp.bfloat16) == (16, 8)
    assert mp(40, jnp.bfloat16) == (16, 16, 8)
    # B % 16 == 12 (the shipped WaveFlow/WSRGlow sample batch): 8+4,
    # measured 69.2 -> 83.4 audio-s/s on the flagship AMP step (round 5)
    assert mp(12, jnp.bfloat16) == (8, 4)
    assert mp(28, jnp.bfloat16) == (16, 8, 4)
    assert mp(32, jnp.bfloat16) is None
    assert mp(16, jnp.bfloat16) is None
    assert mp(24, None) is None
    assert mp(24, jnp.bfloat16, has_state=True) is None
    assert mp(20, jnp.bfloat16) is None  # remainder 4 with B > 16: unmeasured


def test_auto_microbatch_skips_sharded_batches():
    """'auto' must not chunk a data-sharded batch: a chunk slice would
    straddle shards and force resharding collectives (ADVICE r3).  The
    sharding probe sees through: sharded across devices -> True,
    single-device or fully-replicated -> False, tracers -> False."""
    from constant_memory_waveglow_tpu.parallel.mesh import make_global_batch

    mesh = make_mesh(data=8)
    x = np.random.default_rng(0).standard_normal((24, 4096)).astype(np.float32)
    sharded = make_global_batch(mesh, x)
    assert Experiment._batch_axis_sharded(sharded)
    assert not Experiment._batch_axis_sharded(jnp.asarray(x))
    assert not Experiment._batch_axis_sharded(replicate(mesh, jnp.asarray(x)))

    probed = []
    orig = Experiment.microbatch_plan

    def spy(batch_size, compute_dtype, has_state=False):
        plan = orig(batch_size, compute_dtype, has_state)
        probed.append(plan)
        return plan

    exp = Experiment(TINY_CONFIG)
    state = replicate(mesh, exp.init_state(jax.random.PRNGKey(0)))
    step = exp.make_train_step(donate=False, compute_dtype="bfloat16")
    try:
        Experiment.microbatch_plan = staticmethod(spy)
        _, m = step(state, sharded)  # sharded: the plan is never consulted
        assert probed == []
        _, m2 = step(replicate(mesh, state), jnp.asarray(x))  # replicated
        assert probed == [(16, 8)]  # single-logical-device batch: chunked
    finally:
        Experiment.microbatch_plan = staticmethod(orig)
    assert np.isfinite(float(m["loss"])) and np.isfinite(float(m2["loss"]))


def test_cosine_annealing_matches_torch_closed_form():
    """CosineAnnealingLR follows torch's closed form, including past T_max
    where the cosine is periodic and the lr rises back from eta_min."""
    import math

    from constant_memory_waveglow_tpu.training.optim import build_lr_schedule

    base, t_max, eta_min = 1e-3, 10, 1e-5
    sched = build_lr_schedule(base, {"type": "CosineAnnealingLR",
                                     "args": {"T_max": t_max,
                                              "eta_min": eta_min}})
    for step in [0, 3, 10, 13, 20, 27]:
        torch_lr = eta_min + (base - eta_min) * (
            1 + math.cos(math.pi * step / t_max)) / 2
        assert abs(float(sched(step)) - torch_lr) < 1e-9, step


def test_async_checkpoint_roundtrip(tmp_path):
    """Async save (background write) commits the same bytes as blocking save
    and auto-resume only sees committed checkpoints."""
    exp = Experiment(TINY_CONFIG)
    state = jax.device_get(exp.init_state(jax.random.PRNGKey(7)))
    d = str(tmp_path / "ckpt")
    checkpoint.save_checkpoint(d, 5, state, TINY_CONFIG, async_save=True)
    checkpoint.wait_for_saves()
    assert checkpoint.latest_step(d) == 5
    restored = checkpoint.restore_checkpoint(d, state)
    err = max(tu.tree_leaves(tu.tree_map(
        lambda a, b: float(np.abs(np.asarray(a, np.float64)
                                  - np.asarray(b, np.float64)).max()),
        state, restored)))
    assert err == 0.0


def test_infer_jit_compiles_once():
    """The per-epoch TestFileCallBack reconstruction must not retrace or
    re-dispatch eagerly each epoch (regression: eager reverse passes cost
    minutes per epoch on a remote-op runtime)."""
    exp = Experiment(TINY_CONFIG)
    state = exp.init_state(jax.random.PRNGKey(0))
    calls = {"n": 0}
    orig = exp.model.infer

    def counting_infer(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    exp.model.infer = counting_infer
    h = exp.conditioner(np.zeros((1, 4096), np.float32))
    y1 = exp.infer(state, h, jax.random.PRNGKey(1), sigma=0.7)
    y2 = exp.infer(state, h, jax.random.PRNGKey(2), sigma=0.9)
    assert calls["n"] == 1  # traced once; second call (new key+sigma) cached
    assert y1.shape == y2.shape and bool(jnp.isfinite(y1).all())


def test_loader_abandoned_epoch_releases_workers(wav_dir):
    """Regression (round-2 review): breaking out of epoch() mid-way (the
    --max-steps path) must not leave prefetch workers blocked in
    out_q.put() holding batches for the process lifetime."""
    import threading

    ds = build_dataset({"type": "RandomWAVDataset",
                        "args": {"data_dir": wav_dir, "size": 64, "segment": 4096}})
    loader = DataLoader(ds, batch_size=4, num_workers=4, prefetch_factor=1, seed=0)
    before = set(threading.enumerate())
    gen = loader.epoch(0)
    next(gen)  # one batch; 16 total in the epoch, workers keep prefetching
    gen.close()  # runs the generator's finally
    leaked = [t for t in threading.enumerate() if t not in before]
    for t in leaked:
        t.join(timeout=5.0)
    assert not any(t.is_alive() for t in leaked)


def test_bench_peak_flops_resolves_v5e():
    """Regression (round-2 review): 'TPU v5 lite'/'TPU v5e' must resolve to
    the v5e peak (197 TF), not the 'TPU v5' (v5p-class, 459 TF) prefix —
    the MFU estimate was ~2.3x off on the benchmarked hardware."""
    import bench

    orig = bench._device_kind
    try:
        for kind, want in [("TPU v5 lite", 197e12), ("TPU v5e", 197e12),
                           ("TPU v5p", 459e12), ("TPU v4", 275e12),
                           ("TPU v6 lite", 918e12)]:
            bench._device_kind = lambda k=kind: k
            assert bench._peak_flops() == want, kind
    finally:
        bench._device_kind = orig


def test_loader_surfaces_worker_exceptions(wav_dir, tmp_path):
    """Regression (round-2 review): a worker that dies decoding a corrupt
    file must raise in the training loop, not hang it forever (the claimed
    batch index would never arrive at the ordered-yield consumer)."""
    x = (np.sin(np.linspace(0, 100, 8000)) * 0.5).astype(np.float32)
    for i in range(2):
        save_wav(str(tmp_path / f"ok{i}.wav"), x, 22050)
    with open(tmp_path / "corrupt.wav", "wb") as f:
        f.write(b"RIFFxxxxWAVEjunkjunkjunk")
    ds = build_dataset({"type": "RandomWAVDataset",
                        "args": {"data_dir": str(tmp_path), "size": 64,
                                 "segment": 4096}})
    loader = DataLoader(ds, batch_size=8, num_workers=2, prefetch_factor=1,
                        seed=0)
    with pytest.raises(RuntimeError, match="data worker failed"):
        for _ in loader.epoch(0):
            pass


def test_scan_unroll_step_matches_unroll1():
    """--scan-unroll trades memory for scheduler overlap; it must be a pure
    scheduling knob — same loss, metrics, and updated params as unroll 1
    (lax.scan unroll is semantics-preserving, this guards our plumbing)."""
    from constant_memory_waveglow_tpu.flows import scan_group

    exp = Experiment(TINY_CONFIG)
    state = exp.init_state(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 4096)) * 0.1

    step = exp.make_train_step(donate=False, microbatch=None)
    s1, m1 = step(state, x)
    try:
        scan_group.set_scan_unroll(4)
        # new Experiment so the group fns re-trace with the new unroll
        exp4 = Experiment(TINY_CONFIG)
        state4 = exp4.init_state(jax.random.PRNGKey(0))
        step4 = exp4.make_train_step(donate=False, microbatch=None)
        s2, m2 = step4(state4, x)
    finally:
        scan_group.set_scan_unroll(1)
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                   rtol=2e-4, atol=2e-5)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        s1["params"], s2["params"])
    assert max(jax.tree_util.tree_leaves(diffs)) < 2e-5


def test_forced_microbatch_plan_validation():
    """A forced (non-auto) microbatch plan must be valid or raise — silent
    fallback would fake the chunked-step measurement (review finding)."""
    exp = Experiment(TINY_CONFIG)
    state = exp.init_state(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 4096)) * 0.1

    bad = exp.make_train_step(donate=False, microbatch=(4, 4))  # sum != 6
    with pytest.raises(ValueError, match="does not cover"):
        bad(state, x)
    single = exp.make_train_step(donate=False, microbatch=(6,))
    with pytest.raises(ValueError, match="does not cover"):
        single(state, x)


def test_torch_named_optimizers_match_torch():
    """The reference accepts ANY ``torch.optim.*`` class name by reflection
    (``/root/reference/model/lightning.py:41-44``); the registry's additions
    (RMSprop / Adagrad / Adamax) are differentially tested against torch on
    an identical gradient sequence (VERDICT r4 next #7)."""
    from constant_memory_waveglow_tpu.training.optim import build_optimizer

    cases = [
        ("RMSprop", {"lr": 1e-2, "alpha": 0.9, "eps": 1e-8,
                     "momentum": 0.5, "centered": True}),
        ("RMSprop", {"lr": 1e-2}),
        ("Adagrad", {"lr": 1e-2, "lr_decay": 1e-3}),
        ("Adamax", {"lr": 2e-3, "betas": (0.9, 0.99)}),
    ]
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal(6).astype(np.float32)
    grads = [rng.standard_normal(6).astype(np.float32) for _ in range(5)]
    for name, args in cases:
        opt = build_optimizer({"type": name, "args": args})
        params = {"w": jnp.asarray(w0)}
        st = opt.init(params)
        for g in grads:
            up, st = opt.update({"w": jnp.asarray(g)}, st, params)
            params = optax.apply_updates(params, up)

        wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
        targs = dict(args)
        topt = getattr(torch.optim, name)([wt], **targs)
        for g in grads:
            wt.grad = torch.from_numpy(g.copy())
            topt.step()
        np.testing.assert_allclose(np.asarray(params["w"]),
                                   wt.detach().numpy(), rtol=2e-4, atol=2e-6)


def test_lambda_lr_and_linear_lr_schedules():
    """LambdaLR carries its lr_lambda as config text (the JSON analog of the
    reference's callable); LinearLR/ConstantLR follow torch's warmup forms."""
    from constant_memory_waveglow_tpu.training.optim import build_lr_schedule

    sched = build_lr_schedule(1e-3, {"type": "LambdaLR", "args": {
        "lr_lambda": "0.5 ** (step // 2)"}})
    for s, want in [(0, 1e-3), (1, 1e-3), (2, 5e-4), (4, 2.5e-4)]:
        assert abs(float(sched(s)) - want) < 1e-12, s

    sched = build_lr_schedule(1.0, {"type": "LinearLR", "args": {
        "start_factor": 0.25, "total_iters": 4}})
    np.testing.assert_allclose([float(sched(s)) for s in range(6)],
                               [0.25, 0.4375, 0.625, 0.8125, 1.0, 1.0],
                               rtol=1e-6)

    sched = build_lr_schedule(2.0, {"type": "ConstantLR", "args": {
        "factor": 0.5, "total_iters": 3}})
    assert float(sched(0)) == 1.0 and float(sched(3)) == 2.0

    sched = build_lr_schedule(1.0, {"type": "MultiplicativeLR", "args": {
        "lr_lambda": "0.9"}})
    assert abs(float(sched(3)) - 0.9 ** 3) < 1e-9

    with pytest.raises(ValueError, match="step-independent"):
        build_lr_schedule(1.0, {"type": "MultiplicativeLR", "args": {
            "lr_lambda": "1.0 / (step + 1)"}})


def test_config_with_rmsprop_trains():
    """A config naming RMSprop + LambdaLR (valid against the reference's
    reflection contract) builds and trains a few steps with finite loss."""
    cfg = dict(TINY_CONFIG,
               optimizer={"type": "RMSprop", "args": {"lr": 1e-5}},
               lr_scheduler={"type": "LambdaLR",
                             "args": {"lr_lambda": "0.99 ** step"}})
    exp = Experiment(cfg)
    state = exp.init_state(jax.random.PRNGKey(0))
    step = exp.make_train_step(donate=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4096)) * 0.1
    for _ in range(3):
        state, metrics = step(state, x)
    assert np.isfinite(float(metrics["loss"]))

    with pytest.raises(KeyError, match="known"):
        Experiment(dict(TINY_CONFIG,
                        optimizer={"type": "LBFGS", "args": {"lr": 1.0}}))


def test_dataset_augmentation(wav_dir):
    """augment=True (corpus-stretching for the 3-utterance environment):
    segments keep shape/range, differ from the unaugmented crop, are
    deterministic per example index in deterministic mode, and agree
    between the batch and single-item decode paths."""
    from constant_memory_waveglow_tpu.training.data import build_dataset

    kw = {"data_dir": wav_dir, "size": 16, "segment": 4096,
          "deterministic": True}
    ds_plain = build_dataset({"type": "RandomWAVDataset", "args": kw})
    ds_aug = build_dataset({"type": "RandomWAVDataset",
                            "args": dict(kw, augment=True)})
    a1 = ds_aug.sample_batch(np.random.default_rng(0), 4, base_index=8)
    a2 = ds_aug.sample_batch(np.random.default_rng(9), 4, base_index=8)
    p = ds_plain.sample_batch(np.random.default_rng(0), 4, base_index=8)
    assert a1.shape == p.shape == (4, 4096) and a1.dtype == np.float32
    np.testing.assert_array_equal(a1, a2)  # deterministic per index
    assert np.abs(a1).max() <= 1.0
    assert np.abs(a1 - p).max() > 1e-4  # actually augmented
    # batch path == per-item path (both augmented, same index)
    one = ds_aug.sample(np.random.default_rng(0), 8)
    np.testing.assert_allclose(one, a1[0], atol=1e-6)
    # nondeterministic mode varies across draws
    ds_nd = build_dataset({"type": "RandomWAVDataset",
                           "args": dict(kw, augment=True,
                                        deterministic=False)})
    b1 = ds_nd.sample_batch(np.random.default_rng(1), 2)
    b2 = ds_nd.sample_batch(np.random.default_rng(2), 2)
    assert np.abs(b1 - b2).max() > 1e-4


def test_resolve_large_weight_norms_grad_equivalence():
    """Pre-resolving {'v','g'} -> {'w'} inside the loss (round-5 WSRGlow
    V-projection optimization) is a pure refactor of the same math: loss
    and (v, g) gradients match the unresolved path.  The size gate is
    lowered so the tiny test model's weights qualify."""
    from constant_memory_waveglow_tpu.ops import weightnorm as wnorm

    exp = Experiment(TINY_CONFIG)
    state = exp.init_state(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4096)) * 0.1

    def loss(params, resolve):
        cond = exp.conditioner(x)
        if resolve:
            params = wnorm.resolve_large_weight_norms(params, min_elems=1)
        z, logdet = exp.model.forward(params, x, cond)
        return exp.criterion(z.astype(jnp.float32),
                             logdet.astype(jnp.float32))

    l0, g0 = jax.value_and_grad(loss)(state["params"], False)
    l1, g1 = jax.value_and_grad(loss)(state["params"], True)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    assert len(flat0) == len(flat1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)

    # the default gate leaves small params untouched (identity tree)
    resolved = wnorm.resolve_large_weight_norms(state["params"])
    assert jax.tree_util.tree_structure(resolved) == \
        jax.tree_util.tree_structure(state["params"])
