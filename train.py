#!/usr/bin/env python
"""Training CLI — TPU-native counterpart of reference ``train.py``.

Usage:
  python train.py --config configs/waveglow_LJ_speech.json
  python train.py --ckpt-path runs/exp/ckpt --lr 5e-5          # resume, force lr

Capability parity with reference ``train.py:48-100``: JSON config, seed,
resume from checkpoint with optional config override, per-epoch
reconstruction audio of a test file (sigma=0.7), learning-rate override on
resume, per-step metric logging.  Data parallelism is a ``data`` mesh axis
with the batch sharded across devices (the DDP equivalent; global batch ==
config batch, as in ``train.py:51-53``).
"""

from __future__ import annotations

import argparse
import copy
import os
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="TPU WaveGlow-family trainer")
    parser.add_argument("--config", type=str, help="config file path")
    parser.add_argument("--ckpt-path", type=str, help="checkpoint to resume from")
    parser.add_argument("--test-file", type=str, help="wav reconstructed to TB each epoch")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--lr", type=float, default=None, help="force learning rate")
    parser.add_argument("--grad-clip", type=float, default=None,
                        help="global-norm gradient clipping (Lightning "
                             "gradient_clip_val analog)")
    parser.add_argument("--max-epochs", type=int, default=100)
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--logdir", type=str, default=None)
    parser.add_argument("--precision", type=str, default=None,
                        choices=["default", "high", "highest"],
                        help="matmul precision for fp32 operands; the "
                             "trainer default is 'default' (bf16 MXU "
                             "passes) under AMP and 'high' (bf16_3x, ~TF32 "
                             "fidelity, the reference's TF32-on analog) "
                             "with --fp32; 'highest' is the --no-tf32 "
                             "analog")
    parser.add_argument("--fp32", action="store_true",
                        help="conservative fp32 training (master + compute "
                             "fp32 at 'high' matmul precision) instead of "
                             "the default AMP path; ~2.6x slower on the "
                             "flagship, loss curves matched to 0.12 over "
                             "13k steps (samples/waveglow_lj_256ch_amp)")
    parser.add_argument("--platform", type=str, default=None,
                        help="force jax platform (e.g. cpu)")
    parser.add_argument("--keep-ckpts", type=int, default=3)
    parser.add_argument("--profile-steps", type=int, default=0,
                        help="capture a jax.profiler trace of N steps")
    parser.add_argument("--debug-nans", action="store_true",
                        help="trap NaNs (the detect_anomaly analog)")
    parser.add_argument("--hang-timeout", type=float, default=0,
                        help="seconds without a completed step before the "
                             "process dumps stacks and exits 42 (wedged-"
                             "runtime detector; pair with auto-resume). "
                             "Must exceed the worst epoch-boundary cost "
                             "(checkpoint + first reconstruction compile). "
                             "Note: the metrics flush (and so the watchdog "
                             "beat) runs ONE STEP behind the device, so a "
                             "hang is detected one step late. 0 = off")
    parser.add_argument("--no-auto-resume", action="store_true",
                        help="do not auto-resume from the logdir's latest ckpt")
    parser.add_argument("--scan-unroll", type=str, default="auto",
                        help="unroll factor for the flow-group scans: "
                             "'auto' (default) picks the largest of 4/2/1 "
                             "whose compiled step fits the chip's memory "
                             "budget (compile-time XLA memory analysis — "
                             "+8%% measured step throughput at 4 on the "
                             "v5e flagship, flows/scan_group.py); an "
                             "integer forces it (1 = strictly one flow's "
                             "internals live at a time)")
    parser.add_argument("--bf16-compute", action="store_true",
                        help="deprecated alias: AMP (bf16 model math, fp32 "
                             "master params) is the default now; use --fp32 "
                             "to opt out")
    # multi-host bring-up (jax.distributed); all three must be set together
    parser.add_argument("--coordinator", type=str, default=None)
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if args.num_processes and args.num_processes > 1:
        jax.distributed.initialize(args.coordinator, args.num_processes,
                                   args.process_id)

    from constant_memory_waveglow_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from constant_memory_waveglow_tpu.ops import set_default_precision
    from constant_memory_waveglow_tpu.parallel.mesh import (
        make_mesh, make_global_batch, replicate, data_axis_size)
    from constant_memory_waveglow_tpu.training import (
        Experiment, DataLoader, MetricsLogger, build_dataset, checkpoint)
    from constant_memory_waveglow_tpu.utils.config import load_config
    from constant_memory_waveglow_tpu.utils.audio import load_wav

    # shipped default = the evidence-backed fast path: AMP (bf16 compute,
    # fp32 master params) at 'default' matmul precision — 13k-step flagship
    # run matched fp32's loss to 0.12 with LSD 1.08 (samples/ index).
    # --fp32 restores the conservative path (fp32 compute, 'high').
    if args.fp32 and args.bf16_compute:
        parser.error("--fp32 and --bf16-compute are contradictory: the "
                     "first opts out of AMP, the second (legacy alias, AMP "
                     "is the default now) opts in")
    amp = not args.fp32
    if args.precision is None:
        args.precision = "default" if amp else "high"
    set_default_precision(args.precision)
    if args.scan_unroll != "auto":
        from constant_memory_waveglow_tpu.flows.scan_group import set_scan_unroll
        set_scan_unroll(int(args.scan_unroll))

    config = load_config(args.config) if args.config else None
    if args.ckpt_path:
        ckpt_config = checkpoint.load_config_from_checkpoint(args.ckpt_path)
        if config is None:
            config = ckpt_config
    assert config is not None, "need --config or a checkpoint with embedded config"
    if args.lr is not None:  # ChangeLRCallback equivalent (train.py:37-45)
        config = copy.deepcopy(config)
        config["optimizer"]["args"]["lr"] = args.lr
    if args.grad_clip is not None:  # Lightning gradient_clip_val analog
        config = copy.deepcopy(config)
        config["grad_clip"] = args.grad_clip

    name = config.get("name", "experiment").replace(" ", "_")
    logdir = args.logdir or os.path.join("runs", name)
    ckpt_dir = os.path.join(logdir, "ckpt")
    # rank-0-only side effects, like the reference (train.py:26-27)
    is_main = jax.process_index() == 0
    logger = MetricsLogger(logdir) if is_main else None

    # preemption recovery: auto-resume from the logdir's latest checkpoint
    if args.ckpt_path is None and not args.no_auto_resume:
        latest = checkpoint.latest_step(ckpt_dir)
        if jax.process_count() > 1:
            # checkpoints require a shared filesystem across hosts; catch the
            # silent-divergence case where ranks see different latest steps
            from jax.experimental import multihost_utils

            seen = multihost_utils.process_allgather(
                np.int64(-1 if latest is None else latest))
            if len(set(int(s) for s in seen)) > 1:
                raise RuntimeError(
                    f"processes disagree on the latest checkpoint step "
                    f"({sorted(set(int(s) for s in seen))}); ckpt_dir must "
                    f"be on a filesystem shared by all hosts")
        if latest is not None:
            args.ckpt_path = ckpt_dir
            print(f"auto-resuming from {ckpt_dir} (step {latest})")

    exp = Experiment(config)
    key = jax.random.PRNGKey(args.seed)
    state = exp.init_state(key)
    if args.ckpt_path:
        # checkpoints are stored in the canonical per-flow layout; restore
        # into that structure and convert back to the model's compute layout
        state = exp.native_state(
            checkpoint.restore_checkpoint(args.ckpt_path,
                                          exp.canonical_state(state)))
        print(f"resumed from {args.ckpt_path} at step {int(state['step'])}")

    global_batch = config["data_loader"]["batch_size"]
    n_proc = jax.process_count()
    assert global_batch % n_proc == 0, (
        f"global batch {global_batch} not divisible by {n_proc} processes")
    n_data = data_axis_size(global_batch)
    if n_data < jax.device_count():
        assert n_proc == 1, "multi-host requires batch divisible by devices"
        print(f"note: using {n_data}/{jax.device_count()} devices on the data "
              f"axis (global batch {global_batch})")
    mesh = make_mesh(data=n_data, devices=jax.devices()[:n_data])
    state = replicate(mesh, state)
    compute_dtype = "bfloat16" if amp else None
    microbatch = "auto" if n_data == 1 else None
    if args.scan_unroll == "auto":
        if n_data == 1 and n_proc == 1:
            # compile-time memory autotune: largest flow-group unroll whose
            # compiled step fits the chip (+8% measured at 4 on the v5e
            # flagship); the winning compile lands in the persistent cache,
            # so the step dispatch below reuses it
            segment = config["dataset"]["args"]["segment"]
            unroll, info = exp.autotune_scan_unroll(
                state, (global_batch, segment), compute_dtype=compute_dtype,
                microbatch=microbatch)
            if is_main:
                print(f"scan-unroll auto -> {unroll} ({info})")
        elif is_main:
            print("scan-unroll auto: multi-device run, keeping unroll 1 "
                  "(per-device memory analysis not modeled); force with "
                  "--scan-unroll N")
    step_fn = exp.make_train_step(
        compute_dtype=compute_dtype,
        # sublane-aligned gradient accumulation only when the whole batch
        # lives on one device; a chunk slice would straddle data-axis
        # shards and force resharding collectives (Experiment docstring)
        microbatch=microbatch)

    dataset = build_dataset(config["dataset"])
    # every process loads global_batch/n_proc examples; make_global_batch
    # stitches the shards (reference global-batch invariant, train.py:51-53)
    loader = DataLoader(dataset, seed=args.seed,
                        process_count=n_proc, process_id=jax.process_index(),
                        **config["data_loader"])
    from constant_memory_waveglow_tpu.utils.profiling import model_summary
    if is_main:
        print(model_summary(state["params"]))
        print(f"{len(dataset.files)} wav files; {loader.steps_per_epoch} "
              f"steps/epoch; {jax.device_count()} devices, {n_proc} processes")

    test_y = None
    if args.test_file:
        test_y, test_sr = load_wav(args.test_file)
        # conditioner of the fixed test wav never changes — compute once,
        # jitted, rather than eagerly per epoch (remote-op dispatch is slow).
        # Replicate over the global mesh: exp.infer's jit also consumes the
        # mesh-replicated state, and a single-device-committed input mixed
        # with mesh-spanning inputs is rejected (hard error multi-host).
        test_cond = replicate(
            mesh, jax.device_get(jax.jit(exp.conditioner)(np.asarray(test_y)[None])))

    step = int(state["step"])
    # resume restores the epoch position too (Lightning's trainer.fit
    # semantics): --max-epochs is a TOTAL budget, not per-invocation, and
    # per-epoch data seeds / reconstruction keys continue instead of
    # replaying epoch 0
    start_epoch = step // loader.steps_per_epoch
    if start_epoch and is_main:
        print(f"resuming at epoch {start_epoch} (step {step})")
    t0 = time.time()
    profiling = False
    # profile a window shortly after (re)start — relative to the CURRENT
    # step so --profile-steps works on resumed runs too
    profile_at = step + 2
    watchdog = None
    if args.hang_timeout:
        from constant_memory_waveglow_tpu.utils.watchdog import HangWatchdog
        watchdog = HangWatchdog(args.hang_timeout).start()
    # metrics are flushed ONE STEP BEHIND: float(metrics) is a blocking
    # device->host fetch, and doing it before dispatching the next step
    # serializes the pipeline (measured 313 ms/step wall against a 180 ms
    # device step on the tunneled runtime).  Dispatch step N+1 first, then
    # fetch step N's metrics — they are already materialized by then, so
    # the fetch costs only the transfer.  The watchdog beat after a flush
    # still proves the device finished a step (one behind).
    pending = None  # (epoch, step, device metrics) awaiting flush

    def flush(p):
        ep, st, m = p
        m = {k: float(v) for k, v in m.items()}
        if watchdog is not None:
            watchdog.beat()
        # lr actually applied at that step (schedule evaluated at the optax
        # update count, which was st-1 before the increment)
        m["lr"] = float(exp.lr_schedule(st - 1))
        if is_main:
            logger.log_scalars(st, m)
        if is_main and (st % 50 == 0 or st == 1):
            dt = time.time() - t0
            print(f"epoch {ep} step {st} loss {m['loss']:.4f} "
                  f"logdet {m['logdet']:.4f} z_std {m['z_std']:.4f} "
                  f"({dt:.1f}s)", flush=True)

    try:
      for epoch in range(start_epoch, args.max_epochs):
        for batch in loader.epoch(epoch):
            if args.profile_steps and step == profile_at and not profiling:
                jax.profiler.start_trace(os.path.join(logdir, "profile"))
                profiling = True
            batch = make_global_batch(mesh, batch)
            state, metrics = step_fn(state, batch)
            step += 1
            if profiling and step >= profile_at + args.profile_steps:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                profiling = False
                print(f"profile trace written to {logdir}/profile")
            if pending is not None:
                flush(pending)
            pending = (epoch, step, metrics)
            if args.max_steps and step >= args.max_steps:
                break
        if pending is not None:  # drain before epoch-boundary work so the
            flush(pending)       # JSONL/TB order matches save/reconstruction
            pending = None

        # every process participates in the save: orbax's save runs a global
        # barrier internally, so a rank-0-only call would deadlock multi-host
        # runs; params are replicated, so device_get is process-local. async:
        # device->host snapshot inline, disk write in background — the step
        # loop of the next epoch is not blocked on I/O
        checkpoint.save_checkpoint(
            ckpt_dir, step, exp.canonical_state(jax.device_get(state)),
            config, async_save=True)
        if is_main:
            checkpoint.prune_checkpoints(ckpt_dir, keep=args.keep_ckpts)

        if test_y is not None:  # TestFileCallBack equivalent (train.py:17-34)
            # the jitted infer consumes globally-sharded state, so every
            # process must launch it; only rank 0 writes the audio
            pred = exp.infer(state, test_cond,
                             replicate(mesh, jax.device_get(jax.random.PRNGKey(epoch))),
                             sigma=0.7)
            if is_main:
                logger.log_audio(step, "reconstruct_audio", np.asarray(pred),
                                 test_sr)
            if watchdog is not None:
                watchdog.beat()  # epoch-boundary work (ckpt + reconstruction
                # compile on the first epoch) can legitimately take minutes

        if args.max_steps and step >= args.max_steps:
            break
    finally:
        # a crash mid-epoch must not lose the final completed step's
        # metrics (ADVICE r3): flush the pending fetch on ANY exit path.
        # Guarded — if the device itself is wedged the blocking fetch
        # would otherwise mask the original exception.
        if pending is not None:
            try:
                flush(pending)
            except Exception as e:  # pragma: no cover - wedged device
                print(f"final metrics flush failed: {e}")
            pending = None

    if watchdog is not None:
        watchdog.stop()  # final save/export below may exceed the step budget
    checkpoint.wait_for_saves()  # don't race the last epoch's async save
    if checkpoint.latest_step(ckpt_dir) != step:
        # only if the loop exited between epoch-boundary saves: re-saving an
        # already-committed step would delete-and-rewrite the newest
        # checkpoint (and lose it if killed mid-rewrite)
        checkpoint.save_checkpoint(
            ckpt_dir, step, exp.canonical_state(jax.device_get(state)), config)
    if is_main:
        print(f"done at step {step}; checkpoints in {ckpt_dir}")


if __name__ == "__main__":
    main()
