"""Checkpoint / resume via Orbax.

Capability parity with the reference's Lightning checkpointing
(``model/lightning.py:30-31``, ``train.py:65-78``): the full experiment config
is embedded alongside the weights so a checkpoint alone can rebuild the
experiment (optionally with a config override), and optimizer state + step
are restored on resume.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np
import orbax.checkpoint as ocp


def _dir(path):
    return os.path.abspath(os.path.expanduser(path))


# Singleton async checkpointer: the device->host snapshot happens inline, the
# disk write proceeds in a background thread so the step loop is never blocked
# on I/O (SURVEY.md §5 preemption-recovery; the reference blocks inside
# Lightning's epoch-end save).
_ASYNC = None


def _async_checkpointer():
    global _ASYNC
    if _ASYNC is None:
        _ASYNC = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC


def wait_for_saves():
    """Block until every pending async save has committed to disk."""
    if _ASYNC is not None:
        _ASYNC.wait_until_finished()


def save_checkpoint(ckpt_dir, step, state: dict, config: dict = None,
                    async_save=False):
    """state: pytree dict (params / opt_state / step...).  Writes
    ``<ckpt_dir>/<step>/state`` plus a ``config.json`` sidecar.

    ``async_save=True`` snapshots to host inline and writes in the
    background; call :func:`wait_for_saves` before reading the checkpoint
    back or exiting.  Orbax serializes overlapping saves internally.
    """
    ckpt_dir = _dir(ckpt_dir)
    path = os.path.join(ckpt_dir, str(step))
    os.makedirs(path, exist_ok=True)
    if async_save:
        ckptr = _async_checkpointer()
        ckptr.save(os.path.join(path, "state"), args=ocp.args.StandardSave(state),
                   force=True)
    else:
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.join(path, "state"), state, force=True)
    if config is not None and jax.process_index() == 0:
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(config, f, indent=2)


def latest_step(ckpt_dir):
    ckpt_dir = _dir(ckpt_dir)
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d) for d in os.listdir(ckpt_dir)
             if d.isdigit()  # only committed saves (async writes tmp dirs
             and os.path.isdir(os.path.join(ckpt_dir, d, "state"))]  # first)
    return max(steps) if steps else None


def resolve_checkpoint(path):
    """Accept either a ckpt root (returns its latest step dir) or a step dir."""
    path = _dir(path)
    if os.path.isdir(os.path.join(path, "state")):
        return path
    step = latest_step(path)
    if step is None:
        raise FileNotFoundError(f"no checkpoint found under {path}")
    return os.path.join(path, str(step))


def load_config_from_checkpoint(path):
    path = resolve_checkpoint(path)
    cfg = os.path.join(path, "config.json")
    if not os.path.exists(cfg):
        return None
    with open(cfg) as f:
        return json.load(f)


def restore_raw(path):
    """Restore a checkpoint as saved, without an abstract target — used by
    inference tooling so lean (fused, optimizer-free) exports load the same
    way as full training checkpoints."""
    path = resolve_checkpoint(path)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.join(path, "state"))


def restore_checkpoint(path, abstract_state):
    """Restore into the structure of ``abstract_state`` (a live or abstract pytree)."""
    path = resolve_checkpoint(path)
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype)
        if hasattr(x, "dtype") else x,
        abstract_state,
    )
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.join(path, "state"), abstract)


def prune_checkpoints(ckpt_dir, keep=3):
    """Keep the newest ``keep`` COMMITTED checkpoints.

    Uncommitted step dirs (an in-flight async save, or tmp residue from a
    kill mid-save) must not occupy keep slots — counting them would shrink
    the guaranteed committed retention below ``keep``.
    """
    ckpt_dir = _dir(ckpt_dir)
    if keep <= 0 or not os.path.isdir(ckpt_dir):
        return
    committed = sorted(
        int(d) for d in os.listdir(ckpt_dir)
        if d.isdigit() and os.path.isdir(os.path.join(ckpt_dir, d, "state")))
    for s in committed[:-keep]:
        import shutil

        shutil.rmtree(os.path.join(ckpt_dir, str(s)), ignore_errors=True)
