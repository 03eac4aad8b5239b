#!/usr/bin/env python
"""Convert a reference PyTorch-Lightning checkpoint to a framework checkpoint.

Usage:
  python tools/import_torch_ckpt.py <lightning.ckpt> <out_ckpt_dir> [--step N]

The result loads through ``inference.py`` / ``vctk_wsrglow_infer.py`` exactly
like a natively-trained checkpoint (config embedded; optimizer-free export).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ckpt", help="reference Lightning .ckpt file")
    p.add_argument("out", help="output checkpoint directory")
    p.add_argument("--step", type=int, default=0)
    p.add_argument("--platform", type=str, default=None,
                   help="jax platform (e.g. cpu); conversion needs no "
                        "accelerator, and a device backend that is slow or "
                        "unavailable would stall it")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from constant_memory_waveglow_tpu.training import checkpoint
    from constant_memory_waveglow_tpu.utils.torch_import import (
        import_lightning_checkpoint)

    params, model_state, config = import_lightning_checkpoint(args.ckpt)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    model_state = jax.tree_util.tree_map(jnp.asarray, model_state)
    # a fresh optimizer state makes the import a full training checkpoint:
    # train.py --ckpt-path restores into the canonical structure (params +
    # Adam moments), so omitting opt_state would fail the structural restore
    from constant_memory_waveglow_tpu.training import Experiment

    exp = Experiment(config)
    state = {"params": params, "model_state": model_state,
             "opt_state": exp.optimizer.init(params),
             "step": jnp.asarray(args.step, jnp.int32)}
    checkpoint.save_checkpoint(args.out, args.step, jax.device_get(state), config)
    n = sum(a.size for a in jax.tree_util.tree_leaves(params))
    print(f"imported {n:,} params -> {args.out}/{args.step}")


if __name__ == "__main__":
    main()
