#!/usr/bin/env python
"""Export a training checkpoint as a lean inference artifact.

Drops optimizer state and fuses weight normalization (``g * v/||v||`` -> a
plain weight), the deployment analog of the reference's
``remove_weight_norms`` at load time (``inference.py:17``).  The exported
directory is loadable by ``inference.py`` / ``vctk_wsrglow_infer.py``.

Usage: python tools/export_inference.py <train_ckpt> <out_dir> [--platform cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ckpt", type=str)
    p.add_argument("out", type=str)
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--bf16", action="store_true",
                   help="store floating params in bfloat16 (half the bytes; "
                        "inference.py upcasts to fp32 unless run with --bf16)")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from constant_memory_waveglow_tpu.ops.weightnorm import fuse_weight_norms
    from constant_memory_waveglow_tpu.training import Experiment, checkpoint
    from constant_memory_waveglow_tpu.utils.trees import tree_size_bytes

    config = checkpoint.load_config_from_checkpoint(args.ckpt)
    exp = Experiment(config)
    # on-disk layout is canonical per-flow; keep the lean export canonical too
    state = checkpoint.restore_checkpoint(
        args.ckpt, exp.canonical_state(exp.init_state(jax.random.PRNGKey(0))))

    params = fuse_weight_norms(state["params"])
    if args.bf16:
        import jax.numpy as jnp

        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, params)
    lean = {
        "params": params,
        "model_state": state["model_state"],
        "opt_state": None,
        "step": state["step"],
    }
    # opt_state must exist structurally for restore_checkpoint round-trips;
    # store an empty dict instead of the Adam moments
    lean["opt_state"] = {}
    step = int(state["step"])
    checkpoint.save_checkpoint(args.out, step, jax.device_get(lean), config)
    print(f"exported step {step}: {tree_size_bytes(state) / 1e6:.1f} MB -> "
          f"{tree_size_bytes(lean) / 1e6:.1f} MB at {args.out}")


if __name__ == "__main__":
    main()
