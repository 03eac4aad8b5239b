#!/usr/bin/env python
"""Export a checkpoint as a self-contained, length-polymorphic serving
artifact (StableHLO via jax.export; weights baked in, time axis symbolic).

Usage:
  python tools/export_serving.py <ckpt> <out_dir> [--batch 1] [--bf16]
      [--platforms tpu,cpu] [--no-analysis] [--platform cpu]

The artifact loads with ``constant_memory_waveglow_tpu.serving.ServingModel``
(jax + numpy only — no model code) or any StableHLO runtime.  TPU artifacts
can be produced from a CPU-only host (cross-lowering).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ckpt")
    p.add_argument("out")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--bf16", action="store_true",
                   help="bake weights in bfloat16 and run the flows on the "
                        "bf16 MXU path (quantized conds stay fp32)")
    p.add_argument("--platforms", type=str, default="tpu,cpu")
    p.add_argument("--no-analysis", action="store_true")
    p.add_argument("--platform", type=str, default=None,
                   help="jax platform to trace on (e.g. cpu)")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from constant_memory_waveglow_tpu.serving import export_serving

    meta = export_serving(
        args.ckpt, args.out, batch=args.batch,
        platforms=tuple(s.strip() for s in args.platforms.split(",") if s.strip()),
        bf16=args.bf16, with_analysis=not args.no_analysis)
    total = sum(os.path.getsize(os.path.join(args.out, f))
                for f in meta["functions"].values())
    print(f"exported {meta['family']} (step {meta['step']}) -> {args.out}: "
          f"{', '.join(meta['functions'])}; {total / 1e6:.1f} MB; "
          f"platforms {meta['platforms']}; contract {meta['contract']}")


if __name__ == "__main__":
    main()
