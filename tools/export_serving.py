#!/usr/bin/env python
"""Export a checkpoint as a self-contained, length-polymorphic serving
artifact (StableHLO via jax.export; weights baked in, time axis symbolic).

Usage:
  python tools/export_serving.py <ckpt> <out_dir> [--batch 1] [--bf16]
      [--platforms tpu,cpu] [--frames N] [--no-analysis] [--platform cpu]

The artifact loads with ``constant_memory_waveglow_tpu.serving.ServingModel``
(jax + numpy only — no model code) or any StableHLO runtime.  TPU artifacts
can be produced from a CPU-only host (cross-lowering).

WaveFlow + the fused Pallas AR kernel: the kernel needs static shapes and
has no non-TPU lowering, so it is baked ONLY into single-platform
fixed-shape exports — ``--platforms tpu --frames N``.  Such artifacts serve
any length >= N frames through the fixed-window chunker
(``streaming.synthesize_streaming_serving``); the default symbolic-axis /
multi-platform export keeps the portable XLA scan path (~6x slower AR
inverse on TPU).  The meta.json records which you got
(``fused_ar_kernel``).
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
    p.add_argument("--frames", type=int, default=None,
                   help="bake a FIXED frame count instead of the symbolic "
                        "time axis (required to embed the WaveFlow Pallas "
                        "AR kernel; see module docstring)")
    p.add_argument("--no-analysis", action="store_true")
    p.add_argument("--streaming-check", type=str, default="auto",
                   choices=["auto", "force", "skip"],
                   help="WaveFlow only: measure the chunked-synthesis "
                        "deviation on THIS checkpoint (probe > 2*halo, "
                        "fp32), auto-raising WAVEFLOW_AR_ROUNDS until it "
                        "meets --streaming-tol; the result ships in "
                        "meta.json as streaming_max_err and the export "
                        "FAILS if unattainable.  'skip' records it as "
                        "unmeasured (~10 min on CPU for the canonical "
                        "64x64 model; seconds on a TPU)")
    p.add_argument("--streaming-tol", type=float, default=5e-3,
               help="max allowed chunked-vs-one-pass sample deviation "
                    "(default 5e-3 ~ -46 dBFS instantaneous; the "
                    "canonical trained 64x64 measures 4.1e-3 at "
                    "AR_ROUNDS=4).  Utterances that fit the window are "
                    "served exactly either way; tighten this to force "
                    "a larger halo or use the symbolic exact export")
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
        bf16=args.bf16, with_analysis=not args.no_analysis,
        frames=args.frames, streaming_check=args.streaming_check,
        streaming_tol=args.streaming_tol)
    total = sum(os.path.getsize(os.path.join(args.out, f))
                for f in meta["functions"].values())
    print(f"exported {meta['family']} (step {meta['step']}) -> {args.out}: "
          f"{', '.join(meta['functions'])}; {total / 1e6:.1f} MB; "
          f"platforms {meta['platforms']}; "
          f"fused_ar_kernel {meta['fused_ar_kernel']}; "
          f"streaming {meta['streaming_equivalence']} "
          f"(max_err {meta['streaming_max_err']}); "
          f"contract {meta['contract']}")


if __name__ == "__main__":
    main()
