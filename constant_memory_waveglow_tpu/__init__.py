"""constant_memory_waveglow_tpu — a TPU-native (JAX/XLA/Pallas) framework for
training deep normalizing-flow vocoders with activation memory constant in flow
depth.

Re-designed from scratch for TPU with the capability surface of the reference
``yoyololicon/constant-memory-waveglow`` (PyTorch/CUDA).  The reference's
storage-freeing autograd Functions (``model/efficient_modules.py``) become
``jax.custom_vjp`` rules whose residuals are the block *outputs*; the backward
rule reconstructs the inputs by running the flow inverse, so XLA's buffer
liveness gives O(1)-in-depth activation memory without any storage hacks.

Layout:
  flows/     invertible-block engine (coupling + invertible 1x1, custom_vjp)
  models/    WaveGlow, WaveFlow, MelGlow, WSRGlow, MRWaveGlow
  ops/       convolutions, STFT/mel conditioners, Pallas kernels
  parallel/  device-mesh / sharding helpers (data parallel et al.)
  training/  loss, trainer, dataset, logging, checkpointing
  utils/     config/registry plumbing
"""

__version__ = "0.1.0"

from . import flows, models, ops, parallel, training, utils  # noqa: F401
