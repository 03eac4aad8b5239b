"""Test harness: CPU backend with 8 virtual devices for sharding tests.

Must run before jax initializes a backend (the image's sitecustomize registers
the TPU plugin; ``jax_platforms=cpu`` overrides it).
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
