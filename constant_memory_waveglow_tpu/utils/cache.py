"""Persistent XLA compilation cache.

Large train/synthesis graphs take minutes to compile on TPU runtimes with
remote compilation; the persistent cache makes every repeat jit (across
processes and sessions) a sub-second deserialization.  Enabled by every CLI
entry point; the cache lives inside the repo so all tools share it.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache")


def enable_compilation_cache(path: str = None):
    """Idempotently point jax at the shared persistent compilation cache.

    TPU backends only: CPU executables are AOT-compiled against exact host
    CPU features and reload with spurious machine-mismatch warnings (and CPU
    compiles are cheap anyway)."""
    import jax

    if jax.default_backend() in ("cpu",):
        return None
    path = path or os.environ.get("CMWG_JAX_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything: the big graphs are the point, but tiny ops cost ~0
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
