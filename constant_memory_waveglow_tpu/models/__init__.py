"""Model registry.

Reference equivalent: ``model/__init__`` + reflection via ``get_instance``
(``utils.py:5-6``).  Config blocks ``{"type": "WaveGlow", "args": {...}}``
resolve through ``MODEL_REGISTRY``.
"""

from ..utils.config import Registry

MODEL_REGISTRY = Registry("model")

from .base import FlowBase, Reversible  # noqa: E402
from .wn import WN  # noqa: E402
from .waveglow import WaveGlow  # noqa: E402

MODEL_REGISTRY.register("WaveGlow")(WaveGlow)


def build_model(arch_config):
    from ..utils.config import get_instance

    return get_instance(MODEL_REGISTRY, arch_config)


__all__ = ["FlowBase", "Reversible", "WN", "WaveGlow", "MODEL_REGISTRY", "build_model"]
