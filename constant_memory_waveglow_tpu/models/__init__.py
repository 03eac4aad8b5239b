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
from .waveflow import WaveFlow, WN2D  # noqa: E402
from .melglow import MelGlow, WN_LVC  # noqa: E402
from .wsrglow import WSRGlow  # noqa: E402
from .mr_waveglow import MRWaveGlow  # noqa: E402

MODEL_REGISTRY.register("WaveGlow")(WaveGlow)
MODEL_REGISTRY.register("WaveFlow")(WaveFlow)
MODEL_REGISTRY.register("MelGlow")(MelGlow)
MODEL_REGISTRY.register("WSRGlow")(WSRGlow)
MODEL_REGISTRY.register("MRWaveGlow")(MRWaveGlow)


def build_model(arch_config):
    from ..utils.config import get_instance

    return get_instance(MODEL_REGISTRY, arch_config)


__all__ = [
    "FlowBase", "Reversible", "WN", "WaveGlow", "WaveFlow", "WN2D",
    "MelGlow", "WN_LVC", "WSRGlow", "MRWaveGlow",
    "MODEL_REGISTRY", "build_model",
]
