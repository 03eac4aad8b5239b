from .loss import WaveGlowLoss, LOSS_REGISTRY

__all__ = ["WaveGlowLoss", "LOSS_REGISTRY"]
