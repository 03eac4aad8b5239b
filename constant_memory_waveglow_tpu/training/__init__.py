from .loss import WaveGlowLoss, LOSS_REGISTRY
from .optim import OPTIMIZER_REGISTRY, build_optimizer
from .data import RandomWAVDataset, DataLoader, DATASET_REGISTRY, build_dataset
from .experiment import Experiment, CONDITIONER_REGISTRY, build_conditioner
from .logging import MetricsLogger
from . import checkpoint

__all__ = [
    "WaveGlowLoss",
    "LOSS_REGISTRY",
    "OPTIMIZER_REGISTRY",
    "build_optimizer",
    "RandomWAVDataset",
    "DataLoader",
    "DATASET_REGISTRY",
    "build_dataset",
    "Experiment",
    "CONDITIONER_REGISTRY",
    "build_conditioner",
    "MetricsLogger",
    "checkpoint",
]
