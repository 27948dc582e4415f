"""Training: losses, GAN train state/step, loop, checkpoints, logging."""

from . import losses
from .gan import GANTrainState, GANTrainer, build_models, build_optimizers

__all__ = [
    "losses",
    "GANTrainState",
    "GANTrainer",
    "build_models",
    "build_optimizers",
]
