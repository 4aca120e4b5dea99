"""Training: jitted update step, losses, optimizer, checkpointing, logging."""

from .trainer import Trainer, create_trainer_from_args  # noqa: F401
from .losses import build_loss_fn, percentage_errors  # noqa: F401
from .optim import create_optimizer, noam_schedule  # noqa: F401
