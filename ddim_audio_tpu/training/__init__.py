from .losses import loss_registry, noise_estimation_loss
from .optim import adabelief, build_optimizer, noam_schedule
from .ema import ema_init, ema_update, ema_apply
from .grouping import classify_top_level, group_labels
from .train_step import TrainState, make_train_step, antithetic_timesteps, init_train_state

__all__ = [
    "loss_registry",
    "noise_estimation_loss",
    "adabelief",
    "build_optimizer",
    "noam_schedule",
    "ema_init",
    "ema_update",
    "ema_apply",
    "classify_top_level",
    "group_labels",
    "TrainState",
    "make_train_step",
    "antithetic_timesteps",
    "init_train_state",
]
