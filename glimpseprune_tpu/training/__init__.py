from glimpseprune_tpu.training.losses import LOSSES, dice_loss, bce_loss, mask_loss
from glimpseprune_tpu.training.train_step import (
    TrainState,
    init_train_state,
    make_train_step,
    new_module_filter,
    split_params,
)

__all__ = [
    "LOSSES",
    "dice_loss",
    "bce_loss",
    "mask_loss",
    "TrainState",
    "init_train_state",
    "make_train_step",
    "new_module_filter",
    "split_params",
]
