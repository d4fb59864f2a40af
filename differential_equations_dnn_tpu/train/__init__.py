"""Training: one jitted Adam trainer for every equation, metrics, checkpoints."""

from differential_equations_dnn_tpu.train.trainer import (
    TrainConfig,
    TrainResult,
    train,
    make_train_step,
)
from differential_equations_dnn_tpu.train.metrics import mean_absolute_error, l2_error
from differential_equations_dnn_tpu.train.checkpoint import (
    checkpoint_like,
    save_checkpoint,
    restore_checkpoint,
)
from differential_equations_dnn_tpu.train.finetune import finetune_lbfgs

__all__ = [
    "TrainConfig",
    "TrainResult",
    "train",
    "make_train_step",
    "mean_absolute_error",
    "l2_error",
    "checkpoint_like",
    "save_checkpoint",
    "restore_checkpoint",
    "finetune_lbfgs",
]
