"""Training runtime: optimizers/schedulers, train state, step functions."""

from languagegroundedsemseg_tpu.train.solvers import (
    initialize_optimizer,
    make_lr_schedule,
    sgd_torch,
)
from languagegroundedsemseg_tpu.train.state import TrainState
from languagegroundedsemseg_tpu.train.step import TrainBatch, make_train_step, make_eval_step

__all__ = [
    "initialize_optimizer",
    "make_lr_schedule",
    "sgd_torch",
    "TrainState",
    "TrainBatch",
    "make_train_step",
    "make_eval_step",
]
