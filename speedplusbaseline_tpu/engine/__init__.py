from .optim import build_optimizer, step_lr_schedule
from .state import TrainState, create_train_state
from .steps import (
    make_krn_train_step,
    make_spn_train_step,
    make_dann_train_step,
    make_krn_eval_step,
    make_spn_eval_step,
)

__all__ = [
    "build_optimizer",
    "step_lr_schedule",
    "TrainState",
    "create_train_state",
    "make_krn_train_step",
    "make_spn_train_step",
    "make_dann_train_step",
    "make_krn_eval_step",
    "make_spn_eval_step",
]
