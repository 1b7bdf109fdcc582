from .state import RegTrainState, create_train_state
from .steps import (default_loss_kwargs, make_eval_step,
                    make_flow_supervised_step, make_train_step)
from .schedule import step_decay_schedule

__all__ = [
    "RegTrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "make_flow_supervised_step",
    "default_loss_kwargs",
    "step_decay_schedule",
]
