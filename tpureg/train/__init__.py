from .state import RegTrainState, create_train_state
from .steps import make_eval_step, make_flow_supervised_step, make_train_step
from .schedule import step_decay_schedule

__all__ = [
    "RegTrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "make_flow_supervised_step",
    "step_decay_schedule",
]
