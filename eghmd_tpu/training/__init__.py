from .schedule import alpha_schedule, ReduceLROnPlateau, EarlyStopping, composite_stop_metric
from .trainer import TrainState, Trainer, make_train_step, make_eval_step

__all__ = [
    "alpha_schedule",
    "ReduceLROnPlateau",
    "EarlyStopping",
    "composite_stop_metric",
    "TrainState",
    "Trainer",
    "make_train_step",
    "make_eval_step",
]
