from .schedule import alpha_schedule, ReduceLROnPlateau, EarlyStopping, composite_stop_metric
from .trainer import TrainState, Trainer, make_train_step, make_eval_step
from .distill import (DistillConfig, DistillTrainer, make_distill_step,
                      make_fidelity_step, evaluate_fidelity, distill_gate)

__all__ = [
    "DistillConfig",
    "DistillTrainer",
    "make_distill_step",
    "make_fidelity_step",
    "evaluate_fidelity",
    "distill_gate",
    "alpha_schedule",
    "ReduceLROnPlateau",
    "EarlyStopping",
    "composite_stop_metric",
    "TrainState",
    "Trainer",
    "make_train_step",
    "make_eval_step",
]
