from .schedule import alpha_schedule, ReduceLROnPlateau, EarlyStopping, composite_stop_metric
from .trainer import TrainState, Trainer, make_train_step, make_eval_step
from .distill import (DistillConfig, DistillTrainer, make_distill_step,
                      make_fidelity_step, evaluate_fidelity, distill_gate,
                      real_frame_agreement, real_frame_eye_scores,
                      pseudo_label_real_samples)
from .bdcn_train import (BDCNTrainer, boundary_map_from_labels, bdcn_loss,
                         class_balanced_bce, edge_f1, load_bdcn_checkpoint,
                         save_bdcn_checkpoint)

__all__ = [
    "BDCNTrainer",
    "boundary_map_from_labels",
    "bdcn_loss",
    "class_balanced_bce",
    "edge_f1",
    "load_bdcn_checkpoint",
    "save_bdcn_checkpoint",
    "DistillConfig",
    "DistillTrainer",
    "make_distill_step",
    "make_fidelity_step",
    "evaluate_fidelity",
    "distill_gate",
    "real_frame_agreement",
    "real_frame_eye_scores",
    "pseudo_label_real_samples",
    "alpha_schedule",
    "ReduceLROnPlateau",
    "EarlyStopping",
    "composite_stop_metric",
    "TrainState",
    "Trainer",
    "make_train_step",
    "make_eval_step",
]
