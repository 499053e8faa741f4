from .seg import surface_loss, generalized_dice_loss, weighted_ce_loss, seg_loss
from .point import (
    seg_to_pt_loss,
    pt_loss,
    conf_loss,
    self_consistency_loss,
    ellipse_soft_masks,
    seg_to_el_loss,
)
from .hausdorff import weighted_hausdorff_distance, generalized_mean
from .total import compute_all_losses, el_pred_from_seg_centers, LossOutputs

__all__ = [
    "surface_loss",
    "generalized_dice_loss",
    "weighted_ce_loss",
    "seg_loss",
    "seg_to_pt_loss",
    "pt_loss",
    "conf_loss",
    "self_consistency_loss",
    "ellipse_soft_masks",
    "seg_to_el_loss",
    "weighted_hausdorff_distance",
    "generalized_mean",
    "compute_all_losses",
    "el_pred_from_seg_centers",
    "LossOutputs",
]
