from .refine import refine_ellipse_batch
from .pallas_softargmax import soft_argmax_2d, seg_centers
from .pallas_dense_block import fused_up_block

__all__ = ["refine_ellipse_batch", "soft_argmax_2d", "seg_centers",
           "fused_up_block"]
