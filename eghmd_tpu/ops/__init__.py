from .refine import refine_ellipse_batch
from .pallas_softargmax import soft_argmax_2d, seg_centers

__all__ = ["refine_ellipse_batch", "soft_argmax_2d", "seg_centers"]
