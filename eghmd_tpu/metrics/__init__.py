from .iou import seg_iou_metrics, nan_mean
from .distances import point_metric, angle_metric
from .raster import (
    rasterize_ellipse,
    ellipse_mask_iou,
    ellipse_bbox_corners,
    bbox_iou,
    ellipse_bbox_iou,
)

__all__ = [
    "seg_iou_metrics",
    "nan_mean",
    "point_metric",
    "angle_metric",
    "rasterize_ellipse",
    "ellipse_mask_iou",
    "ellipse_bbox_corners",
    "bbox_iou",
    "ellipse_bbox_iou",
]
