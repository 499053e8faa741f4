from .preprocess import preprocess_frames, split_dual_eye, rescale_ellipse_to_original
from .evaluator import Evaluator
from .video import VideoPipeline, plot_segmap_ellpreds
from .serving import (build_serving_step, export_serving_artifact,
                      load_serving_artifact)

__all__ = [
    "build_serving_step",
    "export_serving_artifact",
    "load_serving_artifact",
    "preprocess_frames",
    "split_dual_eye",
    "rescale_ellipse_to_original",
    "Evaluator",
    "VideoPipeline",
    "plot_segmap_ellpreds",
]
