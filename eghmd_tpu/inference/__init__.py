from .preprocess import preprocess_frames, split_dual_eye, rescale_ellipse_to_original
from .evaluator import Evaluator
from .video import VideoPipeline, plot_segmap_ellpreds

__all__ = [
    "preprocess_frames",
    "split_dual_eye",
    "rescale_ellipse_to_original",
    "Evaluator",
    "VideoPipeline",
    "plot_segmap_ellpreds",
]
