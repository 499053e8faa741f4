from .ellipse import (
    rotation_2d,
    translation_2d,
    scale_2d,
    param_to_conic,
    conic_to_param,
    transform_ellipse,
    ellifit,
    fit_error,
    generate_points_equiangle,
    get_ellipse_info,
    norm_mat,
    unnorm_mat,
)
from .points import create_meshgrid, norm_pts, unnorm_pts, soft_heaviside

__all__ = [
    "rotation_2d",
    "translation_2d",
    "scale_2d",
    "param_to_conic",
    "conic_to_param",
    "transform_ellipse",
    "ellifit",
    "fit_error",
    "generate_points_equiangle",
    "get_ellipse_info",
    "norm_mat",
    "unnorm_mat",
    "create_meshgrid",
    "norm_pts",
    "unnorm_pts",
    "soft_heaviside",
]
