from .refine import refine_ellipse_batch

__all__ = ["refine_ellipse_batch"]
