"""On-device ellipse / rotated-bbox rasterization and IoU.

Replaces the reference's cv2/numpy raster paths with batched jnp mesh
evaluation so they run inside jit on TPU:
  * ellipse raster + mask IoU      — reference utils.py:176-204 (calc_ell_iou)
  * rotated bbox corners + IoU     — reference calc_box_iou.py:13-54

The reference computes bbox IoU by truncating corners to int32 and
cv2.fillPoly on a 240x320 grid; we reproduce the truncation and fill via a
half-plane point-in-quad test on pixel centers (agreement is exact up to
cv2's polygon boundary-pixel convention, < 1% IoU difference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.points import create_meshgrid


def rasterize_ellipse(el_param, h, w, normalized=True):
    """Binary inside-mask(s) of ellipse(s) on an h x w grid.

    el_param: [..., 5]; when ``normalized`` the params live in [-1, 1] mesh
    coordinates (reference utils.py:189-196), otherwise in pixels.
    Returns [..., h, w] float {0, 1}.
    """
    grid = create_meshgrid(h, w, normalized, jnp, dtype=jnp.float32)
    mx, my = grid[..., 0], grid[..., 1]
    cx, cy, a, b, th = (el_param[..., i, None, None] for i in range(5))
    x = (mx - cx) * jnp.cos(th) + (my - cy) * jnp.sin(th)
    y = -(mx - cx) * jnp.sin(th) + (my - cy) * jnp.cos(th)
    inside = (x / a) ** 2 + (y / b) ** 2 - 1.0 <= 0
    return inside.astype(jnp.float32)


def ellipse_mask_iou(seg, el_param, normalized=True):
    """IoU between a binary seg map and a rasterized ellipse.

    Reference utils.py:176-204 (``calc_ell_iou``). seg: [..., H, W] binary;
    el_param: [..., 5]. Batched; runs on device.
    """
    h, w = seg.shape[-2], seg.shape[-1]
    ell = rasterize_ellipse(el_param, h, w, normalized)
    seg = seg.astype(jnp.float32)
    inter = jnp.sum(seg * ell, axis=(-2, -1))
    union = jnp.sum(seg, axis=(-2, -1)) + jnp.sum(ell, axis=(-2, -1)) - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 0.0)


def ellipse_bbox_corners(el_param):
    """4 corners of the rotated bounding box of an ellipse.

    Reference calc_box_iou.py:13-27 (``calc_bbox``): rotate the center by
    -alpha, offset by (+-a, +-b), rotate corners back by +alpha.
    el_param: [..., 5] -> [..., 4, 2].
    """
    cx, cy, a, b, al = (el_param[..., i] for i in range(5))
    c, s = jnp.cos(al), jnp.sin(al)
    # rotate center by -alpha
    xx = c * cx + s * cy
    yy = -s * cx + c * cy
    offs = jnp.stack([
        jnp.stack([-a, -b], axis=-1),
        jnp.stack([-a, b], axis=-1),
        jnp.stack([a, b], axis=-1),
        jnp.stack([a, -b], axis=-1),
    ], axis=-2)  # [..., 4, 2]
    px = xx[..., None] + offs[..., 0]
    py = yy[..., None] + offs[..., 1]
    # rotate back by +alpha
    rx = c[..., None] * px - s[..., None] * py
    ry = s[..., None] * px + c[..., None] * py
    return jnp.stack([rx, ry], axis=-1)


def _fill_quad(corners, h, w):
    """Rasterize a convex quad given int-truncated corners, on pixel centers."""
    corners = jnp.trunc(corners)  # np.int32 cast truncates toward zero
    grid = create_meshgrid(h, w, False, jnp, dtype=jnp.float32)
    px, py = grid[..., 0], grid[..., 1]
    inside = None
    for i in range(4):
        x0, y0 = corners[..., i, 0], corners[..., i, 1]
        x1, y1 = corners[..., (i + 1) % 4, 0], corners[..., (i + 1) % 4, 1]
        cross = (x1 - x0)[..., None, None] * (py - y0[..., None, None]) - \
                (y1 - y0)[..., None, None] * (px - x0[..., None, None])
        this = cross >= 0
        inside = this if inside is None else (inside & this)
    # quads may wind either way: also accept all-negative
    neg = None
    for i in range(4):
        x0, y0 = corners[..., i, 0], corners[..., i, 1]
        x1, y1 = corners[..., (i + 1) % 4, 0], corners[..., (i + 1) % 4, 1]
        cross = (x1 - x0)[..., None, None] * (py - y0[..., None, None]) - \
                (y1 - y0)[..., None, None] * (px - x0[..., None, None])
        this = cross <= 0
        neg = this if neg is None else (neg & this)
    return (inside | neg).astype(jnp.float32)


def bbox_iou(corners1, corners2, shape=(240, 320)):
    """Pixel IoU of two (rotated) boxes (reference calc_box_iou.py:28-37)."""
    h, w = shape
    m1 = _fill_quad(corners1, h, w)
    m2 = _fill_quad(corners2, h, w)
    inter = jnp.sum(m1 * m2, axis=(-2, -1))
    union = jnp.sum(jnp.maximum(m1, m2), axis=(-2, -1))
    return jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 0.0)


def ellipse_bbox_iou(ell1, ell2, shape=(240, 320)):
    """The paper's "box IoU" metric (reference calc_box_iou.py:51-54)."""
    return bbox_iou(ellipse_bbox_corners(ell1), ellipse_bbox_corners(ell2), shape)
