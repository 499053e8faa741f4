"""Coordinate-grid and point-normalization helpers.

Semantics mirror the reference's meshgrid / point utilities
(reference: utils.py:27-60, utils.py:627-643, utils.py:885-904) as pure,
array-module-agnostic functions.
"""

from __future__ import annotations

import jax.numpy as jnp


def create_meshgrid(height, width, normalized_coordinates=True, xp=jnp, dtype=None):
    """[H, W, 2] grid with channel 0 = x (over width), channel 1 = y.

    When normalized, coordinates span [-1, 1] inclusive of endpoints, exactly
    matching ``torch.linspace`` as used by the reference (utils.py:27-60).
    Note the reference returns [1, H, W, 2]; we drop the leading singleton.
    """
    if normalized_coordinates:
        xs = xp.linspace(-1.0, 1.0, width, dtype=dtype)
        ys = xp.linspace(-1.0, 1.0, height, dtype=dtype)
    else:
        xs = xp.linspace(0.0, width - 1.0, width, dtype=dtype)
        ys = xp.linspace(0.0, height - 1.0, height, dtype=dtype)
    xg = xp.broadcast_to(xs[None, :], (height, width))
    yg = xp.broadcast_to(ys[:, None], (height, width))
    return xp.stack([xg, yg], axis=-1)


def norm_pts(pts, size, xp=jnp):
    """Pixel points -> [-1, 1]. ``size = (H, W)`` (reference utils.py:627-634)."""
    pts = xp.asarray(pts)
    h, w = size
    x = 2.0 * (pts[..., 0] / w) - 1.0
    y = 2.0 * (pts[..., 1] / h) - 1.0
    return xp.stack([x, y], axis=-1)


def unnorm_pts(pts, size, xp=jnp):
    """[-1, 1] points -> pixels. ``size = (H, W)`` (reference utils.py:636-643)."""
    pts = xp.asarray(pts)
    h, w = size
    x = 0.5 * w * (pts[..., 0] + 1.0)
    y = 0.5 * h * (pts[..., 1] + 1.0)
    return xp.stack([x, y], axis=-1)


def soft_heaviside(x, sc=64.0, mode=3, xp=jnp):
    """Differentiable step function (reference utils.py:885-904).

    mode 1: 0.9 / (1 + exp(-sc / x))
    mode 2: 0.45 * (1 + (2/pi) * atan2(x, sc))
    mode 3: sigmoid(sc * x)   (the only mode used by the reference losses)
    """
    x = xp.asarray(x)
    if mode == 1:
        return 0.9 / (1.0 + xp.exp(-sc / x))
    if mode == 2:
        return 0.45 * (1.0 + (2.0 / jnp.pi) * xp.arctan2(x, xp.full_like(x, sc)))
    if mode == 3:
        return 1.0 / (1.0 + xp.exp(-sc * x))
    raise ValueError(f"soft_heaviside mode {mode} undefined")
