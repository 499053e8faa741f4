"""Center-distance and angular metrics (reference utils.py:152-170)."""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry.points import unnorm_pts


def point_metric(y_true, y_pred, cond_missing, size=None, do_unnorm=False):
    """Euclidean center error in pixels over valid samples.

    Reference utils.py:152-162 (``getPoint_metric``): optionally unnormalize
    predictions to pixels, mask by ~cond, mean over valid (NaN if none).
    Returns (mean, per_sample_dist * valid_flag).
    """
    if do_unnorm:
        y_pred = unnorm_pts(y_pred, size, jnp)
    flag = 1.0 - cond_missing.astype(y_pred.dtype)
    dist = jnp.sqrt(jnp.sum((y_true - y_pred) ** 2, axis=-1))
    dist = flag * dist
    total = jnp.sum(flag)
    mean = jnp.where(total > 0, jnp.sum(dist) / jnp.maximum(total, 1e-20), jnp.nan)
    return mean, dist


def angle_metric(y_true, y_pred, cond_missing):
    """|angle error| in degrees over valid samples (reference utils.py:164-170)."""
    flag = 1.0 - cond_missing.astype(y_pred.dtype)
    dist = jnp.rad2deg(flag * jnp.abs(y_true - y_pred))
    total = jnp.sum(flag)
    mean = jnp.where(total > 0, jnp.sum(dist) / jnp.maximum(total, 1e-20), jnp.nan)
    return mean, dist
