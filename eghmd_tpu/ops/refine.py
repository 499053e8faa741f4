"""Batched, device-resident ellipse refinement.

Replaces the reference's per-frame CPU coordinate descent
(reference utils.py:401-486, ``search_proper_parameter_iou*``): a <=40-sweep
descent over (a, b, theta_deg) maximizing the raster IoU between the ellipse
and the predicted segmentation mask, with per-coordinate step decay x0.8 and
early exit. The reference runs this on host numpy with a GPU IoU per probe —
SURVEY §3.3 identifies it as the dominant serving cost. Here the whole
descent is a ``lax.fori_loop`` over fused mesh evaluations, batched over all
ellipses in flight, and never leaves the device.

Semantics match the reference sweep exactly (sequential coordinate probes,
acceptance against the last sweep's best score, decay on double rejection,
termination once a full sweep rejects everything) — an ``active`` mask
replicates the early ``break`` without dynamic shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry.points import create_meshgrid
from ..geometry.ellipse import norm_mat, transform_ellipse


def _iou_score(seg, seg_sum, mesh_x, mesh_y, h_norm, center, abt):
    """Raster IoU between seg [B,H,W] (binary) and pixel-space ellipses
    (center px, abt = (a, b, theta_DEGREES)).

    Scoring reproduces reference calc_ell_iou with nor=False, angle_nor=True
    (utils.py:182-196): params are conic-transformed to normalized
    coordinates and rasterized on the normalized [-1,1] meshgrid with the
    <=0 boundary convention — NOT on pixel centers, whose grid differs by a
    half pixel at the borders.
    """
    params_px = jnp.concatenate([center, abt[:, :2], jnp.deg2rad(abt[:, 2:3])], axis=1)
    p = transform_ellipse(params_px, h_norm, jnp)
    cx, cy, a, b, th = (p[:, i, None, None] for i in range(5))
    x = (mesh_x - cx) * jnp.cos(th) + (mesh_y - cy) * jnp.sin(th)
    y = -(mesh_x - cx) * jnp.sin(th) + (mesh_y - cy) * jnp.cos(th)
    inside = ((x / a) ** 2 + (y / b) ** 2 - 1.0 <= 0).astype(jnp.float32)
    inter = jnp.sum(inside * seg, axis=(1, 2))
    union = seg_sum + jnp.sum(inside, axis=(1, 2)) - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 0.0)


@partial(jax.jit, static_argnums=(2,))
def refine_ellipse_batch(seg, el_px, num_sweeps: int = 40):
    """Refine pixel-space ellipses against binary seg masks.

    seg: [B, H, W] binary {0,1} mask of the target class
    el_px: [B, 5] (cx, cy, a, b, theta_rad) pixel-space ellipses
    Returns [B, 5] refined ellipses (center unchanged — the reference keeps
    the seg-derived center and only refines (a, b, theta),
    utils.py:455-456).
    """
    b, h, w = seg.shape
    seg = seg.astype(jnp.float32)
    seg_sum = jnp.sum(seg, axis=(1, 2))
    grid = create_meshgrid(h, w, True, jnp, dtype=jnp.float32)
    mesh_x, mesh_y = grid[..., 0], grid[..., 1]
    h_norm = norm_mat(h, w, jnp, dtype=jnp.float32)

    center = el_px[:, :2]
    abt0 = jnp.stack(
        [el_px[:, 2], el_px[:, 3], jnp.rad2deg(el_px[:, 4])], axis=1
    )
    score = lambda abt: _iou_score(seg, seg_sum, mesh_x, mesh_y, h_norm, center, abt)
    rt0 = score(abt0)

    def sweep(_, carry):
        now, d, rt, active = carry
        flag = jnp.zeros_like(active)
        for j in range(3):
            minus = now.at[:, j].add(-d[:, j])
            s_minus = score(minus)
            acc_minus = (s_minus > rt) & active
            plus = now.at[:, j].add(d[:, j])
            s_plus = score(plus)
            acc_plus = (s_plus > rt) & active & ~acc_minus
            now = jnp.where(acc_minus[:, None], minus,
                            jnp.where(acc_plus[:, None], plus, now))
            rejected = active & ~acc_minus & ~acc_plus
            d = d.at[:, j].multiply(jnp.where(rejected, 0.8, 1.0))
            flag = flag | acc_minus | acc_plus
        s_end = score(now)
        rt = jnp.where(active & (s_end > rt), s_end, rt)
        active = active & flag
        return now, d, rt, active

    init = (abt0, jnp.ones_like(abt0), rt0, jnp.ones(b, bool))
    now, _, _, _ = jax.lax.fori_loop(0, num_sweeps, sweep, init)
    return jnp.concatenate([center, now[:, :2], jnp.deg2rad(now[:, 2:3])], axis=1)
