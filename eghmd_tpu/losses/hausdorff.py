"""Weighted Hausdorff distance between a probability map and GT points.

Counterpart of reference loss.py:221-342 (``WeightedHausdorffDistance``,
defined in the reference but unused by its drivers; kept for component
parity). The reference's per-sample python loop over the batch is one
vectorized computation here; the generalized mean follows reference
utils.py:926-951 and the pairwise distances reference utils.py:914-924.

Shapes: prob_map [B, H, W] in [0, 1]; gt [B, 2] one (row, col) point per
sample (the reference unsqueezes each sample's point to [1, 2],
loss.py:297); orig_sizes [B, 2] (height, width).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


def generalized_mean(x, p=-9.0, axis=0, keepdims=False, eps=1e-6):
    """(mean(x^p))^(1/p) — the minimum as p -> -inf (reference utils.py:926)."""
    return jnp.mean((x + eps) ** p, axis=axis, keepdims=keepdims) ** (1.0 / p)


@functools.partial(jnp.vectorize, signature="(n,k),(m,k)->(n,m)")
def cdist(x, y):
    """Pairwise euclidean distances (reference utils.py:914-924)."""
    d = x[:, None, :] - y[None, :, :]
    return jnp.sqrt(jnp.sum(d * d, axis=-1))


def weighted_hausdorff_distance(prob_map, gt, orig_sizes, p=-9.0,
                                return_2_terms=False):
    """Mean WHD over the batch (reference loss.py:255-342).

    term_1 pulls probability mass toward the GT points; term_2 (a soft-min
    over pixel locations of the probability-weighted distance field) pulls
    some pixel's activation onto each GT point.
    """
    b, h, w = prob_map.shape
    max_dist = float(np.sqrt(h ** 2 + w ** 2))
    # all (row, col) locations, like sklearn cartesian(arange(h), arange(w))
    rows, cols = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    locs = jnp.stack([rows.reshape(-1), cols.reshape(-1)], axis=1).astype(jnp.float32)

    norm = (orig_sizes.astype(jnp.float32)
            / jnp.asarray([h, w], jnp.float32))           # [B, 2]
    locs_n = norm[:, None, :] * locs[None]                # [B, HW, 2]
    gt_n = (norm * gt.astype(jnp.float32))[:, None, :]    # [B, 1, 2]

    d = cdist(locs_n, gt_n)                               # [B, HW, 1]
    pflat = prob_map.reshape(b, -1)                       # [B, HW]

    n_est = jnp.sum(pflat, axis=1)
    term_1 = jnp.sum(pflat * jnp.min(d, axis=2), axis=1) / (n_est + 1e-6)

    weighted = (1.0 - pflat[..., None]) * max_dist + pflat[..., None] * d
    term_2 = jnp.mean(generalized_mean(weighted, p=p, axis=1), axis=-1)

    if return_2_terms:
        return term_1, term_2
    return term_1 + term_2
