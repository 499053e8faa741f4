"""Segmentation IoU metrics — on-device, sklearn-parity.

Replaces the reference's per-sample sklearn ``jaccard_score`` loop
(reference utils.py:120-150) with a confusion-matrix formulation that runs
inside jit on TPU (the reference round-trips GPU->CPU->sklearn every batch,
flagged as an inefficiency in SURVEY §3.1). NaN conventions are preserved
exactly: classes absent from a sample's ground truth contribute NaN; samples
whose mask annotation is missing are dropped; per-class scores are
NaN-averaged over samples and the mean IoU is the NaN-mean of those.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nan_mean(x, mask, axis=None):
    """mean of x over elements where mask, NaN if mask empty (np.nanmean parity)."""
    num = jnp.sum(jnp.where(mask, x, 0.0), axis=axis)
    cnt = jnp.sum(mask, axis=axis)
    return jnp.where(cnt > 0, num / jnp.maximum(cnt, 1), jnp.nan)


def seg_iou_metrics(y_true, y_pred, cond_missing, num_classes=3):
    """Per-class / mean IoU with sklearn-jaccard + nanmean semantics.

    y_true, y_pred: [B, H, W] int labels; cond_missing: [B] (1 = mask absent,
    reference cond[:, 1] convention).

    Returns (mean_iou, per_class_iou [C], score_list [B, C]) where score_list
    contains NaN for classes absent from a sample's GT (matching reference
    utils.py:133-145) and per-sample rows for missing-annotation samples are
    still populated but excluded from the averages.
    """
    c = num_classes
    b = y_true.shape[0]
    t = y_true.reshape(b, -1)
    p = y_pred.reshape(b, -1)
    # confusion counts per sample: conf[b, i, j] = #{t==i and p==j}
    t1 = jax.nn.one_hot(t, c, dtype=jnp.float32)  # [B, N, C]
    p1 = jax.nn.one_hot(p, c, dtype=jnp.float32)
    conf = jnp.einsum("bni,bnj->bij", t1, p1)
    diag = jnp.diagonal(conf, axis1=-2, axis2=-1)          # [B, C]
    row = jnp.sum(conf, axis=-1)                            # GT counts
    col = jnp.sum(conf, axis=-2)                            # pred counts
    union = row + col - diag
    valid = (cond_missing.astype(jnp.float32) == 0)[:, None]  # [B, 1]
    present = row > 0                                       # labels in GT only
    # score rows for missing-annotation samples stay NaN (reference
    # utils.py:135-137 only fills scores when cond is False)
    iou = jnp.where(present & valid, diag / jnp.maximum(union, 1.0), jnp.nan)

    keep = valid & present
    per_class = nan_mean(jnp.nan_to_num(iou), keep, axis=0)   # [C]
    mean_iou = nan_mean(jnp.nan_to_num(per_class), ~jnp.isnan(per_class))
    return mean_iou, per_class, iou
