"""Point / ellipse-parameter losses and soft-argmax center extraction.

Replaces the reference's per-sample loops (loss.py:71-84, 187-206) with
masked vectorized math; the soft-argmax center-of-mass extraction
(loss.py:16-46) is a single fused softmax-weighted reduction, fusable by XLA
into the surrounding computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.points import create_meshgrid, soft_heaviside


def _safe_div(num, den):
    return jnp.where(den > 0, num / jnp.maximum(den, 1e-20), jnp.zeros_like(num))


def seg_to_pt_loss(op_channel, gt_pts, temperature=4.0):
    """Soft-argmax center-of-mass + L1 to GT points.

    Reference loss.py:16-46 (``get_seg2ptLoss``): softmax over the flattened
    H*W map (x temperature), expectation over the normalized [-1, 1] meshgrid.
    op_channel: [B, H, W] single-class logits; gt_pts: [B, 2] normalized.
    Returns (loss [B, 2] elementwise L1, pred_pts [B, 2]).
    """
    b, h, w = op_channel.shape
    wt = jax.nn.softmax(op_channel.reshape(b, -1) * temperature, axis=-1)
    grid = create_meshgrid(h, w, True, jnp, dtype=op_channel.dtype)  # [H, W, 2]
    xloc = grid[..., 0].reshape(-1)
    yloc = grid[..., 1].reshape(-1)
    xpos = jnp.sum(wt * xloc, axis=-1)
    ypos = jnp.sum(wt * yloc, axis=-1)
    pred = jnp.stack([xpos, ypos], axis=-1)
    return jnp.abs(pred - gt_pts), pred


def pt_loss(pred, target, mask_valid):
    """Masked mean-L1 over valid samples (reference loss.py:71-84).

    Per valid sample: mean |pred - target| over elements; summed over valid
    samples / #valid; 0 if none.
    pred, target: [B, D]; mask_valid: [B] float.
    """
    per_sample = jnp.mean(jnp.abs(pred - target), axis=-1)
    return _safe_div(jnp.sum(per_sample * mask_valid), jnp.sum(mask_valid))


def conf_loss(logits, ds_id, confusion=True):
    """Dataset-disentanglement loss (reference loss.py:139-157).

    confusion=True: L1 between softmax(logits) and the uniform distribution
    (drives the latent to hide dataset identity). confusion=False: plain CE
    used to train the classifier head itself.
    """
    if confusion:
        b, c = logits.shape
        return jnp.mean(jnp.abs(jax.nn.softmax(logits, axis=-1) - 1.0 / c))
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, ds_id[:, None], axis=-1))


def ellipse_soft_masks(el_param, h, w, sc=64.0):
    """Soft inside/outside masks of an ellipse over the normalized grid.

    Reference loss.py:208-219 (``get_mask``): returns (posmask, negmask) where
    posmask ~ 1 outside the ellipse and negmask ~ 1 inside, via a scaled
    sigmoid of the algebraic residual.
    el_param: [B, 5] normalized params -> ([B, H, W], [B, H, W]).
    """
    grid = create_meshgrid(h, w, True, jnp, dtype=el_param.dtype)
    mx, my = grid[..., 0], grid[..., 1]
    cx, cy, a, b, th = (el_param[:, i, None, None] for i in range(5))
    x = (mx - cx) * jnp.cos(th) + (my - cy) * jnp.sin(th)
    y = -(mx - cx) * jnp.sin(th) + (my - cy) * jnp.cos(th)
    r = (x / a) ** 2 + (y / b) ** 2 - 1.0
    return soft_heaviside(r, sc, 3, jnp), soft_heaviside(-r, sc, 3, jnp)


def _kl_div_term(log_p, target):
    """torch F.kl_div semantics: target * (log(target) - log_p), 0 where target==0."""
    safe_t = jnp.maximum(target, 1e-38)
    return jnp.where(target > 0, target * (jnp.log(safe_t) - log_p), 0.0)


def self_consistency_loss(op, el_pred, mask_valid):
    """KL self-consistency between seg maps and predicted ellipses.

    Reference loss.py:187-206 (``get_selfConsistency``): for valid samples,
    KL(log_softmax(op)[pupil] || soft inside-mask of pupil ellipse) +
    KL(log_softmax(op)[bg] || soft outside-mask of iris ellipse), averaged.
    op: [B, H, W, 3] logits; el_pred: [B, 10] (iris 5 | pupil 5 normalized).
    """
    b, h, w, _ = op.shape
    logp = jax.nn.log_softmax(op, axis=-1)
    iris, pupil = el_pred[:, :5], el_pred[:, 5:]
    _, pup_inside = ellipse_soft_masks(pupil, h, w)
    iri_outside, _ = ellipse_soft_masks(iris, h, w)
    term_p = jnp.mean(_kl_div_term(logp[..., 2], pup_inside), axis=(1, 2))
    term_b = jnp.mean(_kl_div_term(logp[..., 0], iri_outside), axis=(1, 2))
    per_sample = term_p + term_b
    return _safe_div(jnp.sum(per_sample * mask_valid), jnp.sum(mask_valid))


def _bce(pred, target):
    """torch F.binary_cross_entropy (mean reduction) semantics: log terms
    clamped at -100 (so exact 0/1 predictions stay finite)."""
    logp = jnp.maximum(jnp.log(pred), -100.0)
    log1mp = jnp.maximum(jnp.log1p(-pred), -100.0)
    return -jnp.mean(target * logp + (1.0 - target) * log1mp, axis=(-2, -1))


def seg_to_el_loss(op_seg, el_param, mask_valid):
    """Seg<->regressed-ellipse overlap correction loss.

    Reference loss.py:159-185 (``get_seg2elLoss``): per valid sample, BCE
    between the soft outside-mask of the regressed ellipse and (1 - seg
    probability) plus BCE between the soft inside-mask and the seg
    probability; summed over valid samples / #valid (0 if none). The
    reference's per-sample python loop is one masked vectorized pass here.

    op_seg: [B, H, W] class probability in [0, 1]; el_param: [B, 5]
    normalized ellipse; mask_valid: [B] float (1 = seg annotation present).
    """
    b, h, w = op_seg.shape
    op_seg = op_seg.astype(jnp.float32)
    pos, neg = ellipse_soft_masks(el_param.astype(jnp.float32), h, w)
    per_sample = _bce(pos, 1.0 - op_seg) + _bce(neg, op_seg)
    return _safe_div(jnp.sum(per_sample * mask_valid), jnp.sum(mask_valid))
