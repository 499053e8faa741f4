"""Total training loss — the reference's ``get_allLoss`` as a pure function.

Reference models/RITnet_v2.py:372-432, with the data-dependent python
branches (``if torch.sum(loc_onlyMask)``, reference :392-408) replaced by
branch-free ``where`` selections of identical semantics so the whole thing
jits. Loss weights match reference :430:

    total = l_seg2pt + 20 * l_seg + 10 * (l_pt + l_ellipse)

Layouts (NHWC): op [B,H,W,3] logits; el_out [B,10] (iris 5 | pupil 5);
target [B,H,W] int; pupil_center [B,2] px; el_norm [B,2,5] (iris first);
spat_weights [B,H,W]; dist_map [B,H,W,3]; cond [B,4] float, 1 = MISSING
(reference CurriculumLib.py:189-193 convention).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.points import norm_pts
from .point import pt_loss, seg_to_pt_loss, conf_loss, self_consistency_loss
from .seg import seg_loss


class LossOutputs(NamedTuple):
    total: jnp.ndarray          # scalar
    pred_c_seg: jnp.ndarray     # [B, 2, 2] soft-argmax centers (iris, pupil)
    l_seg2pt: jnp.ndarray
    l_seg: jnp.ndarray
    l_pt: jnp.ndarray
    l_ellipse: jnp.ndarray


def compute_all_losses(op, el_out, target, pupil_center, el_norm,
                       spat_weights, dist_map, cond, alpha):
    b, h, w, _ = op.shape
    dtype = op.dtype
    mask_valid = (1.0 - cond[:, 1]).astype(dtype)  # GT mask present
    any_mask = jnp.sum(mask_valid) > 0

    # Pupil center from soft-argmax of the pupil channel (always, unmasked —
    # reference :387-401 takes the plain mean over the batch)
    pup_gt = norm_pts(pupil_center, (h, w), jnp).astype(dtype)
    l_pup_el, pred_c_pup = seg_to_pt_loss(op[..., 2], pup_gt, temperature=4.0)
    l_seg2pt_pup = jnp.mean(l_pup_el)

    # Iris center from soft-argmax of the negated background channel, masked
    # by mask presence; when NO sample in the batch has a mask the reference
    # (:403-408) zeroes the loss and substitutes the regressed center.
    iri_gt = el_norm[:, 0, :2].astype(dtype)
    l_iri_el, pred_c_iri_seg = seg_to_pt_loss(-op[..., 0], iri_gt, temperature=4.0)
    temp = jnp.stack([mask_valid, mask_valid], axis=1)
    denom = jnp.sum(temp)
    l_seg2pt_iri = jnp.where(
        any_mask, jnp.sum(l_iri_el * temp) / jnp.maximum(denom, 1e-20), 0.0
    )
    pred_c_iri = jnp.where(any_mask, pred_c_iri_seg, el_out[:, 5:7])

    pred_c_seg = jnp.stack([pred_c_iri, pred_c_pup], axis=1)  # iris-first
    l_seg2pt = 0.5 * l_seg2pt_pup + 0.5 * l_seg2pt_iri

    # Segmentation loss over valid-mask samples
    l_seg = seg_loss(op, target, spat_weights, dist_map, mask_valid, alpha)

    # Pupil-center regression loss — ONLY for samples WITHOUT masks
    # (reference :424-425)
    l_pt = pt_loss(el_out[:, 5:7], pup_gt, 1.0 - mask_valid)

    # Full 10-param ellipse loss for samples WITH masks (reference :428)
    l_ellipse = pt_loss(el_out, el_norm.reshape(b, 10).astype(dtype), mask_valid)

    total = l_seg2pt + 20.0 * l_seg + 10.0 * (l_pt + l_ellipse)
    return LossOutputs(total, pred_c_seg, l_seg2pt, l_seg, l_pt, l_ellipse)


def el_pred_from_seg_centers(pred_c_seg, el_out):
    """Fuse seg-derived centers with regressed axes/angles.

    Reference models/RITnet_v2.py:334-335: elPred = [seg iris center,
    regressed iris (a,b,theta), seg pupil center, regressed pupil (a,b,theta)].
    """
    return jnp.concatenate(
        [pred_c_seg[:, 0, :], el_out[:, 2:5], pred_c_seg[:, 1, :], el_out[:, 7:10]],
        axis=1,
    )


def full_training_loss(op, el_out, latent_ds_logits, batch, alpha,
                       self_corr=False, disentangle=False,
                       disentangle_alpha=2.0):
    """Total loss incl. optional selfCorr / disentanglement terms.

    Mirrors the tail of the reference forward (models/RITnet_v2.py:339-353):
    ``+ 10 * selfConsistency`` and ``+ 2 * conf_loss`` (the reference's
    secondary classifier phase is never activated by its train driver; we
    train the ds head with a separate optimizer instead — see training/).
    """
    out = compute_all_losses(
        op, el_out, batch["target"], batch["pupil_center"], batch["el_norm"],
        batch["spat_weights"], batch["dist_map"], batch["cond"], alpha,
    )
    loss = out.total
    el_pred = el_pred_from_seg_centers(out.pred_c_seg, el_out)
    if self_corr:
        mask_valid = (1.0 - batch["cond"][:, 1]).astype(op.dtype)
        loss = loss + 10.0 * self_consistency_loss(op, el_pred, mask_valid)
    if disentangle:
        loss = loss + disentangle_alpha * conf_loss(latent_ds_logits, batch["ds_id"], True)
    return loss, (out, el_pred)
