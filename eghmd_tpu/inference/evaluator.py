"""Dataset evaluation — parity with the reference test driver.

Counterpart of reference test.py:31-252 (``calc_acc``): per-batch forward,
argmax predictions, per-class IoU, latent- and segmentation-derived center
distances, optional rotated-bbox IoU with on-device refinement. All metric
math runs inside one jitted step (the reference round-trips to sklearn/cv2
per batch); only scalar batch summaries reach the host.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry.ellipse import transform_ellipse, unnorm_mat
from ..geometry.points import unnorm_pts
from ..losses import compute_all_losses, el_pred_from_seg_centers
from ..metrics import seg_iou_metrics, point_metric, ellipse_bbox_iou
from ..ops import refine_ellipse_batch


class Evaluator:
    def __init__(self, model, variables, edge_fn: Optional[Callable] = None,
                 edge_thres: bool = False, bbox_iou: bool = False,
                 refine: bool = False, pupil_only: bool = False):
        """pupil_only mirrors the deepvog path (test.py:66-69, 157-158)."""
        self.model = model
        self.variables = variables
        self.edge_fn = edge_fn
        self.edge_thres = edge_thres
        self.bbox_iou = bbox_iou
        self.refine = refine
        self.pupil_only = pupil_only
        self._step = jax.jit(self._make_step())

    def _make_step(self):
        model = self.model
        edge_fn = self.edge_fn
        edge_thres = self.edge_thres
        bbox_iou = self.bbox_iou
        do_refine = self.refine
        pupil_only = self.pupil_only

        def step(variables, batch):
            edge = batch["edge"] if edge_fn is None else edge_fn(batch["image"])
            if edge_thres:
                edge = jnp.where(edge >= 0.1, jnp.ones_like(edge), edge)
            op, el_out, latent = model.apply(
                variables, batch["image"], edge, train=False
            )
            if pupil_only and op.shape[-1] == 2:
                # DeepVOG emits 2-channel (bg/pupil) logits: pad an
                # unreachable iris channel so the 3-class consumers work
                # (the reference remaps labels instead, test.py:157-158)
                from ..training.trainer import _pad_pupil_only_op

                op = _pad_pupil_only_op(op)
            out = compute_all_losses(
                op, el_out, batch["target"], batch["pupil_center"],
                batch["el_norm"], batch["spat_weights"], batch["dist_map"],
                batch["cond"], 0.0,
            )
            el_pred = el_pred_from_seg_centers(out.pred_c_seg, el_out)
            h, w = op.shape[1], op.shape[2]
            pred = jnp.argmax(op, axis=-1)
            target = batch["target"]
            if pupil_only:
                target = (target == 2).astype(target.dtype)
                pred = (pred == 2).astype(pred.dtype)  # 2-class remap
            mean_iou, per_class, by_sample = seg_iou_metrics(
                target, pred, batch["cond"][:, 1]
            )
            res: Dict[str, Any] = {
                "mean_iou": mean_iou,
                "per_class_iou": per_class,
                "iou_by_sample": by_sample,
                "loss": out.total,
            }
            res["pup_lat_dist"], res["pup_lat_by_sample"] = point_metric(
                batch["pupil_center"], unnorm_pts(el_out[:, 5:7], (h, w), jnp),
                batch["cond"][:, 0])
            res["iri_lat_dist"], res["iri_lat_by_sample"] = point_metric(
                batch["iris_center"], unnorm_pts(el_out[:, 0:2], (h, w), jnp),
                batch["cond"][:, 1])
            res["pup_seg_dist"], res["pup_seg_by_sample"] = point_metric(
                batch["pupil_center"], unnorm_pts(el_pred[:, 5:7], (h, w), jnp),
                batch["cond"][:, 1])
            res["iri_seg_dist"], res["iri_seg_by_sample"] = point_metric(
                batch["iris_center"], unnorm_pts(el_pred[:, 0:2], (h, w), jnp),
                batch["cond"][:, 1])
            # valid flags accompany the by-sample arrays so run() can also
            # aggregate once over ALL samples (see run() docstring)
            res["valid_c0"] = 1.0 - batch["cond"][:, 0].astype(jnp.float32)
            res["valid_c1"] = 1.0 - batch["cond"][:, 1].astype(jnp.float32)

            if bbox_iou:
                hu = unnorm_mat(h, w, jnp, dtype=op.dtype)
                iris_px = transform_ellipse(el_pred[:, :5], hu, jnp)
                pup_px = transform_ellipse(el_pred[:, 5:], hu, jnp)
                iris_gt = transform_ellipse(batch["el_norm"][:, 0], hu, jnp)
                pup_gt = transform_ellipse(batch["el_norm"][:, 1], hu, jnp)
                if do_refine:
                    iris_px = refine_ellipse_batch((pred == 1).astype(jnp.float32), iris_px)
                    pup_px = refine_ellipse_batch((pred == 2).astype(jnp.float32), pup_px)
                res["bbiou_iris"] = jnp.mean(ellipse_bbox_iou(iris_px, iris_gt))
                res["bbiou_pupil"] = jnp.mean(ellipse_bbox_iou(pup_px, pup_gt))
                res["abs_param_iris"] = jnp.mean(jnp.abs(iris_px - iris_gt), axis=0)
                res["abs_param_pupil"] = jnp.mean(jnp.abs(pup_px - pup_gt), axis=0)
            return res

        return step

    def run(self, pipeline, max_batches: Optional[int] = None, log_fn=None):
        """Evaluate over a pipeline; returns the reference's printed metrics.

        Aggregation parity note: the printed metrics reproduce the
        reference's EXACT two-level scheme — per-batch nanmeans over valid
        samples (``getSeg_metrics``/``getPoint_metric``, utils.py:120-162),
        then a nanmean over the per-batch values (``ious.append(iou)`` +
        ``np.nanmean(np.stack(ious), axis=0)`` at test.py:216-221 and
        ``np.nanmean(dists_*)`` at test.py:235-238). With ragged cond
        patterns this mean-of-batch-means differs from a single mean over
        all samples; both are reported — ``mean_iou``/``*_dist`` carry the
        reference-printout semantics (verified against the torch oracle in
        tests/test_inference.py), and ``*_per_sample`` keys carry the
        once-over-all-samples aggregation from the accumulated per-sample
        arrays.
        """
        agg = []
        for i, batch in enumerate(pipeline):
            if max_batches is not None and i >= max_batches:
                break
            agg.append(self._step(self.variables, batch))
        agg = jax.device_get(agg)

        def nm(key):
            return float(np.nanmean([np.asarray(m[key]) for m in agg]))

        def cat(key):
            return np.concatenate([np.asarray(m[key]) for m in agg], axis=0)

        def ps_dist(key, flagkey):
            # one mean over ALL valid samples (by-sample arrays are already
            # flag-multiplied, so a plain sum/sum is exact)
            d, f = cat(key), cat(flagkey)
            tot = f.sum()
            return float(d.sum() / tot) if tot > 0 else float("nan")

        per_class = np.nanmean(np.stack([np.asarray(m["per_class_iou"]) for m in agg]), 0)
        iou_by_sample = cat("iou_by_sample")
        per_class_ps = np.nanmean(iou_by_sample, axis=0)
        out = {
            "ious": per_class,
            "mean_iou": float(np.mean(per_class)),
            "pup_lat_dist": nm("pup_lat_dist"),
            "iri_lat_dist": nm("iri_lat_dist"),
            "pup_seg_dist": nm("pup_seg_dist"),
            "iri_seg_dist": nm("iri_seg_dist"),
            "loss": nm("loss"),
            "iou_by_sample": iou_by_sample,
            # single-pass per-sample aggregation (see docstring)
            "ious_per_sample": per_class_ps,
            "mean_iou_per_sample": float(np.nanmean(per_class_ps)),
            "pup_lat_dist_per_sample": ps_dist("pup_lat_by_sample", "valid_c0"),
            "iri_lat_dist_per_sample": ps_dist("iri_lat_by_sample", "valid_c1"),
            "pup_seg_dist_per_sample": ps_dist("pup_seg_by_sample", "valid_c1"),
            "iri_seg_dist_per_sample": ps_dist("iri_seg_by_sample", "valid_c1"),
        }
        if self.bbox_iou:
            out["bbiou_iris"] = nm("bbiou_iris")
            out["bbiou_pupil"] = nm("bbiou_pupil")
            for k in ("abs_param_iris", "abs_param_pupil"):
                v = np.nanmean(np.stack([np.asarray(m[k]) for m in agg]), 0)
                v[4] *= 180.0 / np.pi  # degrees, like the reference printout
                out[k] = v
        if log_fn:
            log_fn(f"mIoU: {out['mean_iou']}. IoUs: {out['ious']}")
            log_fn(f"Latent space PUPIL dist. Mean: {out['pup_lat_dist']}")
            log_fn(f"Segmentation PUPIL dist. Mean: {out['pup_seg_dist']}")
            log_fn(f"Latent space IRIS dist. Mean: {out['iri_lat_dist']}")
            log_fn(f"Segmentation IRIS dist. Mean: {out['iri_seg_dist']}")
        return out
