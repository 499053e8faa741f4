"""Metric parity: device metrics vs sklearn / reference cv2 implementations."""

import numpy as np
import jax.numpy as jnp
import pytest

from eghmd_tpu.metrics import (
    seg_iou_metrics,
    point_metric,
    angle_metric,
    ellipse_mask_iou,
    ellipse_bbox_iou,
    rasterize_ellipse,
)

from reference_oracle import import_reference

RNG = np.random.RandomState(11)


class TestSegIoU:
    def _compare(self, y_true, y_pred, cond):
        utils = import_reference("utils")
        ref_mean, ref_pc, ref_scores = utils.getSeg_metrics(y_true, y_pred, cond)
        mean, pc, scores = seg_iou_metrics(
            jnp.asarray(y_true), jnp.asarray(y_pred), jnp.asarray(cond.astype(np.float32))
        )
        np.testing.assert_allclose(np.asarray(scores), ref_scores, rtol=1e-5, equal_nan=True)
        np.testing.assert_allclose(np.asarray(pc), ref_pc, rtol=1e-5, equal_nan=True)
        np.testing.assert_allclose(float(mean), ref_mean, rtol=1e-5, equal_nan=True)

    def test_all_classes_present(self):
        y_true = RNG.randint(0, 3, (6, 24, 32))
        y_pred = RNG.randint(0, 3, (6, 24, 32))
        self._compare(y_true, y_pred, np.zeros(6, bool))

    def test_absent_class_and_missing_masks(self):
        y_true = RNG.randint(0, 2, (6, 24, 32))  # class 2 absent everywhere
        y_pred = RNG.randint(0, 3, (6, 24, 32))
        cond = np.array([0, 0, 1, 0, 1, 0], bool)
        self._compare(y_true, y_pred, cond)

    def test_all_missing(self):
        y_true = RNG.randint(0, 3, (4, 16, 16))
        y_pred = RNG.randint(0, 3, (4, 16, 16))
        self._compare(y_true, y_pred, np.ones(4, bool))


class TestRaggedAggregation:
    """The evaluator's cross-batch aggregation must match the reference's
    printout scheme EXACTLY under ragged cond patterns.

    The reference accumulates per-batch nanmeans and nanmeans them once more
    (ious.append(iou) + np.nanmean(np.stack(ious), 0) at test.py:216-221;
    np.nanmean(dists_*) at test.py:235-238) — i.e. the printed numbers ARE
    mean-of-batch-means. This fixture makes the distinction observable: with
    batches of different valid-sample counts (including a fully-missing
    batch and an absent class), mean-of-batch-means != mean-over-all-samples.
    """

    def _fixture(self):
        rng = np.random.RandomState(23)
        batches = []
        # batch 0: all valid, all classes present
        batches.append((rng.randint(0, 3, (4, 16, 16)),
                        rng.randint(0, 3, (4, 16, 16)),
                        np.zeros(4, bool)))
        # batch 1: one valid sample only, class 2 absent from GT
        batches.append((rng.randint(0, 2, (4, 16, 16)),
                        rng.randint(0, 3, (4, 16, 16)),
                        np.array([1, 1, 1, 0], bool)))
        # batch 2: every mask annotation missing (NaN per-batch entry)
        batches.append((rng.randint(0, 3, (4, 16, 16)),
                        rng.randint(0, 3, (4, 16, 16)),
                        np.ones(4, bool)))
        return batches

    def test_matches_reference_printout(self):
        utils = import_reference("utils")
        batches = self._fixture()

        # reference aggregation: per-batch perClassIOU, nanmean over batches
        ref_ious = [utils.getSeg_metrics(t, p, c)[1] for t, p, c in batches]
        ref_pc = np.nanmean(np.stack(ref_ious, 0), axis=0)
        ref_miou = np.mean(ref_pc)

        # our aggregation, exactly as Evaluator.run does it
        ours = [seg_iou_metrics(jnp.asarray(t), jnp.asarray(p),
                                jnp.asarray(c.astype(np.float32)))
                for t, p, c in batches]
        our_pc = np.nanmean(np.stack([np.asarray(o[1]) for o in ours]), 0)
        our_miou = float(np.mean(our_pc))
        np.testing.assert_allclose(our_pc, ref_pc, rtol=1e-5, equal_nan=True)
        np.testing.assert_allclose(our_miou, ref_miou, rtol=1e-5)

        # the per-sample alternative aggregation demonstrably differs on
        # this ragged fixture — so matching the printout is a real constraint
        by_sample = np.concatenate([np.asarray(o[2]) for o in ours], 0)
        ps_pc = np.nanmean(by_sample, axis=0)
        assert not np.allclose(np.nanmean(ps_pc), our_miou, rtol=1e-3)

    def test_distance_aggregation_matches_reference(self):
        utils = import_reference("utils")
        rng = np.random.RandomState(5)
        ref_batch_means, our_batch_means = [], []
        dists_all, flags_all = [], []
        conds = [np.array([0, 1, 0, 0], bool), np.array([1, 1, 1, 1], bool),
                 np.array([0, 1, 1, 1], bool)]
        for cond in conds:
            y_true = rng.uniform(0, 200, (4, 2))
            y_pred = rng.uniform(-1, 1, (4, 2))
            rm, _ = utils.getPoint_metric(y_true.copy(), y_pred.copy(), cond,
                                          (240, 320), True)
            m, d = point_metric(jnp.asarray(y_true), jnp.asarray(y_pred),
                                jnp.asarray(cond.astype(np.float32)),
                                (240, 320), True)
            ref_batch_means.append(rm)
            our_batch_means.append(float(m))
            dists_all.append(np.asarray(d))
            flags_all.append(1.0 - cond.astype(np.float64))
        # printed value: nanmean over per-batch means (test.py:235-238)
        np.testing.assert_allclose(np.nanmean(our_batch_means),
                                   np.nanmean(ref_batch_means), rtol=1e-5)
        # and it differs from the single pass over all samples here
        d, f = np.concatenate(dists_all), np.concatenate(flags_all)
        assert not np.allclose(d.sum() / f.sum(),
                               np.nanmean(ref_batch_means), rtol=1e-3)


class TestDistances:
    def test_point_metric_parity(self):
        utils = import_reference("utils")
        y_true = RNG.uniform(0, 200, (8, 2))
        y_pred_norm = RNG.uniform(-1, 1, (8, 2))
        cond = np.array([0, 1, 0, 0, 1, 0, 0, 0], bool)
        ref_mean, ref_dist = utils.getPoint_metric(
            y_true.copy(), y_pred_norm.copy(), cond, (240, 320), True
        )
        mean, dist = point_metric(
            jnp.asarray(y_true), jnp.asarray(y_pred_norm),
            jnp.asarray(cond.astype(np.float32)), (240, 320), True,
        )
        np.testing.assert_allclose(float(mean), ref_mean, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(dist), ref_dist, rtol=1e-5, atol=1e-6)

    def test_angle_metric_parity(self):
        utils = import_reference("utils")
        a = RNG.uniform(-1.5, 1.5, 8)
        b = RNG.uniform(-1.5, 1.5, 8)
        cond = np.array([0, 0, 1, 0, 0, 0, 1, 0], bool)
        ref_mean, ref_dist = utils.getAng_metric(a, b, cond)
        mean, dist = angle_metric(jnp.asarray(a), jnp.asarray(b),
                                  jnp.asarray(cond.astype(np.float32)))
        np.testing.assert_allclose(float(mean), ref_mean, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(dist), ref_dist, rtol=1e-5, atol=1e-6)


class TestRaster:
    def test_ellipse_mask_iou_self(self):
        """An ellipse raster vs itself must give IoU 1."""
        p = jnp.asarray([0.1, -0.2, 0.4, 0.3, 0.5])
        seg = rasterize_ellipse(p, 240, 320)
        iou = ellipse_mask_iou(seg, p)
        assert float(iou) == 1.0

    def test_ellipse_mask_iou_parity(self):
        """Against the reference calc_ell_iou numpy/cuda implementation."""
        utils = import_reference("utils")
        import torch

        # patch the .cuda() call inside calc_ell_iou via the oracle patch
        seg_p = jnp.asarray([0.1, -0.15, 0.45, 0.3, 0.4])
        seg = np.asarray(rasterize_ellipse(seg_p, 240, 320))
        mesh = utils.create_meshgrid(240, 320, normalized_coordinates=True).numpy()
        for q in ([0.1, -0.15, 0.45, 0.3, 0.4], [0.0, 0.0, 0.5, 0.35, -0.3]):
            ref = utils.calc_ell_iou(torch.from_numpy(seg.copy()), np.array(q, np.float64),
                                     mesh, nor=True)
            ours = float(ellipse_mask_iou(jnp.asarray(seg), jnp.asarray(q)))
            np.testing.assert_allclose(ours, ref, atol=2e-3)

    def test_bbox_iou_parity(self):
        ref_box = import_reference("calc_box_iou")
        for _ in range(10):
            e1 = np.array([RNG.uniform(100, 220), RNG.uniform(80, 160),
                           RNG.uniform(20, 60), RNG.uniform(20, 60),
                           RNG.uniform(-1.2, 1.2)])
            e2 = e1 + np.array([RNG.uniform(-15, 15), RNG.uniform(-15, 15),
                                RNG.uniform(-8, 8), RNG.uniform(-8, 8),
                                RNG.uniform(-0.3, 0.3)])
            ref = ref_box.calc_ell_bbox_iou(e1, e2)
            ours = float(ellipse_bbox_iou(jnp.asarray(e1), jnp.asarray(e2)))
            assert abs(ours - ref) < 0.02, (e1, e2, ref, ours)

    def test_identical_boxes(self):
        e = jnp.asarray([160.0, 120.0, 40.0, 25.0, 0.7])
        assert float(ellipse_bbox_iou(e, e)) == 1.0
