"""Dataset-extraction (L0) tests: boundary points, RANSAC fits, rasterization."""

import numpy as np
import pytest

from eghmd_tpu.data.extraction import (
    get_valid_points,
    ransac_ellipse,
    fit_mask_ellipses,
    rasterize_noskin_mask,
    parse_teyed_annotation_line,
    normalize_angle_deg,
    quantize_mask_kmeans,
)
from eghmd_tpu.data.synthetic import render_eye
from eghmd_tpu.geometry import fit_error


class TestBoundaryAndFit:
    def test_fit_recovers_synthetic_ellipses(self):
        rng = np.random.RandomState(0)
        img, mask, iris_p, pupil_p, _ = render_eye(rng, 240, 320)
        iris_fit, pupil_fit = fit_mask_ellipses(mask)
        assert not np.all(pupil_fit == -1)
        assert not np.all(iris_fit == -1)
        # centers within 2 px, axes within 2 px of GT
        np.testing.assert_allclose(pupil_fit[:2], pupil_p[:2], atol=2.0)
        np.testing.assert_allclose(sorted(pupil_fit[2:4]), sorted(pupil_p[2:4]), atol=2.0)
        np.testing.assert_allclose(iris_fit[:2], iris_p[:2], atol=3.0)

    def test_ransac_rejects_outliers(self):
        rng = np.random.RandomState(1)
        t = np.linspace(0, 2 * np.pi, 60, endpoint=False)
        true = np.array([160.0, 120.0, 50.0, 35.0, 0.4])
        x = true[2] * np.cos(t)
        y = true[3] * np.sin(t)
        pts = np.stack([
            np.cos(true[4]) * x - np.sin(true[4]) * y + true[0],
            np.sin(true[4]) * x + np.cos(true[4]) * y + true[1],
        ], 1)
        outliers = rng.uniform(0, 320, (15, 2))
        noisy = np.concatenate([pts, outliers])
        param, err = ransac_ellipse(noisy, rng=rng)
        inlier_err = np.mean(np.asarray(fit_error(pts[None], param[None], np)))
        assert inlier_err < 0.05, (param, inlier_err)

    def test_get_valid_points_classes(self):
        rng = np.random.RandomState(2)
        _, mask, *_ = render_eye(rng, 120, 160)
        pup, iri = get_valid_points(mask)
        assert len(pup) > 10 and len(iri) > 10
        # pupil boundary pixels are adjacent to the pupil region
        for x, y in pup[:20].astype(int):
            nb = mask[max(y - 2, 0): y + 3, max(x - 2, 0): x + 3]
            assert np.any(nb == 3)


class TestRasterizeAndParse:
    def test_rasterize_round_trip(self):
        iris = np.array([160.0, 120.0, 60.0, 45.0, 0.3])
        pupil = np.array([160.0, 120.0, 20.0, 16.0, -0.2])
        mask = rasterize_noskin_mask((240, 320), iris, pupil)
        assert set(np.unique(mask)) == {0, 2, 3}
        i2, p2 = fit_mask_ellipses(mask)
        np.testing.assert_allclose(p2[:2], pupil[:2], atol=1.5)

    def test_parse_teyed_line(self):
        frame, vals = parse_teyed_annotation_line("12;1.5;2.5;3.0;4.0;")
        assert frame == 12
        assert vals.shape == (2, 2)

    def test_normalize_angle(self):
        assert abs(normalize_angle_deg(135.0) - np.deg2rad(-45.0)) < 1e-9
        assert abs(normalize_angle_deg(30.0) - np.deg2rad(30.0)) < 1e-9

    def test_kmeans_quantize(self):
        rng = np.random.RandomState(0)
        img, mask, *_ = render_eye(rng, 120, 160)
        q = quantize_mask_kmeans(img.astype(np.float64))
        assert q.shape == mask.shape
        assert set(np.unique(q)) <= {0, 1, 2, 3}
        # pupil (darkest) must map to the highest label on pupil pixels
        pup_label = np.bincount(q[mask == 3].reshape(-1), minlength=4).argmax()
        assert pup_label == 3
