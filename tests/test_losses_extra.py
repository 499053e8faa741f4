"""Parity tests for the reference's defined-but-driver-unused losses and the
remaining my_ellipse extras (completing loss.py:159-342 and
helperfunctions.py:138-207 coverage).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from eghmd_tpu.geometry.ellipse import (
    fit_error,
    generate_points_equislope,
    generate_points_random,
    verify_ellipse,
)
from eghmd_tpu.losses import (
    generalized_mean,
    seg_to_el_loss,
    weighted_hausdorff_distance,
)

from reference_oracle import import_reference

torch = pytest.importorskip("torch")


class TestSegToElLoss:
    def _inputs(self, b=4):
        rng = np.random.RandomState(0)
        op_seg = 1.0 / (1.0 + np.exp(-rng.randn(b, 24, 32))).astype(np.float32)
        el = np.stack([
            rng.uniform(-0.2, 0.2, b), rng.uniform(-0.2, 0.2, b),
            rng.uniform(0.3, 0.6, b), rng.uniform(0.2, 0.5, b),
            rng.uniform(-0.5, 0.5, b),
        ], axis=1).astype(np.float32)
        ok = np.array([1.0, 0.0, 1.0, 1.0], np.float32)[:b]
        return op_seg, el, ok

    def test_matches_reference(self):
        ref = import_reference("loss")
        op_seg, el, ok = self._inputs()
        expected = ref.get_seg2elLoss(
            torch.from_numpy(op_seg), torch.from_numpy(el),
            torch.from_numpy(ok)).item()
        ours = float(seg_to_el_loss(jnp.asarray(op_seg), jnp.asarray(el),
                                    jnp.asarray(ok)))
        # fp32 reduction-order noise is amplified by the -100 log clamps
        np.testing.assert_allclose(ours, expected, rtol=5e-4)

    def test_zero_when_no_valid(self):
        op_seg, el, _ = self._inputs()
        out = seg_to_el_loss(jnp.asarray(op_seg), jnp.asarray(el),
                             jnp.zeros(4))
        assert float(out) == 0.0


class TestWeightedHausdorff:
    def test_matches_reference(self):
        ref = import_reference("loss")
        rng = np.random.RandomState(1)
        b, h, w = 3, 16, 24
        prob = rng.rand(b, h, w).astype(np.float32)
        gt = np.stack([rng.uniform(2, h - 2, b), rng.uniform(2, w - 2, b)],
                      axis=1).astype(np.float32)
        sizes = np.tile([[h, w]], (b, 1)).astype(np.float32)

        whd = ref.WeightedHausdorffDistance(h, w, p=-9)
        expected = whd(torch.from_numpy(prob), torch.from_numpy(gt),
                       torch.from_numpy(sizes)).numpy()
        ours = np.asarray(weighted_hausdorff_distance(
            jnp.asarray(prob), jnp.asarray(gt), jnp.asarray(sizes), p=-9.0))
        np.testing.assert_allclose(ours, expected, rtol=1e-3, atol=1e-4)

    def test_two_terms_and_scaling(self):
        rng = np.random.RandomState(2)
        prob = rng.rand(2, 12, 12).astype(np.float32)
        gt = np.array([[6.0, 6.0], [3.0, 9.0]], np.float32)
        sizes = np.array([[12, 12], [24, 24]], np.float32)
        t1, t2 = weighted_hausdorff_distance(
            jnp.asarray(prob), jnp.asarray(gt), jnp.asarray(sizes),
            return_2_terms=True)
        total = weighted_hausdorff_distance(
            jnp.asarray(prob), jnp.asarray(gt), jnp.asarray(sizes))
        np.testing.assert_allclose(np.asarray(t1 + t2), np.asarray(total),
                                   rtol=1e-6)
        assert np.all(np.asarray(t1) >= 0) and np.all(np.asarray(t2) >= 0)

    def test_generalized_mean_approaches_min(self):
        x = jnp.asarray([3.0, 1.0, 2.0])
        gm = float(generalized_mean(x, p=-40.0, axis=0))
        assert abs(gm - 1.0) < 0.05


class TestMyEllipseExtras:
    PARAMS = [
        np.array([100.0, 120.0, 40.0, 25.0, 0.3]),
        np.array([-5.0, 8.0, 3.0, 2.0, -1.0]),
    ]

    def test_equislope_matches_reference(self):
        hf = import_reference("helperfunctions")
        for p in self.PARAMS:
            x_ref, y_ref = hf.my_ellipse(p).generatePoints(8, "equiSlope")
            ours = np.asarray(generate_points_equislope(p, np))
            np.testing.assert_allclose(ours[:, 0], x_ref, rtol=1e-6)
            np.testing.assert_allclose(ours[:, 1], y_ref, rtol=1e-6)

    def test_equislope_points_on_negated_angle_ellipse(self):
        # the reference's equiSlope formula treats theta as CLOCKWISE (a
        # reference convention quirk) — its points lie exactly on the
        # ellipse with negated angle
        for p in self.PARAMS:
            pts = np.asarray(generate_points_equislope(p, np))
            p_neg = p.copy()
            p_neg[4] = -p_neg[4]
            res = np.asarray(fit_error(pts[None], p_neg[None], np))
            np.testing.assert_allclose(res, 0.0, atol=1e-6)

    def test_random_points_on_ellipse(self):
        rng = np.random.RandomState(3)
        for p in self.PARAMS:
            pts = np.asarray(generate_points_random(p, 50, rng=rng, xp=np))
            assert pts.shape == (50, 2)
            res = np.asarray(fit_error(pts[None], p[None], np))
            np.testing.assert_allclose(res, 0.0, atol=1e-6)

    def test_verify_matches_reference(self):
        hf = import_reference("helperfunctions")
        rng = np.random.RandomState(4)
        p = self.PARAMS[0]
        pts = rng.uniform(50, 180, (20, 2))
        expected = hf.my_ellipse(p).verify(pts)
        ours = float(verify_ellipse(p, pts, np))
        np.testing.assert_allclose(ours, expected, rtol=1e-6)

    def test_verify_empty_is_inf(self):
        assert np.isinf(float(verify_ellipse(self.PARAMS[0],
                                             np.zeros((0, 2)), np)))


class TestRITnetNoReg:
    def test_forward_and_adain_guard(self):
        import jax

        from eghmd_tpu.config import VARIANT_PRESETS
        from eghmd_tpu.models import RITnetNoReg, build_model

        model = build_model("ritnet_noreg", VARIANT_PRESETS["baseline_edge"])
        assert isinstance(model, RITnetNoReg)
        rng = jax.random.PRNGKey(0)
        x = jnp.zeros((1, 176, 192, 1))
        variables = jax.jit(lambda r, a, b: model.init(r, a, b, train=False))(rng, x, x)
        op, el_out, latent = jax.jit(lambda v: model.apply(v, x, x, train=False))(variables)
        assert op.shape == (1, 176, 192, 3)
        assert el_out.shape == (1, 10)
        assert latent.shape == (1, 153)

        bad = RITnetNoReg(setting=VARIANT_PRESETS["baseline_adain"])
        with pytest.raises(AssertionError, match="AdaIN"):
            bad.init(rng, x, x, train=False)
