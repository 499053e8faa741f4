"""Geometry core tests: closed-form oracles + parity vs the numpy reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from eghmd_tpu.geometry import (
    param_to_conic,
    conic_to_param,
    transform_ellipse,
    ellifit,
    fit_error,
    generate_points_equiangle,
    get_ellipse_info,
    norm_mat,
    unnorm_mat,
    create_meshgrid,
    norm_pts,
    unnorm_pts,
)

from reference_oracle import import_reference

RNG = np.random.RandomState(0)


def random_params(n, w=320, h=240):
    cx = RNG.uniform(0.2 * w, 0.8 * w, n)
    cy = RNG.uniform(0.2 * h, 0.8 * h, n)
    a = RNG.uniform(10, 60, n)
    b = RNG.uniform(10, 60, n)
    theta = RNG.uniform(-1.2, 1.2, n)
    return np.stack([cx, cy, a, b, theta], axis=1)


class TestRoundTrip:
    def test_param_conic_roundtrip(self):
        p = random_params(64)
        rec = conic_to_param(param_to_conic(p, np), np)
        # theta recovery is modulo axis-swap: a>b vs a<b maps theta +-pi/2.
        # Our random params have independent a, b, so compare via conic.
        m1 = param_to_conic(p, np)
        m2 = param_to_conic(rec, np)
        np.testing.assert_allclose(m1, m2, rtol=1e-8, atol=1e-10)
        # centers always match directly
        np.testing.assert_allclose(rec[:, :2], p[:, :2], rtol=1e-8)

    def test_points_on_ellipse_satisfy_conic(self):
        p = random_params(16)
        pts = generate_points_equiangle(p, np)  # [16, 8, 2]
        mat = param_to_conic(p, np)
        homo = np.concatenate([pts, np.ones_like(pts[..., :1])], axis=-1)
        vals = np.einsum("bni,bij,bnj->bn", homo, mat, homo)
        np.testing.assert_allclose(vals, 0.0, atol=1e-8)

    def test_transform_identity(self):
        p = random_params(8)
        rec = transform_ellipse(p, np.eye(3), np)
        np.testing.assert_allclose(
            param_to_conic(rec, np), param_to_conic(p, np), rtol=1e-8, atol=1e-10
        )

    def test_transform_known_scale(self):
        p = np.array([[100.0, 50.0, 30.0, 20.0, 0.0]])
        H = np.diag([2.0, 2.0, 1.0])
        rec = transform_ellipse(p, H, np)
        np.testing.assert_allclose(rec[0], [200.0, 100.0, 60.0, 40.0, 0.0], atol=1e-8)


class TestReferenceParity:
    def test_param2mat_parity(self):
        hf = import_reference("helperfunctions")
        p = random_params(20)
        ours = param_to_conic(p, np)
        for i in range(20):
            ref = hf.my_ellipse(p[i]).mat
            np.testing.assert_allclose(ours[i], ref, rtol=1e-10)

    def test_transform_parity(self):
        hf = import_reference("helperfunctions")
        p = random_params(20)
        H = np.array(norm_mat(240, 320, np))
        ours = transform_ellipse(p, H, np)
        for i in range(20):
            ref = hf.my_ellipse(p[i]).transform(H)[0][:-1]
            np.testing.assert_allclose(ours[i], ref, rtol=1e-6, atol=1e-8)

    def test_get_ellipse_info_parity(self):
        hf = import_reference("helperfunctions")
        p = random_params(20)
        H = np.array(norm_mat(240, 320, np))
        pts, nrm = get_ellipse_info(p, H, np.zeros(20, dtype=bool), np)
        for i in range(20):
            ref_pts, ref_nrm = hf.get_ellipse_info(p[i].copy(), H, False)
            np.testing.assert_allclose(nrm[i], ref_nrm, rtol=1e-6, atol=1e-8)
            np.testing.assert_allclose(pts[i], ref_pts, rtol=1e-5, atol=1e-6)

    def test_get_ellipse_info_missing(self):
        p = random_params(4)
        H = np.array(norm_mat(240, 320, np))
        pts, nrm = get_ellipse_info(p, H, np.ones(4, dtype=bool), np)
        assert np.all(nrm == -1)
        assert np.all(pts == -1)

    def test_ellifit_recovers_known_ellipse(self):
        p = random_params(12)
        # dense points around the periphery
        t = np.linspace(0, 2 * np.pi, 40, endpoint=False)
        cx, cy, a, b, th = (p[:, i: i + 1] for i in range(5))
        x = a * np.cos(t)
        y = b * np.sin(t)
        xr = np.cos(th) * x - np.sin(th) * y + cx
        yr = np.sin(th) * x + np.cos(th) * y + cy
        pts = np.stack([xr, yr], axis=-1)
        fit, _ = ellifit(pts, np)
        err = fit_error(pts, fit, np)
        assert np.all(err < 1e-6)
        np.testing.assert_allclose(fit[:, :2], p[:, :2], atol=1e-6)

    def test_meshgrid_parity(self):
        utils = import_reference("utils")
        ref = utils.create_meshgrid(24, 32, normalized_coordinates=True).numpy()[0]
        ours = np.array(create_meshgrid(24, 32, True, np))
        np.testing.assert_allclose(ours, ref, atol=1e-7)

    def test_norm_unnorm_pts_parity(self):
        utils = import_reference("utils")
        pts = RNG.uniform(0, 200, (10, 2)).astype(np.float64)
        np.testing.assert_allclose(
            norm_pts(pts, (240, 320), np), utils.normPts(pts, (240, 320)), atol=1e-10
        )
        npts = RNG.uniform(-1, 1, (10, 2))
        np.testing.assert_allclose(
            unnorm_pts(npts, (240, 320), np), utils.unnormPts(npts, (240, 320)), atol=1e-10
        )


class TestJaxPath:
    def test_jnp_matches_np(self):
        p = random_params(8).astype(np.float32)
        H = np.array(norm_mat(240, 320, np), dtype=np.float32)
        a = np.array(transform_ellipse(jnp.asarray(p), jnp.asarray(H), jnp))
        b = transform_ellipse(p.astype(np.float64), H.astype(np.float64), np)
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)

    def test_jit_compiles(self):
        import jax

        p = jnp.asarray(random_params(8), dtype=jnp.float32)
        H = norm_mat(240, 320, jnp)
        f = jax.jit(lambda q: transform_ellipse(q, H, jnp))
        out = f(p)
        assert out.shape == (8, 5)

    def test_unnorm_roundtrip(self):
        p = random_params(8)
        Hn = np.array(norm_mat(240, 320, np))
        Hu = np.array(unnorm_mat(240, 320, np))
        rec = transform_ellipse(transform_ellipse(p, Hn, np), Hu, np)
        np.testing.assert_allclose(
            param_to_conic(rec, np), param_to_conic(p, np), rtol=1e-7, atol=1e-9
        )
