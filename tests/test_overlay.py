"""On-device overlay rendering (eghmd_tpu/ops/overlay.py) vs the host
renderer (reference helperfunctions.py:521-622 semantics) and the geometry
restoration of reference evaluate.py:169-192."""

import numpy as np
import jax.numpy as jnp
import pytest

from eghmd_tpu.ops.overlay import (
    IRIS_FILL, IRIS_LINE, PUPIL_FILL, PUPIL_LINE,
    ellipse_distance_field, render_overlay_batch, restore_map_geometry)
from eghmd_tpu.inference.video import (
    plot_segmap_ellpreds, restore_map_geometry_np)


def _ring_points(ell, n=64):
    cx, cy, a, b, th = ell
    t = np.linspace(0, 2 * np.pi, n, endpoint=False)
    x = cx + a * np.cos(t) * np.cos(th) - b * np.sin(t) * np.sin(th)
    y = cy + a * np.cos(t) * np.sin(th) + b * np.sin(t) * np.cos(th)
    return x, y


class TestDistanceField:
    def test_zero_on_curve_and_grows_away(self):
        ell = np.array([160.0, 120.0, 60.0, 40.0, 0.4])
        d = np.asarray(ellipse_distance_field((240, 320),
                                              jnp.asarray(ell)[None]))[0]
        xs, ys = _ring_points(ell)
        on = d[np.round(ys).astype(int), np.round(xs).astype(int)]
        assert np.all(on < 0.8)  # within a pixel of the curve
        assert d[0, 0] > 5.0
        # distance is ~exact on the major axis: 10 px outside along x
        px = int(round(160 + 60 * np.cos(0.4) + 10 * np.cos(0.4)))
        py = int(round(120 + 60 * np.sin(0.4) + 10 * np.sin(0.4)))
        assert abs(d[py, px] - 10.0) < 1.5


class TestRenderOverlay:
    def _inputs(self):
        rng = np.random.RandomState(3)
        gray = rng.randint(0, 255, (1, 240, 320)).astype(np.uint8)
        seg = np.zeros((1, 240, 320), np.uint8)
        yy, xx = np.mgrid[0:240, 0:320]
        iris = np.array([160.0, 120.0, 70.0, 50.0, 0.2])
        pupil = np.array([160.0, 120.0, 30.0, 22.0, 0.2])
        seg[0][((xx - 160) / 70) ** 2 + ((yy - 120) / 50) ** 2 <= 1] = 1
        seg[0][((xx - 160) / 30) ** 2 + ((yy - 120) / 22) ** 2 <= 1] = 2
        return gray, seg, iris, pupil

    def test_fills_match_host_renderer_away_from_lines(self):
        import cv2

        gray, seg, iris, pupil = self._inputs()
        dev = np.asarray(render_overlay_batch(
            jnp.asarray(gray), jnp.asarray(seg), jnp.asarray(iris)[None],
            jnp.asarray(pupil)[None]))[0]
        host = plot_segmap_ellpreds(gray[0], seg[0], pupil, iris)
        # mask out a dilated band around both outlines (the AA conventions
        # differ); fills and gray background must match exactly elsewhere
        band = np.zeros((240, 320), np.uint8)
        for ell in (iris, pupil):
            cv2.ellipse(band, (int(ell[0]), int(ell[1])),
                        (int(ell[2]), int(ell[3])), ell[4] / np.pi * 180,
                        0, 360, 1, 7)
        off = band == 0
        assert np.array_equal(dev[off], host[off])

    def test_outline_colors_on_curve(self):
        gray, seg, iris, pupil = self._inputs()
        dev = np.asarray(render_overlay_batch(
            jnp.asarray(gray), jnp.asarray(seg), jnp.asarray(iris)[None],
            jnp.asarray(pupil)[None]))[0]
        for ell, color in ((iris, IRIS_LINE), (pupil, PUPIL_LINE)):
            xs, ys = _ring_points(ell, 32)
            hit = 0
            for x, y in zip(xs, ys):
                px = dev[int(round(y)), int(round(x))]
                if np.abs(px.astype(int) - np.asarray(color)).max() <= 60:
                    hit += 1
            assert hit >= 28, f"only {hit}/32 curve samples carry the line color"

    def test_invalid_ellipse_draws_nothing(self):
        gray, seg, iris, pupil = self._inputs()
        bad = np.array([np.nan, 120.0, 70.0, 50.0, 0.2])
        dev = np.asarray(render_overlay_batch(
            jnp.asarray(gray), jnp.asarray(seg), jnp.asarray(bad)[None],
            jnp.asarray(pupil)[None]))[0]
        host = plot_segmap_ellpreds(gray[0], seg[0], pupil, bad)
        # iris line absent in both; compare away from the pupil band
        import cv2

        band = np.zeros((240, 320), np.uint8)
        cv2.ellipse(band, (int(pupil[0]), int(pupil[1])),
                    (int(pupil[2]), int(pupil[3])), pupil[4] / np.pi * 180,
                    0, 360, 1, 7)
        off = band == 0
        assert np.array_equal(dev[off], host[off])


class TestRestoreGeometry:
    def test_chopped_rows_pad_back(self):
        """The demo-clip geometry (400-row eyes -> pad = -160): the
        reference pads 80 background rows back on each side
        (evaluate.py:181-183) before the nearest resize."""
        rng = np.random.RandomState(0)
        seg = rng.randint(0, 3, (2, 240, 320)).astype(np.uint8)
        dev = np.asarray(restore_map_geometry(jnp.asarray(seg), (1.0, -160),
                                              (400, 320)))
        ref = np.stack([restore_map_geometry_np(s, (1.0, -160), (400, 320))
                        for s in seg])
        assert dev.shape == (2, 400, 320)
        assert np.array_equal(dev, ref)
        # original content sits untouched in rows [80, 320)
        assert np.array_equal(dev[:, 80:320], seg)
        assert np.all(dev[:, :80] == 0) and np.all(dev[:, 320:] == 0)

    def test_padded_rows_cropped(self):
        rng = np.random.RandomState(1)
        seg = rng.randint(0, 3, (1, 240, 320)).astype(np.uint8)
        dev = np.asarray(restore_map_geometry(jnp.asarray(seg), (1.0, 40),
                                              (200, 320)))
        ref = restore_map_geometry_np(seg[0], (1.0, 40), (200, 320))
        assert dev.shape == (1, 200, 320)
        assert np.array_equal(dev[0], ref)
        assert np.array_equal(dev[0], seg[0, 20:220])

    def test_identity(self):
        seg = np.arange(12, dtype=np.uint8).reshape(1, 3, 4)
        out = np.asarray(restore_map_geometry(jnp.asarray(seg), (1.0, 0),
                                              (3, 4)))
        assert np.array_equal(out, seg)


@pytest.mark.parametrize("device_overlay", [True, False])
def test_video_pipeline_overlay_paths_agree(tmp_path, device_overlay):
    """Both overlay paths produce the reference's four outputs with
    identical ellipse logs; the device path never ships seg maps to host."""
    import cv2

    from eghmd_tpu.config import VARIANT_PRESETS, scaled_variant
    from eghmd_tpu.inference.video import VideoPipeline
    from eghmd_tpu.models import ESFNet
    import jax

    rng = np.random.RandomState(0)
    vid = str(tmp_path / "in.avi")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"MJPG"), 30, (640, 400))
    for _ in range(5):
        w.write(rng.randint(0, 255, (400, 640, 3)).astype(np.uint8))
    w.release()

    variant = scaled_variant(VARIANT_PRESETS["baseline"], 6, 1.0)
    model = ESFNet(setting=variant, chz=6, growth=1.0)
    img = jnp.zeros((1, 240, 320, 1), jnp.float32)
    variables = jax.jit(
        lambda r, a, b: model.init(r, a, b, train=False))(
            jax.random.PRNGKey(0), img, img)
    vp = VideoPipeline(model, variables, batch_frames=4, refine=False,
                       device_overlay=device_overlay)
    out = str(tmp_path / ("dev" if device_overlay else "host"))
    log = vp.process_video(vid, out, method="m")
    assert len(log) == 5
    for suffix in ("in_result_m.mp4", "in_edge_m.mp4", "in_ellipses_m.npy",
                   "in_app_centers.pkl"):
        assert (tmp_path / ("dev" if device_overlay else "host") / suffix).exists()
