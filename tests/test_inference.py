"""Inference stack tests: device refinement parity, preprocessing, evaluator,
and the video pipeline end-to-end on synthetic dual-eye videos."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eghmd_tpu.config import VARIANT_PRESETS
from eghmd_tpu.data import SyntheticEyeDataset, DataPipeline
from eghmd_tpu.data.synthetic import render_eye
from eghmd_tpu.geometry import norm_mat, transform_ellipse
from eghmd_tpu.inference import Evaluator, VideoPipeline, preprocess_frames, split_dual_eye
from eghmd_tpu.metrics import rasterize_ellipse, ellipse_mask_iou
from eghmd_tpu.models import ESFNet
from eghmd_tpu.ops import refine_ellipse_batch

from reference_oracle import import_reference


class TestRefine:
    def _setup(self, seed=0, h=120, w=160):
        rng = np.random.RandomState(seed)
        true_px = np.array([
            rng.uniform(0.4 * w, 0.6 * w), rng.uniform(0.4 * h, 0.6 * h),
            rng.uniform(0.15 * w, 0.25 * w), rng.uniform(0.12 * w, 0.2 * w),
            rng.uniform(-0.5, 0.5),
        ])
        norm = np.asarray(transform_ellipse(true_px, np.array(norm_mat(h, w, np)), np))
        seg = np.asarray(rasterize_ellipse(jnp.asarray(norm), h, w))
        init = true_px + np.array([0.0, 0.0, rng.uniform(3, 6), rng.uniform(-6, -3),
                                   rng.uniform(-0.2, 0.2)])
        return seg, true_px, init

    def test_refine_improves_iou(self):
        seg, true_px, init = self._setup()
        h, w = seg.shape
        refined = np.asarray(refine_ellipse_batch(jnp.asarray(seg)[None],
                                                  jnp.asarray(init, jnp.float32)[None]))[0]
        Hn = np.array(norm_mat(h, w, np))
        iou0 = float(ellipse_mask_iou(jnp.asarray(seg),
                                      jnp.asarray(transform_ellipse(init, Hn, np))))
        iou1 = float(ellipse_mask_iou(jnp.asarray(seg),
                                      jnp.asarray(transform_ellipse(refined, Hn, np))))
        assert iou1 > iou0 + 0.02, (iou0, iou1)
        assert iou1 > 0.93

    def test_refine_matches_reference_quality(self):
        """Final IoU must be >= the reference coordinate descent's, batched."""
        utils = import_reference("utils")
        import torch

        segs, inits, ref_ious = [], [], []
        for seed in range(3):
            seg, true_px, init = self._setup(seed)
            ref_el = utils.search_proper_parameter_iou_for_our_data(
                torch.from_numpy(seg.copy()), init.copy().tolist()
            )
            h, w = seg.shape
            Hn = np.array(norm_mat(h, w, np))
            ref_iou = float(ellipse_mask_iou(
                jnp.asarray(seg), jnp.asarray(transform_ellipse(ref_el, Hn, np))))
            segs.append(seg)
            inits.append(init)
            ref_ious.append(ref_iou)
        refined = np.asarray(refine_ellipse_batch(
            jnp.asarray(np.stack(segs)), jnp.asarray(np.stack(inits), jnp.float32)))
        for i in range(3):
            h, w = segs[i].shape
            Hn = np.array(norm_mat(h, w, np))
            ours_iou = float(ellipse_mask_iou(
                jnp.asarray(segs[i]), jnp.asarray(transform_ellipse(refined[i], Hn, np))))
            assert ours_iou >= ref_ious[i] - 0.01, (ours_iou, ref_ious[i])


class TestPreprocess:
    def test_matches_reference_shapes(self):
        """400x320 eye crop -> 240x320 standardized (the video path geometry)."""
        rng = np.random.RandomState(0)
        frames = rng.randint(0, 255, (3, 400, 320)).astype(np.uint8)
        out, (sc, pad) = preprocess_frames(jnp.asarray(frames), (240, 320))
        assert out.shape == (3, 240, 320, 1)
        assert sc == 1.0 and pad == -160
        m = np.asarray(out).mean(axis=(1, 2, 3))
        np.testing.assert_allclose(m, 0.0, atol=1e-4)

    def test_upscale_pad(self):
        rng = np.random.RandomState(0)
        frames = rng.randint(0, 255, (2, 100, 160)).astype(np.uint8)
        out, (sc, pad) = preprocess_frames(jnp.asarray(frames), (240, 320))
        assert out.shape == (2, 240, 320, 1)
        assert sc == 2.0 and pad == 40

    def test_split(self):
        frames = np.zeros((2, 400, 640))
        l, r = split_dual_eye(jnp.asarray(frames))
        assert l.shape == (2, 400, 320) and r.shape == (2, 400, 320)


class TestEvaluator:
    def test_runs_and_reports(self):
        variant = VARIANT_PRESETS["baseline"]
        model = ESFNet(setting=variant)
        ds = SyntheticEyeDataset(8, (240, 320), seed=1)
        pipe = DataPipeline(ds, batch_size=4, shuffle=False, num_workers=2)
        batch = next(iter(pipe))
        variables = model.init(jax.random.PRNGKey(0), batch["image"], batch["edge"],
                               train=False)
        ev = Evaluator(model, variables, bbox_iou=True, refine=False)
        out = ev.run(pipe, max_batches=2)
        for k in ("mean_iou", "pup_lat_dist", "iri_seg_dist", "bbiou_pupil",
                  "abs_param_iris"):
            assert k in out
        assert out["iou_by_sample"].shape == (8, 3)
        assert np.isfinite(out["mean_iou"])


class TestVideo:
    def test_dual_eye_video_end_to_end(self, tmp_path):
        import cv2

        # synthesize a dual-eye video
        rng = np.random.RandomState(0)
        path = str(tmp_path / "dual.mp4")
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (640, 400))
        for _ in range(4):
            li, *_ = render_eye(rng, 400, 320)
            ri, *_ = render_eye(rng, 400, 320)
            frame = np.concatenate([li, ri], axis=1)
            vw.write(np.stack([frame] * 3, 2))
        vw.release()

        from eghmd_tpu.inference import VideoPipeline

        variant = VARIANT_PRESETS["baseline"]
        model = ESFNet(setting=variant)
        img = jnp.zeros((1, 240, 320, 1))
        variables = model.init(jax.random.PRNGKey(0), img, img, train=False)
        vp = VideoPipeline(model, variables, batch_frames=4, refine=True)
        out_dir = str(tmp_path / "out")
        log = vp.process_video(path, out_dir, method="test")
        assert len(log) == 4 and len(log[0]) == 2  # 4 frames x 2 eyes
        assert os.path.exists(os.path.join(out_dir, "dual_result_test.mp4"))
        assert os.path.exists(os.path.join(out_dir, "dual_ellipses_test.npy"))
        assert os.path.exists(os.path.join(out_dir, "dual_app_centers.pkl"))


@pytest.mark.slow
def test_real_demo_video_e2e(tmp_path):
    """The reference's shipped demo video (evaluate.py parity config,
    BASELINE.md) must run through the full pipeline with finite outputs."""
    src = "/root/reference/videos/example1.avi"
    if not os.path.exists(src):
        pytest.skip("demo video not present in this image")
    import shutil

    vid = str(tmp_path / "example1.avi")
    shutil.copy(src, vid)
    model = ESFNet(setting=VARIANT_PRESETS["baseline_edge"])
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 240, 320, 1), jnp.float32)
    variables = jax.jit(lambda r, a, b: model.init(r, a, b, train=False))(rng, x, x)
    vp = VideoPipeline(model, variables, edge_fn=None, batch_frames=8,
                       refine=False)
    log = vp.process_video(vid, str(tmp_path / "out"), method="test",
                           max_frames=16, write_videos=True)
    assert len(log) == 16
    for eyes in log.values():
        assert len(eyes) == 2  # dual-eye split at x=320
        for pe in eyes:
            assert np.all(np.isfinite(pe["iris"]))
            assert np.all(np.isfinite(pe["pupil"]))
    assert os.path.exists(tmp_path / "out" / "example1_result_test.mp4")
    assert os.path.exists(tmp_path / "out" / "example1_app_centers.pkl")
