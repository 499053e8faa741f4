"""Per-frame NUMERIC parity of the composed video serving chain vs the
reference (VERDICT r3 #4).

Composition parity for the eval driver exists (test_eval_driver_parity.py)
and the refine op has a quality-parity test, but the composed per-frame
serving chain — preprocess -> BDCN -> ESF-Net -> ellipse unnormalization ->
coordinate-descent refinement -> rescale to original coordinates
(reference evaluate.py:112-192: ``preprocess_frame`` ->
``evaluate_ellseg_on_image`` -> ``rescale_to_original``) — was never diffed
end-to-end on shared weights and identical real frames. This test drives
the reference's ACTUAL functions on frames of the real demo clip with the
trained teacher + BDCN artifacts exported to torch, against our jitted
:class:`VideoPipeline` step at the same refinement budget (40 sweeps both
sides), and asserts numeric agreement of every serving output.

Slow: two torch VGG16+DenseNet CPU forwards per eye on this 1-core box.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reference_oracle import import_reference

pytestmark = pytest.mark.slow

VIDEO = "/root/reference/videos/example1.avi"
TEACHER = os.path.join(os.path.dirname(__file__), "..",
                       "artifacts", "teacher", "checkpoints")
BDCN_ART = os.path.join(os.path.dirname(__file__), "..",
                        "artifacts", "bdcn", "checkpoints")
N_FRAMES = 2  # 4 eyes: bounds the torch CPU cost


def _decode_frames(n):
    import cv2

    cap = cv2.VideoCapture(VIDEO)
    frames = []
    try:
        while len(frames) < n:
            ok, fr = cap.read()
            if not ok:
                break
            frames.append(fr)
    finally:
        cap.release()
    return frames


@pytest.fixture(scope="module")
def shared_weights():
    """Trained teacher (baseline_edge chz32) + trained BDCN, both as flax
    variables AND as reference-layout torch modules carrying the SAME
    numbers."""
    import torch

    from eghmd_tpu.config import VARIANT_PRESETS
    from eghmd_tpu.models.esfnet import ESFNet
    from eghmd_tpu.training.checkpoints import (load_bdcn_variables,
                                                load_checkpoint_variables)
    from eghmd_tpu.utils.torch_convert import (bdcn_flax_to_torch,
                                               esfnet_flax_to_torch)
    from test_esfnet_parity import _reference_setting

    if not (os.path.isdir(TEACHER) and os.path.isdir(BDCN_ART)):
        pytest.skip("trained artifacts not available")

    variant = VARIANT_PRESETS["baseline_edge"]
    variables = load_checkpoint_variables(TEACHER)
    bdcn_vars = load_bdcn_variables(BDCN_ART)

    ref_mod = import_reference("models.RITnet_v2")
    ref_bdcn_mod = import_reference("bdcn_new")
    tmodel = ref_mod.DenseNet2D(_reference_setting(variant))
    sd = esfnet_flax_to_torch(variables, variant)
    missing, unexpected = tmodel.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
        strict=False)
    assert not unexpected, unexpected
    tmodel.eval()

    tbdcn = ref_bdcn_mod.BDCN(pretrain=None)
    bsd = bdcn_flax_to_torch(bdcn_vars)
    missing, unexpected = tbdcn.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in bsd.items()},
        strict=False)
    assert not unexpected, unexpected
    # only the analytic bilinear deconvs (kept from torch's own init, which
    # is the same bilinear surgery our module hardcodes) may be missing
    assert all("upsample" in k for k in missing), missing
    tbdcn.eval()

    model = ESFNet(setting=variant)
    return model, variables, bdcn_vars, tmodel, tbdcn


def _reference_serving_chain(eye_gray, tmodel, tbdcn):
    """Drive the reference's real per-frame functions (evaluate.py:112-192)
    on one gray eye crop; returns (seg_map, pupil_ell, iris_ell) in
    ORIGINAL-frame coordinates."""
    import types

    import torch

    ref_eval = import_reference("evaluate")
    # evaluate_ellseg_on_image reads the module-global CLI args (prec only
    # on this path, evaluate.py:121)
    ref_eval.args = types.SimpleNamespace(prec=torch.float32, align_width=1)

    frame, scale_shift = ref_eval.preprocess_frame(
        eye_gray.astype(np.float64), (240, 320), align_width=True)
    edge_map, seg_map, pupil_el, iris_el = ref_eval.evaluate_ellseg_on_image(
        frame.unsqueeze(0), tmodel, tbdcn, device=torch.device("cpu"))
    _, seg_map, pupil_el, iris_el = ref_eval.rescale_to_original(
        edge_map, seg_map, pupil_el, iris_el, scale_shift, eye_gray.shape)
    return seg_map, pupil_el, iris_el


def test_video_frame_parity(shared_weights):
    import cv2

    from eghmd_tpu.inference.preprocess import rescale_ellipse_to_original
    from eghmd_tpu.inference.video import VideoPipeline
    from eghmd_tpu.metrics.raster import ellipse_bbox_iou
    from eghmd_tpu.models.bdcn import make_edge_fn

    model, variables, bdcn_vars, tmodel, tbdcn = shared_weights

    frames = _decode_frames(N_FRAMES)
    if not frames:
        pytest.skip("demo video not decodable")
    grays = [cv2.cvtColor(f, cv2.COLOR_BGR2GRAY) for f in frames]
    # dual-eye split at x=320, like both serving drivers
    # (reference evaluate.py:242-243 / inference.preprocess.split_dual_eye)
    eyes = [g[:, i * 320:(i + 1) * 320] for g in grays for i in (0, 1)]

    # ---- ours: ONE jitted batched step over all eyes -------------------
    pipe = VideoPipeline(model, variables,
                         edge_fn=make_edge_fn(bdcn_vars, jnp.float32),
                         refine=True, device_overlay=False,
                         batch_frames=len(eyes))
    seg8, _, iris_px, pupil_px = pipe.infer_frames(
        np.stack(eyes).astype(np.float32))
    h0, w0 = eyes[0].shape
    sc = 320 / w0
    pad = 240 - int(h0 * sc)
    ours_pup = [rescale_ellipse_to_original(pupil_px[i], (sc, pad))
                for i in range(len(eyes))]
    ours_iri = [rescale_ellipse_to_original(iris_px[i], (sc, pad))
                for i in range(len(eyes))]

    # ---- reference: the real evaluate.py functions, eye by eye ---------
    for i, eye in enumerate(eyes):
        ref_seg, ref_pup, ref_iri = _reference_serving_chain(
            eye, tmodel, tbdcn)

        # seg argmax agreement in op space (ref_seg was rescaled back to
        # the original geometry; undo via the same nearest mapping our
        # overlay restore uses is lossy, so compare in ORIGINAL space by
        # restoring ours the same way the drivers do)
        from eghmd_tpu.inference.video import restore_map_geometry_np

        ours_seg = restore_map_geometry_np(
            np.asarray(seg8[i], np.uint8), (sc, pad), eye.shape)
        agree = float(np.mean(ours_seg == ref_seg))
        assert agree >= 0.995, (i, agree)

        for ours_el, ref_el, name in ((ours_pup[i], ref_pup, "pupil"),
                                      (ours_iri[i], ref_iri, "iris")):
            # centers are seg-derived and NOT touched by refinement on
            # either side (reference utils.py:455-456): tight bound
            np.testing.assert_allclose(ours_el[:2], ref_el[:2], atol=1.0,
                                       err_msg=f"eye {i} {name} center")
            # axes/angle go through 40 coordinate-descent sweeps whose
            # accept/reject flips are fp-sensitive; assert geometric
            # equivalence of the refined ellipses instead of bitwise path
            # identity (both at the SAME 40-sweep budget)
            iou = float(ellipse_bbox_iou(
                np.asarray(ours_el, np.float64), np.asarray(ref_el),
                shape=eye.shape))
            assert iou >= 0.90, (i, name, iou, ours_el, ref_el)
