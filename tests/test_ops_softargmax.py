"""Fused soft-argmax kernel: parity with the jnp training path.

The serving path (bench.py, inference/video.py) extracts seg-derived centers
via :func:`eghmd_tpu.ops.seg_centers` instead of running the loss stack with
dummy GT (the reference serves through its loss-bearing forward,
evaluate.py:121-130). These tests pin the kernel to the training-path math.
"""

import numpy as np
import jax
import jax.numpy as jnp

from eghmd_tpu.ops import seg_centers, soft_argmax_2d
from eghmd_tpu.losses import compute_all_losses
from eghmd_tpu.losses.point import seg_to_pt_loss


def test_soft_argmax_matches_seg_to_pt_loss():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(6, 48, 64).astype(np.float32))
    _, pred = seg_to_pt_loss(x, jnp.zeros((6, 2)), temperature=4.0)
    ours = soft_argmax_2d(x, 4.0)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(pred),
                               rtol=1e-5, atol=1e-6)


def test_soft_argmax_odd_batch():
    # batch not divisible by the kernel tile -> single-row tiles
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(5, 24, 32).astype(np.float32))
    _, pred = seg_to_pt_loss(x, jnp.zeros((5, 2)), temperature=4.0)
    np.testing.assert_allclose(np.asarray(soft_argmax_2d(x, 4.0)),
                               np.asarray(pred), rtol=1e-5, atol=1e-6)


def test_soft_argmax_peak_location():
    # a sharp peak at a known pixel must map to its normalized coordinate
    h, w = 40, 60
    x = np.full((1, h, w), -50.0, np.float32)
    x[0, 10, 45] = 50.0
    pts = np.asarray(soft_argmax_2d(jnp.asarray(x), 4.0))[0]
    exp_x = 45 / (w - 1) * 2 - 1
    exp_y = 10 / (h - 1) * 2 - 1
    np.testing.assert_allclose(pts, [exp_x, exp_y], atol=1e-3)


def test_seg_centers_matches_compute_all_losses():
    rng = np.random.RandomState(2)
    op = jnp.asarray(rng.randn(4, 48, 64, 3).astype(np.float32))
    b, h, w, _ = op.shape
    out = compute_all_losses(
        op, jnp.zeros((b, 10)), jnp.zeros((b, h, w), jnp.int32),
        jnp.zeros((b, 2)), jnp.zeros((b, 2, 5)), jnp.zeros((b, h, w)),
        jnp.zeros((b, h, w, 3)), jnp.zeros((b, 4)), 0.0,
    )
    centers = seg_centers(op)
    np.testing.assert_allclose(np.asarray(centers), np.asarray(out.pred_c_seg),
                               rtol=1e-5, atol=1e-6)


def test_seg_centers_bf16_input():
    rng = np.random.RandomState(3)
    op32 = rng.randn(2, 48, 64, 3).astype(np.float32)
    c32 = np.asarray(seg_centers(jnp.asarray(op32)))
    c16 = np.asarray(seg_centers(jnp.asarray(op32, jnp.bfloat16)))
    assert c16.dtype == np.float32  # computed in f32 regardless of input
    np.testing.assert_allclose(c16, c32, atol=2e-2)
