"""DeepVOG baseline — Keras-style pupil-only U-Net (flax / NHWC).

TPU-native rebuild of reference models/deepvog_pytorch.py: gray input
replicated to 3 channels, 4 encoding blocks (conv3x3-BN-relu then
strided-conv2x2 downsample that doubles channels), 5 decoding blocks with
skip concat and nearest 2x upsample, final 1x1 conv to 2 classes (bg /
pupil). Its own simplified loss (CE-of-softmax quirk included) lives in
:func:`deepvog_loss` (reference deepvog_pytorch.py:151-168).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import conv_precision

from ..geometry.points import norm_pts
from ..losses.point import seg_to_pt_loss

Dtype = Any




class EncodingBlock(nn.Module):
    filters: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                       epsilon=1e-5, dtype=self.dtype, name=name)
        x = nn.Conv(self.filters, (3, 3), padding=1, dtype=self.dtype,
                    precision=conv_precision(self.dtype), name="conv1")(x)
        x = nn.relu(bn("bn1")(x))
        skip = x
        x = nn.Conv(self.filters * 2, (2, 2), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, precision=conv_precision(self.dtype), name="conv2")(x)
        x = nn.relu(bn("bn2")(x))
        return skip, x


class DecodingBlock(nn.Module):
    filters: int
    up_sampling: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, skip, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                       epsilon=1e-5, dtype=self.dtype, name=name)
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        x = nn.Conv(self.filters, (3, 3), padding=1, dtype=self.dtype,
                    precision=conv_precision(self.dtype), name="conv1")(x)
        x = nn.relu(bn("bn1")(x))
        if self.up_sampling:
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
            x = nn.Conv(self.filters, (3, 3), padding=1, dtype=self.dtype,
                        precision=conv_precision(self.dtype), name="conv2")(x)
            x = nn.relu(bn("bn2")(x))
        return x


class DeepVOG(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_edge=None, train: bool = False):
        del x_edge
        f = 16
        x = jnp.concatenate([x, x, x], axis=-1)
        j1, x = EncodingBlock(f, self.dtype, name="down_block1")(x, train)
        j2, x = EncodingBlock(f * 2, self.dtype, name="down_block2")(x, train)
        j3, x = EncodingBlock(f * 4, self.dtype, name="down_block3")(x, train)
        j4, x = EncodingBlock(f * 8, self.dtype, name="down_block4")(x, train)
        x = DecodingBlock(f * 16, True, self.dtype, name="up_block1")(None, x, train)
        x = DecodingBlock(f * 16, True, self.dtype, name="up_block2")(j4, x, train)
        x = DecodingBlock(f * 8, True, self.dtype, name="up_block3")(j3, x, train)
        x = DecodingBlock(f * 4, True, self.dtype, name="up_block4")(j2, x, train)
        x = DecodingBlock(f * 2, False, self.dtype, name="up_block5")(j1, x, train)
        op = nn.Conv(2, (1, 1), dtype=self.dtype, precision=conv_precision(self.dtype),
                     name="conv1")(x)
        b = op.shape[0]
        latent = jnp.ones((b, 5), op.dtype)  # garbage, like the reference
        return op, jnp.zeros((b, 10), op.dtype), latent


def deepvog_loss(op, target, pupil_center, cond):
    """reference deepvog_pytorch.py:151-168: 10x masked mean of
    CE-applied-to-softmax (a preserved upstream quirk) + pupil seg2pt.
    Returns (loss, pred_c_seg_pup [B, 2])."""
    b, h, w, _ = op.shape
    tgt = (target == 2).astype(jnp.int32)
    pup_gt = norm_pts(pupil_center, (h, w), jnp).astype(op.dtype)
    l_pt, pred_c = seg_to_pt_loss(op[..., 1], pup_gt, temperature=4.0)
    sm = jax.nn.softmax(op, axis=-1)
    logp = jax.nn.log_softmax(sm, axis=-1)  # CE over softmax outputs (quirk)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    per_sample = 10.0 * jnp.mean(nll.reshape(b, -1), axis=1)
    ok = (1.0 - cond[:, 1]).astype(op.dtype)
    total = jnp.sum(ok)
    l_seg = jnp.where(total > 0, jnp.sum(per_sample * ok) / jnp.maximum(total, 1e-20), 0.0)
    return l_seg + jnp.mean(l_pt), pred_c
