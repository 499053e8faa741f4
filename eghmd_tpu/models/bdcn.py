"""BDCN — Bi-Directional Cascade Network edge extractor (flax / NHWC).

TPU-native rebuild of the reference's frozen stage-1 edge net
(reference bdcn_new.py:65-217 on a VGG16 backbone with pool4 stride 1 and
dilated conv5, reference vgg16_c.py:7-105). Faithful details:

  * MSBlock dilated multi-scale blocks, rates x{1,2,3} (bdcn_new.py:29-62)
  * per-stage 21-channel down convs, dual 1-channel score heads
  * fixed-bilinear ConvTranspose upsampling with the reference's exact crop
    offsets (bdcn_new.py:108-111, 127-164; kernels built analytically from
    get_upsampling_weight, bdcn_new.py:14-27 — constants, not params)
  * bidirectional cascade with DETACHED cross-layer sums (bdcn_new.py:165-176)
  * 10-map fuse conv; all outputs sigmoid (bdcn_new.py:178-191)

In the pipeline the net is frozen/eval-only and fed a gray image replicated
to 3 channels; only the fused map (index -1) is consumed
(reference utils.py:645-656).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import conv_precision

Dtype = Any




def bilinear_upsample_kernel(k: int, dtype=jnp.float32):
    """The reference's fixed bilinear deconv kernel (bdcn_new.py:14-27)."""
    factor = (k + 1) // 2
    center = factor - 1 if k % 2 == 1 else factor - 0.5
    og = np.ogrid[:k, :k]
    filt = (1 - abs(og[0] - center) / factor) * (1 - abs(og[1] - center) / factor)
    return jnp.asarray(filt, dtype)[:, :, None, None]  # HWIO


def _upsample_matrix(n_in: int, stride: int, n_out: int, off: int) -> np.ndarray:
    """Dense [n_out, n_in] matrix of the 1-D fixed bilinear transposed conv
    (kernel 2*stride, stride, VALID) with the crop offset folded in.

    The 2-D bilinear deconv kernel is the outer product of two 1-D kernels,
    so the whole upsample+crop is two small matmuls — MXU work instead of a
    1-channel transposed conv, which wastes 127/128 lanes."""
    k = 2 * stride
    factor = (k + 1) // 2
    center = factor - 1 if k % 2 == 1 else factor - 0.5
    filt = 1 - np.abs(np.arange(k) - center) / factor
    full = (n_in - 1) * stride + k
    w = np.zeros((full, n_in), np.float32)
    for i in range(n_in):
        w[i * stride: i * stride + k, i] = filt
    return w[off: off + n_out]


def fixed_upsample_crop(x, stride: int, h: int, w: int, off_h: int, off_w: int):
    """Bilinear transposed-conv upsample + reference crop (bdcn_new.py:7-27,
    108-111, 127-164) as two separable matmuls. Exactly equal to
    ConvTranspose2d(1,1,2s,s,bias=False)[...][off:off+target]."""
    _, h_in, w_in, _ = x.shape
    wh = jnp.asarray(_upsample_matrix(h_in, stride, h, off_h), x.dtype)
    ww = jnp.asarray(_upsample_matrix(w_in, stride, w, off_w), x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", wh, x,
                   precision=conv_precision(x.dtype))
    return jnp.einsum("pw,bowc->bopc", ww, y,
                      precision=conv_precision(x.dtype))


class VGG16C(nn.Module):
    """13-conv VGG16 variant returning all side features.

    Reference vgg16_c.py:7-105: pools after 1_2/2_2/3_3 (k2 s2), pool4 k2
    STRIDE 1 (ceil_mode — equals VALID for this kernel), conv5_x dilation 2.
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        def conv(c, name, dilation=1):
            return nn.Conv(c, (3, 3), padding=dilation, kernel_dilation=dilation,
                           dtype=self.dtype, precision=conv_precision(self.dtype), name=name)

        side = []
        x = nn.relu(conv(64, "conv1_1")(x)); side.append(x)
        x = nn.relu(conv(64, "conv1_2")(x)); side.append(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(conv(128, "conv2_1")(x)); side.append(x)
        x = nn.relu(conv(128, "conv2_2")(x)); side.append(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(conv(256, "conv3_1")(x)); side.append(x)
        x = nn.relu(conv(256, "conv3_2")(x)); side.append(x)
        x = nn.relu(conv(256, "conv3_3")(x)); side.append(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(conv(512, "conv4_1")(x)); side.append(x)
        x = nn.relu(conv(512, "conv4_2")(x)); side.append(x)
        x = nn.relu(conv(512, "conv4_3")(x)); side.append(x)
        x = nn.max_pool(x, (2, 2), strides=(1, 1))  # pool4 stride 1
        x = nn.relu(conv(512, "conv5_1", dilation=2)(x)); side.append(x)
        x = nn.relu(conv(512, "conv5_2", dilation=2)(x)); side.append(x)
        x = nn.relu(conv(512, "conv5_3", dilation=2)(x)); side.append(x)
        return side


class MSBlock(nn.Module):
    """Dilated multi-scale block (reference bdcn_new.py:29-62)."""

    rate: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        def conv(name, dilation):
            return nn.Conv(32, (3, 3), padding=dilation, kernel_dilation=dilation,
                           dtype=self.dtype, precision=conv_precision(self.dtype), name=name)

        o = nn.relu(conv("conv", 1)(x))
        o1 = nn.relu(conv("conv1", max(self.rate, 1))(o))
        o2 = nn.relu(conv("conv2", max(self.rate * 2, 1))(o))
        o3 = nn.relu(conv("conv3", max(self.rate * 3, 1))(o))
        return o + o1 + o2 + o3


class BDCN(nn.Module):
    """Full BDCN; returns the 11 sigmoid maps [p1_1..p5_1, p1_2..p5_2, fuse]
    (reference bdcn_new.py:165-191). ``logits=True`` returns the pre-sigmoid
    maps instead — the numerically stable surface for the class-balanced BCE
    training objective (training/bdcn_train.py)."""

    rate: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, logits: bool = False):
        b, h, w, _ = x.shape
        feats = VGG16C(dtype=self.dtype, name="features")(x)

        def c1x1(c, name):
            return nn.Conv(c, (1, 1), dtype=self.dtype, precision=conv_precision(self.dtype), name=name)

        def stage(feat_idxs, tag, n_blocks):
            s = None
            for j, fi in enumerate(feat_idxs):
                m = MSBlock(self.rate, self.dtype, name=f"msblock{tag}_{j + 1}")(feats[fi])
                d = c1x1(21, f"conv{tag}_{j + 1}_down")(m)
                s = d if s is None else s + d
            s_a = c1x1(1, f"score_dsn{tag}")(s)
            s_b = c1x1(1, f"score_dsn{tag}_1")(s)
            return s_a, s_b

        s1, s11 = stage([0, 1], "1", 2)
        s2, s21 = stage([2, 3], "2", 2)
        s2 = fixed_upsample_crop(s2, 2, h, w, 1, 1)
        s21 = fixed_upsample_crop(s21, 2, h, w, 1, 1)
        s3, s31 = stage([4, 5, 6], "3", 3)
        s3 = fixed_upsample_crop(s3, 4, h, w, 2, 2)
        s31 = fixed_upsample_crop(s31, 4, h, w, 2, 2)
        s4, s41 = stage([7, 8, 9], "4", 3)
        s4 = fixed_upsample_crop(s4, 8, h, w, 4, 4)
        s41 = fixed_upsample_crop(s41, 8, h, w, 4, 4)
        s5, s51 = stage([10, 11, 12], "5", 3)
        s5 = fixed_upsample_crop(s5, 8, h, w, 0, 0)
        s51 = fixed_upsample_crop(s51, 8, h, w, 0, 0)

        sg = jax.lax.stop_gradient
        o1, o2, o3, o4 = sg(s1), sg(s2), sg(s3), sg(s4)
        o21, o31, o41, o51 = sg(s21), sg(s31), sg(s41), sg(s51)
        p1_1 = s1
        p2_1 = s2 + o1
        p3_1 = s3 + o2 + o1
        p4_1 = s4 + o3 + o2 + o1
        p5_1 = s5 + o4 + o3 + o2 + o1
        p1_2 = s11 + o21 + o31 + o41 + o51
        p2_2 = s21 + o31 + o41 + o51
        p3_2 = s31 + o41 + o51
        p4_2 = s41 + o51
        p5_2 = s51

        cascade = [p1_1, p2_1, p3_1, p4_1, p5_1, p1_2, p2_2, p3_2, p4_2, p5_2]
        fuse = c1x1(1, "fuse")(jnp.concatenate(cascade, axis=-1))
        if logits:
            return cascade + [fuse]
        return [jax.nn.sigmoid(p) for p in cascade] + [jax.nn.sigmoid(fuse)]


def edge_input_dims(h: int, w: int, downscale: int = 1):
    """BDCN input dims for a fast-edge factor: reduced dims snapped UP to
    the nearest multiple of 8 (BDCN has 3 stride-2 pools)."""
    if downscale <= 1:
        return h, w
    return (max(8, -(-h // downscale // 8) * 8),
            max(8, -(-w // downscale // 8) * 8))


def make_edge_fn(variables, dtype=jnp.float32, input_is_gray=True,
                 downscale: int = 1):
    """Frozen edge extractor: gray [B,H,W,1] -> fused edge map [B,H,W,1].

    The reference replicates the gray image to 3 channels and keeps only the
    fused output (utils.py:645-656); thresholding is applied by the caller.

    ``downscale > 1`` enables the fast-edge mode: the image is bilinearly
    downsampled before BDCN and the fused map upsampled back. BDCN dominates
    the serving FLOPs (full-resolution VGG stage-1/2 convs), so downscale=2
    cuts edge-net cost ~4x; the fuse map is a smooth contour-probability
    field, and the ``edge_thres`` configs binarize it at 0.1 anyway, so the
    upsampled map is functionally equivalent (accuracy-gated in
    tests/test_bdcn_parity.py).
    """
    model = BDCN(dtype=dtype)

    def edge_fn(img):
        x = jnp.concatenate([img, img, img], axis=-1) if input_is_gray else img
        x = x.astype(dtype)
        b, h, w, c = x.shape
        if downscale > 1:
            th, tw = edge_input_dims(h, w, downscale)
            x = jax.image.resize(x, (b, th, tw, c), "bilinear")
        fuse = model.apply(variables, x)[-1]
        if downscale > 1:
            fuse = jax.image.resize(fuse, (b, h, w, 1), "bilinear")
        return jax.lax.stop_gradient(fuse.astype(img.dtype))

    return edge_fn
