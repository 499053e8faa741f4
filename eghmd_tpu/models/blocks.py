"""Shared NN building blocks (flax / NHWC).

TPU-native re-designs of the reference blocks:
  * DenseNet down/up blocks     — reference models/RITnet_v2.py:32-88
  * convBlock / linStack        — reference utils.py:953-981, 1039-1050
  * Conv2dBlock / LinearBlock   — reference utils.py:1051-1149
  * regression head             — reference utils.py:983-1037

All tensors are NHWC (TPU-friendly); parameters live in fp32 while compute
may run in bfloat16 via the ``dtype`` attribute. Normalizations that the
reference instantiates as parameter-free (InstanceNorm2d affine=False) are
plain functions here.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def conv_precision(dtype):
    """'highest' for fp32 (bit-exact parity; jax's default silently degrades
    fp32 convs to bf16 passes) but backend-default for bf16 compute, where
    'highest' would force slow fp32 accumulation paths on the MXU."""
    return "highest" if dtype == jnp.float32 else None



def leaky_relu(x):
    # torch F.leaky_relu default negative_slope=0.01
    return jax.nn.leaky_relu(x, negative_slope=0.01)


def instance_norm(x, eps=1e-5):
    """Parameter-free per-sample, per-channel normalization over H, W.

    Matches torch nn.InstanceNorm2d(affine=False) (biased variance), used as
    the norm everywhere inside ESF-Net (reference models/RITnet_v2.py:209).
    """
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def upsample2x_bilinear(x):
    """Bilinear 2x upsample, half-pixel centers (== torch align_corners=False).

    Reference models/RITnet_v2.py:80-83.
    """
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


def avg_pool(x, k):
    return nn.avg_pool(x, (k, k), strides=(k, k))


class ConvBlock(nn.Module):
    """conv3x3 -> lrelu -> conv3x3 -> lrelu -> BatchNorm.

    Reference utils.py:1039-1050 (``convBlock``): encoder head and final
    decoder block.
    """

    inter_c: int
    out_c: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = leaky_relu(nn.Conv(self.inter_c, (3, 3), padding=1, dtype=self.dtype, precision=conv_precision(self.dtype), name="conv1")(x))
        x = leaky_relu(nn.Conv(self.out_c, (3, 3), padding=1, dtype=self.dtype, precision=conv_precision(self.dtype), name="conv2")(x))
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(x)
        return x


class DenseDownBlock(nn.Module):
    """DenseNet2D down block + transition-down.

    Reference models/RITnet_v2.py:47-66 (block) and :32-44 (Transition_down).
    Returns (skip, downsampled): skip has in_c + inter_c channels.
    """

    inter_c: int
    op_c: int
    down_size: int  # 0 -> no pooling (bottleneck)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda c, k, name: nn.Conv(
            c, (k, k), padding=(k - 1) // 2, dtype=self.dtype, precision=conv_precision(self.dtype), name=name
        )
        x1 = leaky_relu(conv(self.inter_c, 3, "conv1")(instance_norm(x)))
        x21 = jnp.concatenate([x, x1], axis=-1)
        x22 = leaky_relu(conv(self.inter_c, 3, "conv22")(conv(self.inter_c, 1, "conv21")(x21)))
        x31 = jnp.concatenate([x21, x22], axis=-1)
        out = leaky_relu(conv(self.inter_c, 3, "conv32")(conv(self.inter_c, 1, "conv31")(x31)))
        out = jnp.concatenate([out, x], axis=-1)
        # Transition down: norm -> act -> 1x1 conv -> avgpool
        y = leaky_relu(instance_norm(out))
        y = conv(self.op_c, 1, "td_conv")(y)
        if self.down_size:
            y = avg_pool(y, self.down_size)
        return out, y


class DenseUpBlock(nn.Module):
    """DenseNet2D up block: bilinear 2x + skip concat + two dense conv pairs.

    Reference models/RITnet_v2.py:69-88. ``do_upsample=False`` runs the
    block at the incoming resolution (the caller has downsampled the skip
    instead) — the fast-seg serving mode; parameters are unchanged.
    """

    out_c: int
    dtype: Dtype = jnp.float32
    do_upsample: bool = True

    @nn.compact
    def __call__(self, skip, x):
        conv = lambda c, k, name: nn.Conv(
            c, (k, k), padding=(k - 1) // 2, dtype=self.dtype, precision=conv_precision(self.dtype), name=name
        )
        if self.do_upsample:
            # upsample to the skip's exact spatial dims: identical to the
            # reference's scale_factor=2 interpolate for the even sizes the
            # reference ever sees (models/RITnet_v2.py:80-83), but also
            # correct for the odd intermediate sizes that fast-input
            # serving students (ESFNet.input_downscale) produce, where
            # floor-pooling makes 2*H_pooled != H_skip
            b, _, _, c = x.shape
            x = jax.image.resize(
                x, (b, skip.shape[1], skip.shape[2], c), method="bilinear")
        x = jnp.concatenate([x, skip], axis=-1)
        x1 = leaky_relu(conv(self.out_c, 3, "conv12")(conv(self.out_c, 1, "conv11")(x)))
        x21 = jnp.concatenate([x, x1], axis=-1)
        out = leaky_relu(conv(self.out_c, 3, "conv22")(conv(self.out_c, 1, "conv21")(x21)))
        return out


class RegressionModule(nn.Module):
    """Bottleneck -> 10 ellipse params (iris 5 | pupil 5 by consumer convention).

    Reference utils.py:983-1037. Centers tanh, axes sigmoid, angles linear.
    Expects a 15x20 spatial bottleneck (240x320 inputs / 16).
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = leaky_relu(nn.Conv(128, (2, 3), padding="VALID", dtype=self.dtype, precision=conv_precision(self.dtype), name="c1")(x))
        # The reference pipeline always sees a >=11x12 bottleneck (eye sizes
        # >= 176x192) and pools here. Fast-input serving students
        # (ESFNet.input_downscale > 1) shrink the bottleneck below what the
        # two VALID 3x3 convs after the pool can consume; for those shapes
        # the pool is skipped (shape-static under jit — the choice is fixed
        # at trace time and baked into the student's checkpoint).
        if x.shape[1] // 2 >= 5 and x.shape[2] // 2 >= 5:
            x = avg_pool(x, 2)
        if x.shape[1] < 5 or x.shape[2] < 5:
            raise ValueError(
                f"regression head needs a >=5x5 map after c1, got "
                f"{x.shape[1]}x{x.shape[2]} — eye size too small for this "
                f"input_downscale")
        x = leaky_relu(nn.Conv(128, (3, 3), padding="VALID", dtype=self.dtype, precision=conv_precision(self.dtype), name="c2")(x))
        x = leaky_relu(
            nn.Conv(32, (3, 3), padding="VALID", use_bias=False, dtype=self.dtype, precision=conv_precision(self.dtype), name="c3")(x)
        )
        b = x.shape[0]
        # flatten in torch CHW order so converted checkpoints line up exactly
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)
        x = nn.Dense(256, dtype=self.dtype, precision=conv_precision(self.dtype), name="l1")(x)
        x = jax.nn.selu(x)
        x = nn.Dense(10, dtype=self.dtype, precision=conv_precision(self.dtype), name="l2")(x)

        c1 = jnp.tanh(x[:, 0:2])
        ab1 = jax.nn.sigmoid(x[:, 2:4])
        th1 = x[:, 4:5]
        c2 = jnp.tanh(x[:, 5:7])
        ab2 = jax.nn.sigmoid(x[:, 7:9])
        th2 = x[:, 9:10]
        return jnp.concatenate([c1, ab1, th1, c2, ab2, th2], axis=1)


class StyleEncoder(nn.Module):
    """Seg-map -> style vector (reference models/RITnet_v2.py:91-107).

    Conv2dBlock stack with reflect padding, relu, no norm; global average
    pool; 1x1 conv to style_dim.
    """

    style_dim: int = 8
    dim: int = 64
    n_downsample: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        def rconv(c, k, s, p, name):
            def apply(h):
                h = jnp.pad(h, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
                return nn.Conv(c, (k, k), strides=(s, s), padding="VALID",
                               dtype=self.dtype, precision=conv_precision(self.dtype), name=name)(h)
            return apply

        d = self.dim
        x = nn.relu(rconv(d, 7, 1, 3, "conv0")(x))
        for i in range(2):
            x = nn.relu(rconv(2 * d, 4, 2, 1, f"conv{i + 1}")(x))
            d *= 2
        for i in range(self.n_downsample - 2):
            x = nn.relu(rconv(d, 4, 2, 1, f"conv{i + 3}")(x))
        x = jnp.mean(x, axis=(1, 2), keepdims=True)  # AdaptiveAvgPool2d(1)
        x = nn.Conv(self.style_dim, (1, 1), dtype=self.dtype, precision=conv_precision(self.dtype), name="conv_out")(x)
        return x.reshape(x.shape[0], -1)


class MLP(nn.Module):
    """Style vector -> AdaIN params (reference models/RITnet_v2.py:110-121)."""

    out_dim: int
    hidden: int = 256
    n_blk: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, precision=conv_precision(self.dtype), name="fc0")(x))
        for i in range(self.n_blk - 2):
            x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, precision=conv_precision(self.dtype), name=f"fc{i + 1}")(x))
        return nn.Dense(self.out_dim, dtype=self.dtype, precision=conv_precision(self.dtype), name=f"fc{self.n_blk - 1}")(x)


class LinStack(nn.Module):
    """Stack of Linear layers with optional SELU pre-activation.

    Reference utils.py:953-981. With ``act=False`` (the dsIdentify head,
    models/RITnet_v2.py:240-249) it is linear->linear.
    """

    hidden_dim: int
    out_dim: int
    num_layers: int = 2
    act: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            if self.act:
                x = jax.nn.selu(x)
            feats = self.hidden_dim if i < self.num_layers - 1 else self.out_dim
            x = nn.Dense(feats, dtype=self.dtype, precision=conv_precision(self.dtype), name=f"lin{i}")(x)
        return x


def adain_mean_std(x, eps=1e-5):
    """Per-sample, per-channel mean/std with UNBIASED variance.

    Matches reference DenseNet2D.calc_mean_std (models/RITnet_v2.py:251-259),
    which uses torch ``.var(dim=2)`` (unbiased) — unlike InstanceNorm.
    """
    n = x.shape[1] * x.shape[2]
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True) * (n / (n - 1))
    return mean, jnp.sqrt(var + eps)
