"""RITnet v1 — the constant-width DenseNet baseline (flax / NHWC).

TPU-native rebuild of reference models/RITnet_v1.py: all blocks 32 channels,
BatchNorm at the END of each down block, pooling applied to the block INPUT,
nearest-neighbor upsampling, final 1x1 conv. Edge input is accepted but
unused (reference forward ignores x_edge). Shares the exact same loss
formula as ESF-Net (reference RITnet_v1.py:317-373 duplicates get_allLoss),
so the generic :func:`eghmd_tpu.losses.compute_all_losses` applies.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import conv_precision

from .blocks import leaky_relu

Dtype = Any




def _conv(c, k, name, dtype):
    return nn.Conv(c, (k, k), padding=(k - 1) // 2, dtype=dtype,
                   precision=conv_precision(dtype), name=name)


class V1DownBlock(nn.Module):
    """reference RITnet_v1.py:38-73: pool-first dense block ending in BN."""

    out_c: int
    down: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.down:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x1 = leaky_relu(_conv(self.out_c, 3, "conv1", self.dtype)(x))
        x21 = jnp.concatenate([x, x1], axis=-1)
        x22 = leaky_relu(_conv(self.out_c, 3, "conv22", self.dtype)(
            _conv(self.out_c, 1, "conv21", self.dtype)(x21)))
        x31 = jnp.concatenate([x21, x22], axis=-1)
        out = leaky_relu(_conv(self.out_c, 3, "conv32", self.dtype)(
            _conv(self.out_c, 1, "conv31", self.dtype)(x31)))
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="bn")(out)
        return out


class V1UpBlock(nn.Module):
    """reference RITnet_v1.py:75-101: nearest 2x + skip concat dense block."""

    out_c: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, skip, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
        x = jnp.concatenate([x, skip], axis=-1)
        x1 = leaky_relu(_conv(self.out_c, 3, "conv12", self.dtype)(
            _conv(self.out_c, 1, "conv11", self.dtype)(x)))
        x21 = jnp.concatenate([x, x1], axis=-1)
        out = leaky_relu(_conv(self.out_c, 3, "conv22", self.dtype)(
            _conv(self.out_c, 1, "conv21", self.dtype)(x21)))
        return out


class RITnetV1(nn.Module):
    chz: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_edge=None, train: bool = False):
        del x_edge  # unused by v1
        from .blocks import RegressionModule

        c = self.chz
        x1 = V1DownBlock(c, False, self.dtype, name="down_block1")(x, train)
        x2 = V1DownBlock(c, True, self.dtype, name="down_block2")(x1, train)
        x3 = V1DownBlock(c, True, self.dtype, name="down_block3")(x2, train)
        x4 = V1DownBlock(c, True, self.dtype, name="down_block4")(x3, train)
        x5 = V1DownBlock(c, True, self.dtype, name="down_block5")(x4, train)
        latent = jnp.mean(x5, axis=(1, 2))
        el_out = RegressionModule(dtype=self.dtype, name="elReg")(x5)
        y = V1UpBlock(c, self.dtype, name="up_block4")(x4, x5)
        y = V1UpBlock(c, self.dtype, name="up_block3")(x3, y)
        y = V1UpBlock(c, self.dtype, name="up_block2")(x2, y)
        y = V1UpBlock(c, self.dtype, name="up_block1")(x1, y)
        op = nn.Conv(3, (1, 1), dtype=self.dtype, precision=conv_precision(self.dtype), name="final")(y)
        return op, el_out, latent
