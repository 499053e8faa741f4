"""RITnet_concat — dual-skip edge-fusion variant (flax / NHWC).

TPU-native rebuild of reference models/RITnet_concat.py: the shared encoder
runs on image AND edge; decoder up blocks consume BOTH skip stacks
(forward(skip, e_skip, x), reference :69-89, :175-180); decoder channel
widths ip=[306,115,76,38], op=[115,76,38,32] (reference :165-166). Loss is
the shared get_allLoss — use :func:`eghmd_tpu.losses.compute_all_losses`.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .blocks import conv_precision

from .blocks import ConvBlock, RegressionModule, leaky_relu, upsample2x_bilinear
from .esfnet import DenseEncoder

Dtype = Any




class DualSkipUpBlock(nn.Module):
    """Up block concatenating image and edge skips (reference :79-89)."""

    out_c: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, skip, e_skip, x):
        conv = lambda c, k, name: nn.Conv(
            c, (k, k), padding=(k - 1) // 2, dtype=self.dtype,
            precision=conv_precision(self.dtype), name=name)
        x = upsample2x_bilinear(x)
        x = jnp.concatenate([x, skip, e_skip], axis=-1)
        x1 = leaky_relu(conv(self.out_c, 3, "conv12")(conv(self.out_c, 1, "conv11")(x)))
        x21 = jnp.concatenate([x, x1], axis=-1)
        return leaky_relu(conv(self.out_c, 3, "conv22")(conv(self.out_c, 1, "conv21")(x21)))


class RITnetConcat(nn.Module):
    chz: int = 32
    growth: float = 1.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_edge, train: bool = False):
        enc = DenseEncoder(self.chz, self.growth, dtype=self.dtype, name="enc")
        x4, x3, x2, x1, bott = enc(x, train)
        latent = jnp.mean(bott, axis=(1, 2))
        e4, e3, e2, e1, e_bott = enc(x_edge, train)
        bott = jnp.concatenate([bott, e_bott], axis=-1)

        op_sizes = [115, 76, 38, 32]
        y = DualSkipUpBlock(op_sizes[0], self.dtype, name="up_block4")(x4, e4, bott)
        y = DualSkipUpBlock(op_sizes[1], self.dtype, name="up_block3")(x3, e3, y)
        y = DualSkipUpBlock(op_sizes[2], self.dtype, name="up_block2")(x2, e2, y)
        y = DualSkipUpBlock(op_sizes[3], self.dtype, name="up_block1")(x1, e1, y)
        op = ConvBlock(self.chz, 3, dtype=self.dtype, name="final")(y, train)

        el_out = RegressionModule(dtype=self.dtype, name="elReg")(bott)
        return op, el_out, latent
