"""ritnet_noreg — RITnet_v2 without the AdaIN machinery (flax / NHWC).

Counterpart of reference models/ritnet_noreg.py (a near-copy of RITnet_v2
kept as an experiment artifact, unused by the reference drivers): identical
encoder/decoder/regressor and fusion variants, but the StyleEncoder/MLP
(AdaIN) branch is never constructed — selecting ``add_seg`` is rejected,
matching the reference where the attributes simply don't exist
(its __init__ lacks the seg_encoder/mlp block present in RITnet_v2.py).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..config import VariantConfig
from .esfnet import DenseDecoder, DenseEncoder
from .blocks import RegressionModule


class RITnetNoReg(nn.Module):
    """ESF-Net topology minus the AdaIN path."""

    setting: VariantConfig
    chz: int = 32
    growth: float = 1.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, x_edge, train: bool = False):
        cfg = self.setting
        assert cfg.input_concat + cfg.add_edge < 2, "edge can be used only once"
        assert not cfg.add_seg, (
            "ritnet_noreg has no AdaIN (seg_encoder/mlp) machinery "
            "(reference models/ritnet_noreg.py never constructs it)"
        )
        if cfg.only_edge:
            x = x_edge
        if cfg.input_concat:
            x = jnp.concatenate([x, x_edge], axis=-1)

        enc = DenseEncoder(self.chz, self.growth, dtype=self.dtype, name="enc")
        x4, x3, x2, x1, bott = enc(x, train)
        latent = jnp.mean(bott, axis=(1, 2))
        if cfg.add_edge:
            *_, bott_edge = enc(x_edge, train)
            bott = jnp.concatenate([bott, bott_edge], axis=-1)

        op = DenseDecoder(
            self.chz, self.growth, out_c=3, add_edge=bool(cfg.add_edge),
            dtype=self.dtype, name="dec",
        )(x4, x3, x2, x1, bott, train)
        el_out = RegressionModule(dtype=self.dtype, name="elReg")(bott)
        return op, el_out, latent
