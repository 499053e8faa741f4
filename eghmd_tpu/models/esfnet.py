"""ESF-Net — Edge-guided Segmentation & Fitting Network (flax / NHWC).

TPU-native rebuild of the reference "RITnet_v2" DenseNet2D
(reference models/RITnet_v2.py:124-354) with the five edge-fusion variants
selected by :class:`eghmd_tpu.config.VariantConfig`:

  * only_edge     — the edge map replaces the image (:276-278)
  * input_concat  — 2-channel input (:279-280)
  * add_edge      — shared encoder run on the edge map, bottlenecks
                    concatenated 153+153=306 (:283-287); decoder sized
                    [306,180,100,62]->[180,100,62,32] (:184-186)
  * add_seg       — AdaIN: style-encode the softmaxed seg map and re-modulate
                    the instance-normalized bottleneck (:289-308)
  * baseline      — none of the above

Unlike the reference, losses are NOT computed inside the forward pass: the
reference fused them into ``forward`` purely as a ``DataParallel`` workaround
(models/RITnet_v2.py:312-321); under pjit the loss lives in
:mod:`eghmd_tpu.losses`. The model returns ``(op, el_out, latent)``:

  op      [B, H, W, 3]   segmentation logits (bg / iris / pupil)
  el_out  [B, 10]        regressed ellipse params (iris 5 | pupil 5),
                         centers tanh'd, axes sigmoid'd, angles linear
  latent  [B, 153]       spatial mean of the image bottleneck
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import VariantConfig
from .blocks import (
    ConvBlock,
    DenseDownBlock,
    DenseUpBlock,
    LinStack,
    MLP,
    RegressionModule,
    StyleEncoder,
    adain_mean_std,
)

Dtype = Any


def get_sizes(chz: int = 32, growth: float = 1.2, blks: int = 4):
    """Channel bookkeeping (reference models/RITnet_v2.py:15-29).

    For chz=32, growth=1.2: enc inter=[32,64,96,128], enc op=[38,76,115,153],
    enc ip=[32,38,76,115]; dec skip=[243,172,102,64], dec ip=[153,115,76,38],
    dec op=[115,76,38,32].
    """
    inter = [chz * (i + 1) for i in range(blks)]
    op = [int(growth * chz * (i + 1)) for i in range(blks)]
    ip = [chz] + op[:-1]
    dec_skip = [i + j for i, j in zip(ip[::-1], inter[::-1])]
    dec_ip = op[::-1]
    dec_op = op[::-1][1:] + [chz]
    return {
        "enc": {"inter": inter, "op": op, "ip": ip},
        "dec": {"skip": dec_skip, "ip": dec_ip, "op": dec_op},
    }


class DenseEncoder(nn.Module):
    """Head + 4 down blocks + bottleneck (reference models/RITnet_v2.py:124-174)."""

    chz: int = 32
    growth: float = 1.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        sizes = get_sizes(self.chz, self.growth)
        inter, op = sizes["enc"]["inter"], sizes["enc"]["op"]
        x = ConvBlock(self.chz, self.chz, dtype=self.dtype, name="head")(x, train)
        skips = []
        for i in range(4):
            skip, x = DenseDownBlock(
                inter[i], op[i], down_size=2, dtype=self.dtype, name=f"down_block{i + 1}"
            )(x)
            skips.append(skip)
        _, x = DenseDownBlock(
            inter[3], op[3], down_size=0, dtype=self.dtype, name="bottleneck"
        )(x)
        # reference returns (skip_4, skip_3, skip_2, skip_1, x)
        return skips[3], skips[2], skips[1], skips[0], x


class DenseDecoder(nn.Module):
    """4 up blocks + final convBlock -> 3-class logits.

    Reference models/RITnet_v2.py:177-200. Output channel widths follow the
    add_edge override (:184-186) when the bottleneck is 306-wide.
    """

    chz: int = 32
    growth: float = 1.2
    out_c: int = 3
    add_edge: bool = False
    dtype: Dtype = jnp.float32
    seg_downscale: int = 1  # fast-seg: run the last stage(s) below full res

    @nn.compact
    def __call__(self, skip4, skip3, skip2, skip1, x, train: bool = False):
        if self.seg_downscale not in (1, 2, 4, 8):
            raise ValueError(
                f"seg_downscale must be one of 1/2/4/8, got {self.seg_downscale}"
            )
        sizes = get_sizes(self.chz, self.growth)
        op = [180, 100, 62, 32] if self.add_edge else sizes["dec"]["op"]
        x = DenseUpBlock(op[0], dtype=self.dtype, name="up_block4")(skip4, x)
        if self.seg_downscale == 8:
            # all three final stages at /8: the deepest skip the decoder
            # still consumes at native resolution is skip4 (/8)
            skip3 = nn.avg_pool(skip3, (2, 2), strides=(2, 2))
            skip2 = nn.avg_pool(skip2, (4, 4), strides=(4, 4))
            skip1 = nn.avg_pool(skip1, (8, 8), strides=(8, 8))
            x = DenseUpBlock(op[1], dtype=self.dtype, do_upsample=False,
                             name="up_block3")(skip3, x)
            x = DenseUpBlock(op[2], dtype=self.dtype, do_upsample=False,
                             name="up_block2")(skip2, x)
            x = DenseUpBlock(op[3], dtype=self.dtype, do_upsample=False,
                             name="up_block1")(skip1, x)
            return ConvBlock(self.chz, self.out_c, dtype=self.dtype,
                             name="final")(x, train)
        x = DenseUpBlock(op[1], dtype=self.dtype, name="up_block3")(skip3, x)
        if self.seg_downscale == 4:
            # both final stages at reduced resolution: skips are pooled down
            # instead of the features being upsampled
            skip2 = nn.avg_pool(skip2, (2, 2), strides=(2, 2))
            skip1 = nn.avg_pool(skip1, (4, 4), strides=(4, 4))
            x = DenseUpBlock(op[2], dtype=self.dtype, do_upsample=False,
                             name="up_block2")(skip2, x)
            x = DenseUpBlock(op[3], dtype=self.dtype, do_upsample=False,
                             name="up_block1")(skip1, x)
        elif self.seg_downscale == 2:
            skip1 = nn.avg_pool(skip1, (2, 2), strides=(2, 2))
            x = DenseUpBlock(op[2], dtype=self.dtype, name="up_block2")(skip2, x)
            x = DenseUpBlock(op[3], dtype=self.dtype, do_upsample=False,
                             name="up_block1")(skip1, x)
        else:
            x = DenseUpBlock(op[2], dtype=self.dtype, name="up_block2")(skip2, x)
            x = DenseUpBlock(op[3], dtype=self.dtype, name="up_block1")(skip1, x)
        return ConvBlock(self.chz, self.out_c, dtype=self.dtype, name="final")(x, train)


class ESFNet(nn.Module):
    """The full segmentation + ellipse-regression network."""

    setting: VariantConfig
    chz: int = 32
    growth: float = 1.2
    num_datasets: int = 2  # for the dsIdentify disentanglement head
    dtype: Dtype = jnp.float32
    # fast-seg serving mode: decode the seg map at 1/N resolution and
    # bilinearly upsample the 3-channel logits back to full size. Parameters
    # are identical to the full model (checkpoint-compatible); accuracy is
    # gated in tests/test_esfnet_parity.py. Training keeps seg_downscale=1.
    seg_downscale: int = 1
    # fast-input serving mode: average-pool the inputs by 1/N at entry and
    # fold the extra factor into the final logits upsample, so the WHOLE
    # network (encoder + decoder + regressor) runs at reduced resolution
    # while the op/centers interface stays at the full operating size. The
    # serving step is HBM-bandwidth-bound and its bytes are dominated by the
    # early full-res feature maps (BASELINE.md), so /2 cuts activation
    # traffic ~4x. NOT checkpoint-compatible with the full model (the
    # regression head's flatten width changes); like the other serving
    # shortcuts it must be TRAINED through (cli/distill.py) and pass the
    # fidelity gate before serving.
    input_downscale: int = 1
    # rematerialize the encoder/decoder in the backward pass (jax.checkpoint):
    # trades ~1/3 more FLOPs for dropping the stored decoder-concat
    # activations — the 240x320 batch-16 f32 train step OOMs a 16 GB chip
    # without it. Parameter tree is unchanged (checkpoint-compatible).
    remat: bool = False

    @nn.compact
    def __call__(self, x, x_edge, train: bool = False):
        cfg = self.setting
        assert cfg.input_concat + cfg.add_edge < 2, "edge can be used only once"

        if self.input_downscale > 1:
            k = self.input_downscale
            x = nn.avg_pool(x, (k, k), strides=(k, k))
            x_edge = nn.avg_pool(x_edge, (k, k), strides=(k, k))

        if cfg.only_edge:
            x = x_edge
        if cfg.input_concat:
            x = jnp.concatenate([x, x_edge], axis=-1)

        enc_cls = (nn.remat(DenseEncoder, static_argnums=(2,)) if self.remat
                   else DenseEncoder)
        enc = enc_cls(self.chz, self.growth, dtype=self.dtype, name="enc")
        if cfg.add_edge and not train:
            # SAME shared encoder applied to both the image and the edge map
            # (reference :283-287). At inference the two passes are batched
            # into one encoder call — exact: every norm inside the encoder is
            # per-sample (InstanceNorm / eval-mode BatchNorm), so stacking on
            # the batch axis changes nothing. The decoder consumes the IMAGE
            # half's skips.
            b = x.shape[0]
            x4, x3, x2, x1, bott2 = enc(jnp.concatenate([x, x_edge], axis=0),
                                        train)
            x4, x3, x2, x1 = (s[:b] for s in (x4, x3, x2, x1))
            latent = jnp.mean(bott2[:b], axis=(1, 2))  # [B, 153]
            bott = jnp.concatenate([bott2[:b], bott2[b:]], axis=-1)
        else:
            x4, x3, x2, x1, bott = enc(x, train)
            latent = jnp.mean(bott, axis=(1, 2))  # [B, 153]
            if cfg.add_edge:
                # training keeps two passes: the head ConvBlock's BatchNorm
                # accumulates batch statistics per call like the reference
                *_, bott_edge = enc(x_edge, train)
                bott = jnp.concatenate([bott, bott_edge], axis=-1)

        dec_cls = (nn.remat(DenseDecoder, static_argnums=(6,)) if self.remat
                   else DenseDecoder)
        op = dec_cls(
            self.chz, self.growth, out_c=3, add_edge=bool(cfg.add_edge),
            dtype=self.dtype, seg_downscale=self.seg_downscale, name="dec",
        )(x4, x3, x2, x1, bott, train)
        up = self.seg_downscale * self.input_downscale
        if up > 1:
            b, hh, ww, cc3 = op.shape
            op = jax.image.resize(op, (b, hh * up, ww * up, cc3), "bilinear")

        if cfg.add_seg:
            seg = jax.nn.softmax(op, axis=-1)
            if cfg.seg_detach:
                seg = jax.lax.stop_gradient(seg)
            style = StyleEncoder(cfg.style_dim, dtype=self.dtype, name="seg_encoder")(seg)
            feat_c = cfg.bottleneck_channels
            adain = MLP(feat_c * 2, dtype=self.dtype, name="mlp")(style)
            adain = adain.reshape(adain.shape[0], 2, feat_c)
            mean, std = adain_mean_std(bott)
            normalized = (bott - mean) / std
            gamma = adain[:, 0][:, None, None, :]
            beta = adain[:, 1][:, None, None, :]
            bott = normalized * gamma + beta

        el_out = RegressionModule(dtype=self.dtype, name="elReg")(bott)
        return op, el_out, latent

    def ds_identify(self, latent):
        """Dataset-ID head for disentanglement (reference :240-249).

        2-layer linear stack 153 -> 64 -> num_datasets, no activations.
        Parameters are kept OUT of the main optimizer and checkpoints,
        matching reference train.py:146,447.
        """
        return LinStack(64, self.num_datasets, num_layers=2, act=False,
                        dtype=self.dtype, name="dsIdentify_lin")(latent)


class ESFNetWithDS(nn.Module):
    """ESFNet + dsIdentify in a single module (separate param subtree)."""

    setting: VariantConfig
    chz: int = 32
    growth: float = 1.2
    num_datasets: int = 2
    dtype: Dtype = jnp.float32

    def setup(self):
        self.net = ESFNet(self.setting, self.chz, self.growth,
                          self.num_datasets, self.dtype, name="net")
        self.ds_head = LinStack(64, self.num_datasets, num_layers=2, act=False,
                                dtype=self.dtype, name="dsIdentify_lin")

    def __call__(self, x, x_edge, train: bool = False):
        op, el_out, latent = self.net(x, x_edge, train)
        pred_ds = self.ds_head(latent)
        return op, el_out, latent, pred_ds
