"""Pallas TPU kernel: fused DenseNet2D up-block (inference forward).

The decoder's up blocks (reference models/RITnet_v2.py:69-88; flax rebuild
:class:`eghmd_tpu.models.blocks.DenseUpBlock`) dominate the serving path's
HBM traffic: XLA materializes every concat and every conv intermediate at
full resolution (~285 MB/eye for up_block1 alone at 240x320, measured via
cost analysis). This kernel computes the whole block —

    x   = concat(upsampled, skip)          (126 ch for the add_edge variant)
    x1  = lrelu(conv12_3x3(conv11_1x1(x)))
    out = lrelu(conv22_3x3(conv21_1x1(concat(x, x1))))

— reading x once from HBM and writing the output once; every intermediate
(the dense concat, both 1x1 outputs, both 3x3 inputs) lives only in VMEM.
The input IS materialized as one channel-padded concat (Mosaic DMA slices
need 128-aligned channels, and K=128 feeds the MXU fully), which still cuts
this block's HBM traffic ~6x.

Kernel geometry (chosen for what Mosaic can lower without relayouts):
  * grid (B, H/TH); each program DMAs a (TH+4)-row band — 2-row halo each
    side for the two chained 3x3 convs — of the row- AND column-padded
    input, and writes TH output rows.
  * every intermediate is a FLAT [rows * (W+2), C] buffer over the padded
    frame; a 3x3 tap is then a CONTIGUOUS row-slice at offset dy*(W+2)+dx,
    so the convs are 9 plain MXU matmuls with no strided reshapes.
  * SAME-padding is exact: the input carries zero border columns/rows from
    HBM; the 1x1 outputs are masked back to zero outside the image (the
    matmul leaves `bias` there), with masks built from broadcasted_iota.
  * the second 1x1 output is re-aligned from image- to padded-column
    indexing by a one-flat-row shifted store.

Forward-only (serving); training keeps the flax/XLA path.

Status (measured on one v5e chip, up_block1 shapes at batch 64): the first
9-tap design ran 54 ms vs XLA's 28 ms; lane-grouping the dx taps (K = 3*cc
matmuls via offset stores) cut it to 37 ms and double-buffered input DMA to
~32 ms (th=16) — still ~13% behind XLA's conv fusions, so the kernel stays
experimental. Decomposition: per-band DMA ~5 us (hidden), conv11 K=128
matmul ~1 ms total, the two 3x3 convs ~9 ms, remaining fixed per-program
cost (masks, grouped stores, relayouts) dominates. A win likely needs
32-sublane tiles with channels folded 4x into lanes end to end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_LANE = 128


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.01 * x)


def _matmul(a2d, w2d):
    return jax.lax.dot_general(
        a2d, w2d, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _valid_mask(rows, w2, row_lo, row_hi, img_cols, dtype):
    """[rows*w2, 1] mask: 1 where the position holds a real image pixel
    (band row in [row_lo, row_hi), column < img_cols)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, w2, 1), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, w2, 1), 1)
    m = (r >= row_lo) & (r < row_hi) & (c < img_cols)
    return m.astype(dtype).reshape(rows * w2, 1)


def _conv3x3_flat(src3_ref, ktaps_dy, bias, w2, m_out, cc):
    """3x3 conv over a flat padded-frame buffer whose dx taps are PRE-GROUPED
    along lanes (src3_ref[q, dx*cc:(dx+1)*cc] = src[q+dx]): 3 matmuls with
    K = 3*cc instead of 9 with K = cc (~3x better MXU feeding; measured
    13 ms -> 4.5 ms for the up1 conv at batch 64). Output row q corresponds
    to padded position (q // w2, q % w2); entries with column >= w2 - 2 are
    cross-row garbage the caller masks/ignores."""
    acc = bias[...].astype(jnp.float32)
    for dy in range(3):
        ofs = dy * w2
        acc = acc + _matmul(src3_ref[ofs:ofs + m_out, :], ktaps_dy[dy])
    return acc


def _store_dx_grouped(dst3_ref, t, m, cc):
    """Store t [m, cc] into a [m, 3*cc] buffer with dx-shifted lane groups:
    dst3[q, dx*cc:(dx+1)*cc] = t[q+dx] (tail rows zeroed)."""
    dst3_ref[0:m, 0:cc] = t
    dst3_ref[0:m - 1, cc:2 * cc] = t[1:m]
    dst3_ref[0:m - 2, 2 * cc:3 * cc] = t[2:m]
    dst3_ref[m - 1:m, cc:2 * cc] = jnp.zeros((1, cc), dst3_ref.dtype)
    dst3_ref[m - 2:m, 2 * cc:3 * cc] = jnp.zeros((2, cc), dst3_ref.dtype)


def _kernel(x_hbm, k11, b11, k12, b12, k21, b21, k21x1, k22, b22,
            out_ref, x_s, t_s, t2_s, sems,
            *, th, width, cp, cc):
    """One (batch, band) program. x_hbm: [B, H+4, W+2, cp] channel-padded
    concat(up, skip) with 2 zero halo rows top/bottom and 1 zero column
    left/right; scratch row s = image row i*th - 2 + s."""
    hw = th + 4
    w2 = -(-(width + 2) // 8) * 8  # sublane-aligned padded width
    bb = pl.program_id(0)
    i = pl.program_id(1)
    n = pl.num_programs(1)
    nb = pl.num_programs(0)

    # double-buffered input DMA: program k waits on the copy started by
    # program k-1 and prefetches band k+1 while it computes (scratch and
    # semaphores persist across grid iterations)
    k = bb * n + i
    slot = jax.lax.rem(k, 2)

    @pl.when(k == 0)
    def _():
        pltpu.make_async_copy(x_hbm.at[0, pl.ds(0, hw)], x_s.at[0],
                              sems.at[0]).start()

    @pl.when(k + 1 < nb * n)
    def _():
        nk = k + 1
        nslot = jax.lax.rem(nk, 2)
        pltpu.make_async_copy(
            x_hbm.at[jax.lax.div(nk, n), pl.ds(jax.lax.rem(nk, n) * th, hw)],
            x_s.at[nslot], sems.at[nslot]).start()

    pltpu.make_async_copy(x_hbm.at[bb, pl.ds(i * th, hw)], x_s.at[slot],
                          sems.at[slot]).wait()

    x2 = x_s[slot].reshape(hw * w2, cp)

    # ---- conv11 (1x1) -> t, already in padded-column layout --------------
    # (x padded col c = image col c-1, so t is too). Out-of-image positions
    # must be ZERO for conv12's SAME padding — the matmul over zero inputs
    # leaves them at `bias`, so mask rows outside the image and the border
    # columns back to zero.
    t = _matmul(x2, k11[...]) + b11[...].astype(jnp.float32)
    row_lo = jnp.where(i == 0, 2, 0)
    row_hi = jnp.where(i == n - 1, hw - 2, hw)
    r = jax.lax.broadcasted_iota(jnp.int32, (hw, w2, 1), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (hw, w2, 1), 1)
    tmask = (r >= row_lo) & (r < row_hi) & (c >= 1) & (c <= width)
    t = (t * tmask.astype(jnp.float32).reshape(hw * w2, 1)).astype(x_s.dtype)
    _store_dx_grouped(t_s, t, hw * w2, cc)

    # ---- conv12 (3x3) + lrelu -> x1 ---------------------------------------
    # x1 flat row q = (band row q//w2 + 1, IMAGE col q%w2)
    m1 = (th + 2) * w2
    x1 = _lrelu(_conv3x3_flat(t_s, k12, b12, w2, m1, cc)).astype(x_s.dtype)

    # ---- conv21 (1x1 over concat(x, x1)) ----------------------------------
    # x at padded col (q%w2)+1 of band row q//w2+1 is flat offset q + w2 + 1
    t2 = (_matmul(x2[w2 + 1:w2 + 1 + m1, :], k21[...])
          + _matmul(x1, k21x1[...])
          + b21[...].astype(jnp.float32))
    # mask to real pixels (x1/t2 band rows map to image rows i*th-1+s)
    row_lo2 = jnp.where(i == 0, 1, 0)
    row_hi2 = jnp.where(i == n - 1, th + 1, th + 2)
    t2 = (t2 * _valid_mask(th + 2, w2, row_lo2, row_hi2, width, jnp.float32)
          ).astype(x_s.dtype)
    # re-align image-col -> padded-col indexing (one-flat-row shift) while
    # lane-grouping the dx taps: group dx reads t2_pad[q+dx] = t2[q+dx-1]
    t2_s[0:1, 0:cc] = jnp.zeros((1, cc), t2_s.dtype)
    t2_s[1:m1 + 1, 0:cc] = t2
    t2_s[0:m1, cc:2 * cc] = t2
    t2_s[0:m1 - 1, 2 * cc:3 * cc] = t2[1:m1]
    t2_s[m1:, 0:cc] = jnp.zeros((1, cc), t2_s.dtype)
    t2_s[m1:, cc:2 * cc] = jnp.zeros((1, cc), t2_s.dtype)
    t2_s[m1 - 1:, 2 * cc:3 * cc] = jnp.zeros((2, cc), t2_s.dtype)

    # ---- conv22 (3x3) + lrelu -> out band ---------------------------------
    m0 = th * w2
    out = _lrelu(_conv3x3_flat(t2_s, k22, b22, w2, m0, cc))
    out3 = out.astype(out_ref.dtype).reshape(th, w2, cc)
    out_ref[0, :, :, :] = out3[:, 0:width, :]


def fused_up_block(up_full, skip, params, th: int = 8, interpret=None):
    """Fused DenseUpBlock forward.

    up_full: [B, H, W, Cu] — the ALREADY upsampled decoder feature
    (``upsample2x_bilinear(x)``); skip: [B, H, W, Cs]; params: the flax
    DenseUpBlock param subtree ({conv11,conv12,conv21,conv22} x
    {kernel,bias}). Returns [B, H, W, Cc] where Cc = conv22 features.
    """
    b, h, w, cu = up_full.shape
    cs = skip.shape[-1]
    cin = cu + cs
    k11 = params["conv11"]["kernel"][0, 0]            # [cin, cc]
    cc = k11.shape[-1]
    k21 = params["conv21"]["kernel"][0, 0]            # [cin+cc, cc]

    if not _HAS_PALLAS:  # pragma: no cover
        return _reference_up_block(up_full, skip, params)

    assert h % th == 0, (h, th)
    dtype = up_full.dtype
    cp = -(-cin // _LANE) * _LANE  # channel-pad to the 128-lane tiling
    # one concat + channel pad + zero halo rows (2) and border columns
    # (1 left; right padded so the sublane dim is 8-aligned for sliced DMA)
    w2 = -(-(w + 2) // 8) * 8
    x_p = jnp.concatenate([up_full, skip], axis=-1)
    x_p = jnp.pad(x_p, ((0, 0), (2, 2), (1, w2 - w - 1), (0, cp - cin)))

    cast = lambda a: jnp.asarray(a, dtype)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    zpad = lambda k: jnp.pad(k, ((0, cp - cin), (0, 0)))
    k11p = cast(zpad(k11))
    k21p = cast(zpad(k21[:cin]))
    k21x1 = cast(k21[cin:])
    # tap kernels grouped by dy with the 3 dx taps stacked along K
    # (matching the lane-grouped activation layout): [3, 3*cc, cc]
    k12 = cast(params["conv12"]["kernel"].reshape(3, 3 * cc, cc))
    k22 = cast(params["conv22"]["kernel"].reshape(3, 3 * cc, cc))
    b11 = f32(params["conv11"]["bias"])
    b12 = f32(params["conv12"]["bias"])
    b21 = f32(params["conv21"]["bias"])
    b22 = f32(params["conv22"]["bias"])

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    kern = functools.partial(_kernel, th=th, width=w, cp=cp, cc=cc)
    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kern,
        grid=(b, h // th),
        in_specs=[
            # ANY-space blocks cover the whole array; the kernel DMAs its
            # own (batch, band) slice
            pl.BlockSpec(memory_space=pltpu.ANY),
            vspec(), vspec(), vspec(), vspec(),
            vspec(), vspec(), vspec(), vspec(), vspec(),
        ],
        out_specs=pl.BlockSpec((1, th, w, cc), lambda bb, ii: (bb, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cc), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 4, w2, cp), dtype),  # double-buffered input
            pltpu.VMEM(((th + 4) * w2, 3 * cc), dtype),
            pltpu.VMEM(((th + 2) * w2 + 1, 3 * cc), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x_p, k11p, b11, k12, b12, k21p, b21, k21x1, k22, b22)


def _reference_up_block(up_full, skip, params):
    """jnp oracle with identical math (the flax DenseUpBlock body,
    models/blocks.py:116-135, minus the upsample)."""
    def conv(x, kern, bias, k):
        return jax.lax.conv_general_dilated(
            x, kern, (1, 1), [(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias

    p = params
    x = jnp.concatenate([up_full, skip], -1)
    t = conv(x, p["conv11"]["kernel"], p["conv11"]["bias"], 1)
    x1 = _lrelu(conv(t, p["conv12"]["kernel"], p["conv12"]["bias"], 3))
    x21 = jnp.concatenate([x, x1], -1)
    t2 = conv(x21, p["conv21"]["kernel"], p["conv21"]["bias"], 1)
    return _lrelu(conv(t2, p["conv22"]["kernel"], p["conv22"]["bias"], 3))
