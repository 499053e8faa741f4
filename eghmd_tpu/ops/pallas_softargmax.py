"""Pallas TPU kernel: fused spatial soft-argmax (center of mass).

The seg->center extraction (reference loss.py:16-46) is softmax over the
flattened H*W map times the normalized meshgrid, reduced to 2 coordinates.
The XLA lowering materializes the [B, H*W] softmax in HBM between the
normalization and the two weighted reductions; this kernel computes
max / exp / three weighted sums in ONE pass over VMEM-resident tiles,
so each logit map is read exactly once from HBM.

Used by the serving path; the jnp reference implementation
(:func:`eghmd_tpu.losses.point.seg_to_pt_loss`) remains the autodiff path
for training (the kernel is forward-only).
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

from ..geometry.points import create_meshgrid


def _kernel(op_ref, xloc_ref, yloc_ref, out_ref, *, temperature):
    x = op_ref[:] * temperature                    # [TB, HW]
    m = jnp.max(x, axis=1, keepdims=True)
    e = jnp.exp(x - m)
    s = jnp.sum(e, axis=1)                         # [TB]
    sx = jnp.sum(e * xloc_ref[:], axis=1)
    sy = jnp.sum(e * yloc_ref[:], axis=1)
    out_ref[:] = jnp.stack([sx / s, sy / s], axis=1)


@functools.partial(jax.jit, static_argnums=(1,))
def soft_argmax_2d(op_channel, temperature: float = 4.0):
    """[B, H, W] logits -> [B, 2] normalized (x, y) center of mass.

    Numerically identical (up to fp assoc.) to the softmax-expectation in
    seg_to_pt_loss; returns only the predicted points.
    """
    b, h, w = op_channel.shape
    hw = h * w
    grid_pts = create_meshgrid(h, w, True, jnp, dtype=op_channel.dtype)
    xloc = grid_pts[..., 0].reshape(1, hw)
    yloc = grid_pts[..., 1].reshape(1, hw)
    flat = op_channel.reshape(b, hw)

    if not _HAS_PALLAS or _FORCE_REFERENCE:
        return _reference(flat, xloc, yloc, temperature)

    # Mosaic requires the second-to-last block dim divisible by 8 (or equal
    # to the array dim): pad the batch up to a multiple of the tile. The
    # padded rows are all-zero logits — constant softmax, discarded below.
    tb = 8
    pad = (-b) % tb
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
    kernel = functools.partial(_kernel, temperature=temperature)

    def run(interpret, flat, xloc, yloc):
        return pl.pallas_call(
            kernel,
            grid=((b + pad) // tb,),
            in_specs=[
                pl.BlockSpec((tb, hw), lambda i: (i, 0)),
                pl.BlockSpec((1, hw), lambda i: (0, 0)),
                pl.BlockSpec((1, hw), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((tb, 2), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((b + pad, 2), op_channel.dtype),
            interpret=interpret,
        )(flat, xloc, yloc)

    # per-platform lowering (resolved statically under single-platform jit)
    # so multi-platform `jax.export` artifacts work: the compiled Mosaic
    # kernel on TPU, interpret mode elsewhere.
    out = jax.lax.platform_dependent(
        flat, xloc, yloc,
        tpu=functools.partial(run, False),
        default=functools.partial(run, True),
    )
    return out[:b]


def _reference(flat, xloc, yloc, temperature):
    wt = jax.nn.softmax(flat * temperature, axis=-1)
    return jnp.stack([jnp.sum(wt * xloc[0], -1), jnp.sum(wt * yloc[0], -1)], axis=-1)


_FORCE_REFERENCE = False


@contextlib.contextmanager
def reference_softargmax():
    """Trace with the plain-XLA soft-argmax instead of the Pallas kernel.

    Needed for multi-platform ``jax.export`` artifacts: pallas_call's CPU
    lowering rule rejects compiled (non-interpret) kernels even inside the
    TPU branch of ``lax.platform_dependent``, so a portable artifact must
    avoid the kernel entirely. The XLA path is numerically identical up to
    float association.
    """
    global _FORCE_REFERENCE
    prev, _FORCE_REFERENCE = _FORCE_REFERENCE, True
    try:
        yield
    finally:
        _FORCE_REFERENCE = prev


def seg_centers(op, temperature: float = 4.0, differentiable: bool = False):
    """Serving-path center extraction: [B, H, W, 3] seg logits ->
    [B, 2, 2] normalized (iris, pupil) soft-argmax centers.

    The iris center is the soft-argmax of the NEGATED background channel and
    the pupil center that of the pupil channel — exactly the centers
    ``compute_all_losses`` derives during training (reference
    models/RITnet_v2.py:387-417), without any of the loss math. Both
    channels go through ONE fused kernel call (stacked on the batch axis).
    Computed in float32: at bf16 the softmax expectation loses ~1px of
    center precision.

    ``differentiable=True`` routes through the plain-XLA softmax
    expectation instead of the forward-only Pallas kernel — required when
    gradients must flow through the centers (the center KD term in
    :mod:`eghmd_tpu.training.distill`).
    """
    b, h, w = op.shape[0], op.shape[1], op.shape[2]
    stacked = jnp.concatenate(
        [-op[..., 0].astype(jnp.float32), op[..., 2].astype(jnp.float32)], axis=0
    )
    if differentiable:
        grid_pts = create_meshgrid(h, w, True, jnp, dtype=stacked.dtype)
        hw = h * w
        pts = _reference(stacked.reshape(2 * b, hw),
                         grid_pts[..., 0].reshape(1, hw),
                         grid_pts[..., 1].reshape(1, hw), temperature)
    else:
        pts = soft_argmax_2d(stacked, temperature)
    return jnp.stack([pts[:b], pts[b:]], axis=1)
