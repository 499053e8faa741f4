"""On-device overlay rendering for the video pipeline.

The reference draws its result overlays per frame on the host
(``plot_segmap_ellpreds``, reference helperfunctions.py:521-622: seg-class
fills + ``cv2.ellipse`` outlines) — ~2 ms/eye of host work, which caps ONE
host core near 500 eyes/s, well below a chip's serving throughput
(BASELINE.md). TPU-natively the overlay is a batched elementwise program:
class fills are ``where`` selects, and an anti-aliased ellipse outline is a
first-order (Sampson) distance band of the implicit ellipse equation
evaluated on the pixel grid. Rendering then rides the serving step's jit
computation and the host only encodes.

Also here: the device counterpart of the reference's geometry restoration
(``rescale_to_original``, reference evaluate.py:169-192) that pads the
chopped rows back and nearest-resizes the seg/edge maps to the original
eye size BEFORE drawing — the step the per-frame host path must mirror for
the overlay and the ellipses to stay vertically aligned.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# BGR fills/lines, reference helperfunctions.py:534,536,612-615
IRIS_FILL = (120, 183, 53)
PUPIL_FILL = (36, 231, 253)
IRIS_LINE = (255, 0, 0)
PUPIL_LINE = (0, 0, 255)


def ellipse_distance_field(hw: Tuple[int, int], els_px):
    """Approximate pixel distance to each ellipse outline.

    ``els_px`` [B, 5] = (cx, cy, a, b, theta) in pixel coords. Returns
    [B, H, W] float32: the first-order (Sampson) distance of each pixel to
    the ellipse curve — ``G/|grad G|`` for ``G(u,v) = (u/a)^2 + (v/b)^2 - 1``
    in the ellipse frame. Exact on the axes, a good band approximation
    everywhere else; all elementwise math (no matmuls — geometry convention,
    see eghmd_tpu/geometry/ellipse.py).
    """
    h, w = hw
    ys, xs = jnp.mgrid[0:h, 0:w]
    xs = xs.astype(jnp.float32)[None]
    ys = ys.astype(jnp.float32)[None]
    cx = els_px[:, 0, None, None]
    cy = els_px[:, 1, None, None]
    a = jnp.maximum(els_px[:, 2, None, None], 1e-3)
    b = jnp.maximum(els_px[:, 3, None, None], 1e-3)
    th = els_px[:, 4, None, None]
    dx = xs - cx
    dy = ys - cy
    ct, st = jnp.cos(th), jnp.sin(th)
    u = ct * dx + st * dy
    v = -st * dx + ct * dy
    g = (u / a) ** 2 + (v / b) ** 2 - 1.0
    grad = 2.0 * jnp.sqrt((u / (a * a)) ** 2 + (v / (b * b)) ** 2)
    return jnp.abs(g) / jnp.maximum(grad, 1e-6)


def _valid(els_px):
    """[B] bool: finite params with positive axes (host guard
    ``plot_segmap_ellpreds``: np.isfinite + a,b > 0)."""
    finite = jnp.all(jnp.isfinite(els_px), axis=-1)
    return finite & (els_px[:, 2] > 0) & (els_px[:, 3] > 0)


def render_overlay_batch(gray_eyes, seg_full, iris_px, pupil_px,
                         line_halfwidth: float = 0.75):
    """Batched overlay frames, all on device.

    gray_eyes [B, H, W] (uint8/float, original eye resolution), seg_full
    [B, H, W] int (classes at the SAME resolution — restore geometry first,
    :func:`restore_map_geometry`), iris_px/pupil_px [B, 5] in original
    pixel coords. Returns [B, H, W, 3] uint8 BGR like the host renderer
    (reference helperfunctions.py:521-622): iris/pupil class fills, then
    iris outline in blue, pupil outline in red, ~1.5 px anti-aliased band.
    """
    gray = gray_eyes.astype(jnp.float32)[..., None]
    out = jnp.broadcast_to(gray, (*gray_eyes.shape, 3))
    seg = seg_full[..., None]
    out = jnp.where(seg == 1, jnp.asarray(IRIS_FILL, jnp.float32), out)
    out = jnp.where(seg == 2, jnp.asarray(PUPIL_FILL, jnp.float32), out)
    for els, color in ((iris_px, IRIS_LINE), (pupil_px, PUPIL_LINE)):
        els = els.astype(jnp.float32)
        ok = _valid(els)[:, None, None, None]
        safe = jnp.where(jnp.isfinite(els), els, 0.0)
        d = ellipse_distance_field(gray_eyes.shape[1:], safe)
        # anti-aliased coverage ramp around the curve
        cov = jnp.clip(line_halfwidth + 0.5 - d, 0.0, 1.0)[..., None] * ok
        out = out * (1.0 - cov) + jnp.asarray(color, jnp.float32) * cov
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def restore_map_geometry(maps, scale_shift, orig_hw: Tuple[int, int],
                         method: str = "nearest"):
    """Undo the serving preprocess on per-pixel maps, on device.

    Reference evaluate.py:179-192 (``rescale_to_original``): when rows were
    chopped (pad < 0) the map gets ``-pad//2`` background rows padded back
    on each side, then a nearest resize to the original eye size. (The
    reference's pad > 0 branch passes negative widths to ``np.pad`` and
    would raise — dead code for every real eye geometry; here pad > 0
    removes the padded rows, the sane inverse.) ``maps`` is [B, h, w]
    (seg classes or edge intensities); scale/pad are static Python numbers
    from :func:`preprocess_frames`.
    """
    sc, pad = scale_shift
    b = maps.shape[0]
    x = maps
    if pad < 0:
        k = (-pad) // 2
        x = jnp.pad(x, ((0, 0), (k, k), (0, 0)))
    elif pad > 0:
        lo = pad // 2
        x = x[:, lo: lo + maps.shape[1] - pad, :]
    oh, ow = orig_hw
    if x.shape[1:] != (oh, ow):
        x = jax.image.resize(x, (b, oh, ow), method=method)
    return x
