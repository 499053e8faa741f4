"""Frame preprocessing for the video/serving path — on device, batched.

Counterpart of reference evaluate.py:69-104 (``preprocess_frame``): width-
align resize to 320, vertical pad/chop to 240, per-image standardization —
but vectorized over a whole batch of frames inside jit instead of per-frame
host numpy.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


def split_dual_eye(frames):
    """Dual-eye frames [B, H, W>=640] -> (left [B, H, 320], right [B, H, 320]).

    Reference evaluate.py:242-243 splits at x=320.
    """
    return frames[:, :, :320], frames[:, :, 320:640]


@partial(jax.jit, static_argnums=(1,))
def preprocess_frames(frames, op_shape: Tuple[int, int] = (240, 320)):
    """[B, H, W] uint8/float frames -> ([B, h, w, 1] standardized, scale_shift).

    scale_shift = (scale, pad) with the reference's sign convention
    (pad > 0: vertically padded; pad < 0: rows chopped).
    """
    b, h, w = frames.shape
    oh, ow = op_shape
    x = frames.astype(jnp.float32)
    sc = ow / w
    nh = int(h * sc)
    if w != ow:
        x = jax.image.resize(x, (b, nh, ow), method="lanczos3")
    pad = oh - nh
    if pad > 0:
        lo, hi = pad // 2, pad - pad // 2
        x = jnp.pad(x, ((0, 0), (lo, hi), (0, 0)))
    elif pad < 0:
        lo = (-pad) // 2
        x = x[:, lo: lo + oh, :]
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    std = jnp.std(x, axis=(1, 2), keepdims=True)
    x = (x - mean) / std
    return x[..., None], (sc, pad)


def rescale_ellipse_to_original(el_px, scale_shift):
    """Map a (240, 320)-space pixel ellipse back to original frame coords.

    Reference evaluate.py:169-181 (``rescale_to_original``, ellipse part):
    undo the vertical pad then the width-align scale.
    """
    sc, pad = scale_shift
    el = np.array(el_px, np.float64)
    el[..., 1] = el[..., 1] - np.floor(pad // 2)
    el[..., :4] = el[..., :4] / sc
    return el
