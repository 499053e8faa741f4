"""Qualitative visualization helpers.

Counterpart of the reference's ``generateImageGrid`` (utils.py:206-399):
a tiled grid of eye images with the predicted segmentation overlaid and
predicted/ground-truth ellipses outlined, used by ``--disp`` and the
TensorBoard prediction images. Headless: returns/saves arrays instead of
driving a live matplotlib window.
"""

from __future__ import annotations

import numpy as np

SEG_COLORS = np.array([[0, 0, 0], [0, 160, 0], [160, 0, 0]], np.int16)
PRED_COLOR = (0, 255, 255)
GT_COLOR = (255, 0, 255)


def _draw_ellipse(canvas, ell, color):
    import cv2

    if ell is None:
        return canvas
    ell = np.asarray(ell, np.float64)
    if not np.all(np.isfinite(ell)) or np.all(ell == -1) or min(ell[2], ell[3]) <= 0:
        return canvas
    return cv2.ellipse(canvas, (int(ell[0]), int(ell[1])),
                       (int(ell[2]), int(ell[3])),
                       np.rad2deg(ell[4]), 0, 360, color, 1, cv2.LINE_AA)


def generate_image_grid(images, preds, targets=None, pred_ellipses=None,
                        gt_ellipses=None, cols: int = 4, max_n: int = 8,
                        alpha: float = 0.45):
    """Tile [B, H, W] gray images with seg overlays + ellipse outlines.

    preds/targets: [B, H, W] int class maps; pred_ellipses/gt_ellipses:
    optional [B, 2, 5] pixel-space (iris, pupil) params. Returns an
    [rows*H, cols*W, 3] uint8 canvas.
    """
    n = min(max_n, len(images))
    tiles = []
    for i in range(n):
        img = np.asarray(images[i], np.float64)
        img = 255 * (img - img.min()) / max(img.max() - img.min(), 1e-6)
        canvas = np.stack([img.astype(np.int16)] * 3, axis=-1)
        overlay = SEG_COLORS[np.clip(np.asarray(preds[i], np.int64), 0, 2)]
        canvas = np.clip(canvas + alpha * overlay, 0, 255).astype(np.uint8)
        canvas = np.ascontiguousarray(canvas)
        if pred_ellipses is not None:
            canvas = _draw_ellipse(canvas, pred_ellipses[i][0], PRED_COLOR)
            canvas = _draw_ellipse(canvas, pred_ellipses[i][1], PRED_COLOR)
        if gt_ellipses is not None:
            canvas = _draw_ellipse(canvas, gt_ellipses[i][0], GT_COLOR)
            canvas = _draw_ellipse(canvas, gt_ellipses[i][1], GT_COLOR)
        if targets is not None:
            edge = np.asarray(preds[i]) != np.asarray(targets[i])
            canvas[edge & (np.asarray(targets[i]) > 0)] = (255, 255, 0)
        tiles.append(canvas)
    h, w, _ = tiles[0].shape
    rows = -(-n // cols)
    grid = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i, t in enumerate(tiles):
        r, c = divmod(i, cols)
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = t
    return grid


def save_image_grid(path: str, *args, **kwargs):
    import cv2

    grid = generate_image_grid(*args, **kwargs)
    cv2.imwrite(path, grid[..., ::-1])  # RGB -> BGR
    return grid
