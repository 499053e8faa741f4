"""Training-time augmentations (host side, numpy/cv2).

Mirrors reference data_augment.py:12-130: a uniform 1-of-8 choice of
  0 LR flip (ellipse angle negated)     4 Gaussian noise sigma in [2, 16)
  1 Gaussian blur sigma in [2, 7)       5 1-9 white reflection lines
  2 gamma LUT {0.6, 0.8, 1.2, 1.4}      6 rotation +-30 deg (params co-rotated)
  3 exposure +-25                       7 no-op
Ellipse params and pupil centers are co-transformed; -1 sentinel annotations
pass through.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def _get_random_line(rng, xc, yc, theta):
    """Reference data_augment.py:132-137."""
    x1 = xc - 50 * rng.rand() * (1 if rng.rand() < 0.5 else -1)
    y1 = (x1 - xc) * np.tan(theta) + yc
    x2 = xc - (150 * rng.rand() + 50) * (1 if rng.rand() < 0.5 else -1)
    y2 = (x2 - xc) * np.tan(theta) + yc
    return x1, y1, x2, y2


def augment(img, mask, pupil_c, el_param, rng=None, choice=None):
    """Apply one random augmentation. el_param = (pupil_param, iris_param)
    ordering follows the reference augment() signature (data_augment.py:12-17).
    """
    rng = rng or np.random
    pupil_param = np.array(el_param[0], np.float64)
    iris_param = np.array(el_param[1], np.float64)
    pupil_c = np.array(pupil_c, np.float64)
    bad_pc = np.all(pupil_c == -1)
    bad_pup = np.all(pupil_param == -1)
    bad_iri = np.all(iris_param == -1)

    idx = rng.randint(0, 8) if choice is None else choice
    out = img
    out_mask = mask

    if idx == 0:  # LR flip
        out = np.fliplr(img)
        out_mask = np.fliplr(mask)
        w = img.shape[1]
        if not bad_pc:
            pupil_c[0] = w - pupil_c[0]
        if not bad_pup:
            pupil_param[0] = w - pupil_param[0]
            pupil_param[-1] = -pupil_param[-1]
        if not bad_iri:
            iris_param[0] = w - iris_param[0]
            iris_param[-1] = -iris_param[-1]
    elif idx == 1:  # Gaussian blur
        sigma = rng.randint(2, 7)
        if _HAS_CV2:
            out = cv2.GaussianBlur(img, (7, 7), sigma)
        else:  # pragma: no cover
            from scipy.ndimage import gaussian_filter

            out = gaussian_filter(img.astype(np.float32), sigma, truncate=3.0 / sigma)
    elif idx == 2:  # gamma LUT
        gamma = [0.6, 0.8, 1.2, 1.4][rng.randint(0, 4)]
        table = (255.0 * (np.linspace(0, 1, 256) ** gamma)).astype(np.float64)
        out = table[img.astype(np.uint8)]
    elif idx == 3:  # exposure
        out = np.clip(img.astype(np.float64) + (50 * rng.rand() - 25), 0, 255)
    elif idx == 4:  # Gaussian noise
        std = 14 * rng.rand() + 2
        out = np.clip(img + rng.normal(0.0, std, img.shape), 0, 255)
    elif idx == 5:  # reflection lines through a pseudo-pupil
        yc, xc = (0.3 + 0.4 * rng.rand()) * np.array(img.shape, np.float64)
        out = np.ascontiguousarray(img).copy()
        n = rng.randint(1, 10)
        for _ in range(n):
            theta = np.pi * rng.rand()
            x1, y1, x2, y2 = _get_random_line(rng, xc, yc, theta)
            if _HAS_CV2:
                out = cv2.line(out, (int(x1), int(y1)), (int(x2), int(y2)),
                               (255, 255, 255), 4)
            else:  # pragma: no cover
                pass
    elif idx == 6:  # rotation
        ang = 30 * 2 * (rng.rand() - 0.5)
        h, w = img.shape
        center = (int(0.5 * w), int(0.5 * h))
        if _HAS_CV2:
            m = cv2.getRotationMatrix2D(center, ang, 1.0)
            out = cv2.warpAffine(img, m, (w, h), flags=cv2.INTER_LANCZOS4)
            out_mask = cv2.warpAffine(mask.astype(np.float64), m, (w, h),
                                      flags=cv2.INTER_NEAREST)
        else:  # pragma: no cover
            from scipy.ndimage import rotate as _rot

            out = _rot(img, ang, reshape=False, order=3)
            out_mask = _rot(mask, ang, reshape=False, order=0)
        ang_rad = np.deg2rad(ang)
        # R.T — image rotation by +ang moves content anticlockwise in pixel
        # coords, so annotations rotate by the transpose (data_augment.py:111-120)
        r = np.array([[np.cos(ang_rad), np.sin(ang_rad)],
                      [-np.sin(ang_rad), np.cos(ang_rad)]])
        ctr = np.array(center, np.float64)
        pupil_c = r @ (pupil_c - ctr) + ctr  # rotates even when -1 (ref behavior)
        pupil_param[:2] = r @ (pupil_param[:2] - ctr) + ctr
        iris_param[:2] = r @ (iris_param[:2] - ctr) + ctr
        if not bad_pup:
            pupil_param[-1] = pupil_param[-1] - ang_rad
        if not bad_iri:
            iris_param[-1] = iris_param[-1] - ang_rad
    # idx == 7: no-op

    return (np.ascontiguousarray(out).astype(np.uint8),
            np.ascontiguousarray(out_mask).astype(np.int64),
            pupil_c,
            (pupil_param, iris_param))
