"""Synthetic near-eye dataset with exact ellipse ground truth.

There are no real H5 datasets or pretrained weights in this image (the
reference's large blobs are missing), so this module provides a fully
synthetic stand-in that produces the SAME sample schema as the real pipeline:
gray IR-like eye images with an elliptical iris+pupil, sclera/eyelid
occlusion, known ellipse fits, pupil centers, and the 4-bool ``cond`` vector.
It powers the overfit smoke tests (the reference's own QA strategy,
reference train.py:208-212), the benchmark, and end-to-end drivers.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .sample import Sample, assemble_sample


def _ellipse_mask(h, w, cx, cy, a, b, theta):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    dx, dy = xx - cx, yy - cy
    c, s = np.cos(theta), np.sin(theta)
    u = dx * c + dy * s
    v = -dx * s + dy * c
    return (u / a) ** 2 + (v / b) ** 2 <= 1.0


def render_eye(rng: np.random.RandomState, h: int = 240, w: int = 320):
    """Render one synthetic eye. Returns (img u8, mask {0,1,2,3}, iris_param,
    pupil_param, pupil_center) with the reference's raw mask convention
    (0 bg / 1 sclera / 2 iris / 3 pupil)."""
    cx = rng.uniform(0.35 * w, 0.65 * w)
    cy = rng.uniform(0.35 * h, 0.65 * h)
    iris_a = rng.uniform(0.22 * w, 0.30 * w)
    iris_b = iris_a * rng.uniform(0.8, 1.0)
    iris_t = rng.uniform(-0.4, 0.4)
    pupil_a = iris_a * rng.uniform(0.25, 0.5)
    pupil_b = pupil_a * rng.uniform(0.85, 1.0)
    pupil_t = rng.uniform(-0.6, 0.6)
    pcx = cx + rng.uniform(-2, 2)
    pcy = cy + rng.uniform(-2, 2)

    # skin/sclera background with a soft gradient
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = 150 + 40 * (xx / w - 0.5) + 25 * (yy / h - 0.5)
    img += rng.normal(0, 4, img.shape)

    sclera = _ellipse_mask(h, w, cx, cy, 0.45 * w, 0.28 * h, 0.0)
    iris = _ellipse_mask(h, w, cx, cy, iris_a, iris_b, iris_t)
    pupil = _ellipse_mask(h, w, pcx, pcy, pupil_a, pupil_b, pupil_t)

    img[sclera] = 190 + rng.normal(0, 3, int(sclera.sum()))
    img[iris] = 95 + 18 * np.sin(6 * np.arctan2(yy - cy, xx - cx))[iris]
    img[pupil] = 28 + rng.normal(0, 2, int(pupil.sum()))
    # specular glint
    gx, gy = int(pcx + rng.uniform(-8, 8)), int(pcy + rng.uniform(-8, 8))
    glint = _ellipse_mask(h, w, gx, gy, 3.0, 3.0, 0.0)
    img[glint] = 250

    mask = np.zeros((h, w), np.int64)
    mask[sclera] = 1
    mask[iris & sclera] = 2
    mask[pupil & sclera] = 3

    iris_param = np.array([cx, cy, iris_a, iris_b, iris_t], np.float64)
    pupil_param = np.array([pcx, pcy, pupil_a, pupil_b, pupil_t], np.float64)
    pupil_center = np.array([pcx, pcy], np.float64)
    return np.clip(img, 0, 255).astype(np.uint8), mask, iris_param, pupil_param, pupil_center


def degrade_image(img: np.ndarray, rng: np.random.RandomState,
                  strength: float) -> np.ndarray:
    """Photometric degradation with GT kept exact: contrast compression,
    defocus blur, sensor noise, and an illumination vignette, each scaled by
    ``strength`` in [0, 1].

    The clean renderer's intensity separation (sclera 190 / iris 95 /
    pupil 28) makes segmentation saturate — a no-edge net matches the
    edge-guided one at convergence (BASELINE.md). This mode weakens the
    boundary evidence in the IMAGE while labels/ellipses stay exact, which
    is the regime the reference paper motivates edge guidance for (low
    contrast / defocused near-eye IR frames)."""
    out = img.astype(np.float32)
    mean = float(out.mean())
    out = mean + (out - mean) * (1.0 - strength * rng.uniform(0.5, 0.75))
    sigma = strength * rng.uniform(1.0, 2.5)
    if sigma > 1e-3:
        try:
            import cv2

            out = cv2.GaussianBlur(out, (0, 0), sigma)
        except Exception:  # pragma: no cover
            from scipy import ndimage

            out = ndimage.gaussian_filter(out, sigma)
    h, w = out.shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cx, cy = rng.uniform(0.3 * w, 0.7 * w), rng.uniform(0.3 * h, 0.7 * h)
    r2 = ((xx - cx) / w) ** 2 + ((yy - cy) / h) ** 2
    out *= 1.0 - strength * rng.uniform(0.2, 0.45) * r2 / max(r2.max(), 1e-6)
    out += rng.normal(0.0, strength * rng.uniform(8.0, 18.0), out.shape)
    return np.clip(out, 0, 255).astype(np.uint8)


def render_edge_map(target: np.ndarray) -> np.ndarray:
    """Ground-truth 'BDCN-like' edge map from a remapped label map [H, W].

    Boundaries of iris and pupil regions as a soft edge image in [0, 1] —
    a stand-in for the frozen BDCN output when its weights are unavailable
    (only the fused map is consumed downstream, reference utils.py:649).
    """
    lab = target.astype(np.int32)
    edge = np.zeros(lab.shape, np.float32)
    diff = np.zeros(lab.shape, bool)
    diff[:-1] |= lab[:-1] != lab[1:]
    diff[:, :-1] |= lab[:, :-1] != lab[:, 1:]
    edge[diff] = 1.0
    try:
        import cv2

        edge = cv2.GaussianBlur(edge, (5, 5), 1.0)
        m = edge.max()
        if m > 0:
            edge = edge / m
    except Exception:  # pragma: no cover
        pass
    return edge[..., None].astype(np.float32)


class SyntheticEyeDataset:
    """Iterable dataset of fully-annotated synthetic samples."""

    def __init__(self, n: int = 256, size: Tuple[int, int] = (240, 320),
                 aug: bool = False, seed: int = 0,
                 missing_mask_frac: float = 0.0, cache: bool = True,
                 degrade: float = 0.0):
        self.n = n
        self.size = size
        self.aug = aug
        self.seed = seed
        self.missing_mask_frac = missing_mask_frac
        self.degrade = degrade
        # Every sample is a deterministic function of (seed, idx) — the RNG
        # is re-seeded per index, including the augmentation draws — so
        # caching is semantics-preserving. It removes the ~0.3 s/sample of
        # host render+EDT work from every epoch after the first (this box
        # has ONE core; a 128-sample epoch costs ~40 s uncached). The cache
        # is bounded at ~2 GB of sample payload so big serving-size datasets
        # do not pin unbounded host RAM for the process lifetime.
        self._cache: dict = {} if cache else None
        self._cache_bytes = 0
        self._cache_limit_bytes = 2 << 30

    def __len__(self):
        return self.n

    def __getitem__(self, idx) -> Sample:
        if self._cache is not None and idx in self._cache:
            return self._cache[idx]
        s = self._make(idx)
        if self._cache is not None and self._cache_bytes < self._cache_limit_bytes:
            self._cache[idx] = s
            self._cache_bytes += sum(
                a.nbytes for a in s if isinstance(a, np.ndarray))
        return s

    def _make(self, idx) -> Sample:
        rng = np.random.RandomState(self.seed * 100003 + idx)
        h, w = self.size
        img, mask, iris_p, pupil_p, pupil_c = render_eye(rng, h, w)
        if self.degrade > 0.0:
            # salted RNG: degrade draws never perturb the base sample stream
            drng = np.random.RandomState(self.seed * 100003 + idx + 777000007)
            img = degrade_image(img, drng, self.degrade)
        missing = rng.rand() < self.missing_mask_frac
        if missing:
            mask = -np.ones_like(mask)
            iris_p = -np.ones(5)
            pupil_p = -np.ones(5)
            cond = np.array([0, 1, 1, 1], bool)
            mask = np.zeros_like(mask)  # raw mask unused when cond[1]
        else:
            cond = np.array([0, 0, 0, 0], bool)
        s = assemble_sample(
            img, mask, iris_p, pupil_p, pupil_c, cond,
            im_info=np.array([idx, 0, idx % 2], np.int32),
            size=self.size, scale=None, aug=self.aug, rng=rng,
        )
        # ground-truth edge map stands in for the frozen BDCN output
        return s._replace(edge=render_edge_map(s.target))
