"""Offline dataset extraction (L0): annotations -> reference-schema H5.

Counterparts of the reference's dataset_generation/ scripts:
  * boundary point extraction from label maps  — helperfunctions.py:445-467
    (``getValidPoints``)
  * RANSAC + ElliFit ellipse fitting           — helperfunctions.py:209-310
  * mask rasterization from ellipses/polygons  — Extract_TEyeD_*:171-186,
    ExtractOpenEDS:166-188
  * color-quantized mask extraction (KMeans)   — ExtractRITEyes:79-155
  * TEyeD ';'-separated annotation parsing     — Extract_TEyeD_*:~100-210

All fitting uses the batched numpy path of :mod:`eghmd_tpu.geometry`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..geometry import ellipse as ell

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def get_valid_points(label: np.ndarray, is_part_seg: bool = True):
    """Pupil / iris boundary points from a {0 bg,1 sclera,2 iris,3 pupil} map.

    Reference helperfunctions.py:445-467: Canny edges of the label map; an
    edge pixel belongs to the pupil boundary if its 3x3 neighborhood contains
    neither background nor sclera, and to the iris boundary if it contains
    neither background nor pupil (part-seg mode).
    """
    lab = np.asarray(label)
    im = np.uint8(255 * lab.astype(np.float32) / max(lab.max(), 1))
    if _HAS_CV2:
        edges = cv2.Canny(im, 50, 100) + cv2.Canny(255 - im, 50, 100)
    else:  # pragma: no cover
        edges = np.zeros_like(im)
        edges[:-1] |= (lab[:-1] != lab[1:]).astype(np.uint8) * 255
        edges[:, :-1] |= (lab[:, :-1] != lab[:, 1:]).astype(np.uint8) * 255
    r, c = np.where(edges)
    pupil_pts, iris_pts = [], []
    h, w = lab.shape
    for y, x in zip(r, c):
        nb = lab[max(y - 1, 0): y + 2, max(x - 1, 0): x + 2]
        if nb.size == 0:
            continue
        bad_pupil = np.any(nb == 0) or np.any(nb == 1)
        if is_part_seg:
            bad_iris = np.any(nb == 0) or np.any(nb == 3)
        else:
            bad_iris = np.any(nb == 3)
        if not bad_pupil:
            pupil_pts.append((x, y))
        if not bad_iris:
            iris_pts.append((x, y))
    pupil_pts = np.asarray(pupil_pts, np.float64) if pupil_pts else np.zeros((0, 2))
    iris_pts = np.asarray(iris_pts, np.float64) if iris_pts else np.zeros((0, 2))
    return pupil_pts, iris_pts


def ransac_ellipse(points: np.ndarray, n_min: int = 15, max_iter: int = 30,
                   thres: float = 0.1, n_good: int = 20,
                   rng: Optional[np.random.RandomState] = None):
    """RANSAC around the batched ElliFit solver.

    Same contract as reference helperfunctions.py:278-310 (``ransac``):
    returns (param [5], mean |residual|); params are [-1]*5 on failure.
    The candidate fits are evaluated as ONE batched least-squares solve.
    """
    rng = rng or np.random.RandomState(0)
    n = points.shape[0]
    if n <= max(n_min, 6 * 2):
        param, _ = ell.ellifit(points[None], np)
        err = float(np.mean(ell.fit_error(points[None], param, np)))
        return param[0], err

    best_param, _ = ell.ellifit(points[None], np)
    best_err = float(np.mean(ell.fit_error(points[None], best_param, np)))
    best_param = best_param[0]
    d = max(n_min, n_good)

    # batched candidate minimal sets
    sets = np.stack([rng.choice(n, n_min, replace=False) for _ in range(max_iter)])
    cand_pts = points[sets]                       # [K, n_min, 2]
    cand_params, _ = ell.ellifit(cand_pts, np)    # [K, 5]
    all_err = ell.fit_error(np.broadcast_to(points, (max_iter, n, 2)),
                            cand_params, np)      # [K, N]
    for k in range(max_iter):
        if np.all(cand_params[k] == -1):
            continue
        inliers = all_err[k] < thres
        if n_min + int(inliers.sum()) - n_min > d or inliers.sum() > d:
            sel = np.union1d(sets[k], np.where(inliers)[0])
            better, _ = ell.ellifit(points[sel][None], np)
            err = float(np.mean(ell.fit_error(points[sel][None], better, np)))
            if err < best_err and not np.all(better[0] == -1):
                best_err = err
                best_param = better[0]
    return best_param, best_err


def fit_mask_ellipses(label: np.ndarray, error_gate: float = 0.1):
    """Label map -> (iris_param, pupil_param) via boundary RANSAC fits.

    Reference ExtractOpenEDS_seg_histo.py:133-162: extract valid boundary
    points, RANSAC+ElliFit, gate on residual error.
    Returns -1 sentinels for classes that fail the gate.
    """
    pupil_pts, iris_pts = get_valid_points(label)
    out = []
    for pts in (iris_pts, pupil_pts):
        if pts.shape[0] < 12:
            out.append(-np.ones(5))
            continue
        param, err = ransac_ellipse(pts)
        out.append(param if err < error_gate else -np.ones(5))
    return out[0], out[1]


def rasterize_noskin_mask(shape: Tuple[int, int], iris_param, pupil_param,
                          eyelid_poly: Optional[np.ndarray] = None):
    """Rebuild a Masks_noSkin map from fitted ellipses (+ optional eyelid clip).

    Reference Extract_TEyeD_LPW_histo.py:171-186 / ExtractOpenEDS:166-188:
    iris ellipse -> 2, pupil ellipse -> 3, pixels outside the eyelid polygon
    cleared to 0 (skin).
    """
    h, w = shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    mask = np.zeros(shape, np.uint8)

    def inside(p):
        dx, dy = xx - p[0], yy - p[1]
        c, s = np.cos(p[4]), np.sin(p[4])
        u = dx * c + dy * s
        v = -dx * s + dy * c
        return (u / p[2]) ** 2 + (v / p[3]) ** 2 <= 1.0

    if not np.all(iris_param == -1):
        mask[inside(iris_param)] = 2
    if not np.all(pupil_param == -1):
        mask[inside(pupil_param)] = 3
    if eyelid_poly is not None and _HAS_CV2 and len(eyelid_poly):
        lid = np.zeros(shape, np.uint8)
        cv2.fillPoly(lid, [np.asarray(eyelid_poly, np.int32)], 1)
        mask[lid == 0] = 0
    return mask


def parse_teyed_annotation_line(line: str, values_per_item: int = 2):
    """Parse one ';'-separated TEyeD annotation row -> (frame_idx, values).

    Reference Extract_TEyeD_*_histo.py: rows are 'FRAME;v0;v1;...;'.
    """
    parts = [p for p in line.strip().split(";") if p != ""]
    frame = int(float(parts[0]))
    vals = np.asarray([float(p) for p in parts[1:]], np.float64)
    if values_per_item > 1 and vals.size % values_per_item == 0:
        vals = vals.reshape(-1, values_per_item)
    return frame, vals


def normalize_angle_deg(angle_deg: float) -> float:
    """Normalize to (-90, 90] degrees then radians, as the extraction scripts
    do (reference Extract_TEyeD_LPW_histo.py:208-213)."""
    a = float(angle_deg) % 180.0
    if a > 90.0:
        a -= 180.0
    return np.deg2rad(a)


def quantize_mask_kmeans(rendered: np.ndarray, n_classes: int = 4, seed: int = 0):
    """Color-quantize a rendered synthetic mask into {bg, sclera, iris, pupil}.

    Reference ExtractRITEyes_general.py:79-155 uses KMeans over colors and
    orders clusters by luminance; we do the same with sklearn KMeans.
    """
    from sklearn.cluster import KMeans

    img = np.asarray(rendered, np.float64)
    if img.ndim == 2:
        img = img[..., None]
    flat = img.reshape(-1, img.shape[-1])
    km = KMeans(n_clusters=n_classes, n_init=4, random_state=seed).fit(
        flat[:: max(1, flat.shape[0] // 20000)]
    )
    labels = km.predict(flat)
    order = np.argsort(km.cluster_centers_.mean(axis=1))[::-1]
    remap = np.empty(n_classes, np.int64)
    remap[order] = np.arange(n_classes)  # brightest -> 0 (bg) ... darkest -> 3
    return remap[labels].reshape(img.shape[:2])
