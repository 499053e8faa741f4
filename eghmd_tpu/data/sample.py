"""Assemble a full training sample from raw annotations.

Replicates the reference Dataset ``__getitem__`` pipeline
(reference CurriculumLib.py:94-166): pad -> (scale) -> (augment) -> label
remap -> boundary weights -> signed distance maps -> standardize -> ellipse
normalization, emitting NHWC numpy arrays ready for batching.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import numpy as np

from ..geometry import ellipse as ell
from .augment import augment as _augment
from .hostops import boundary_weights, pad_to_size, signed_distance_maps, standardize

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


SAMPLE_KEYS = (
    "image", "edge", "target", "spat_weights", "dist_map", "pupil_center",
    "iris_center", "el_norm", "cond", "im_info",
)


class Sample(NamedTuple):
    image: np.ndarray        # [H, W, 1] float32 standardized
    edge: np.ndarray         # [H, W, 1] float32 edge map in [0,1] (zeros when
                             # the frozen BDCN computes edges inside the step)
    target: np.ndarray       # [H, W] int32 (0 bg / 1 iris / 2 pupil)
    spat_weights: np.ndarray # [H, W] float32
    dist_map: np.ndarray     # [H, W, 3] float32
    pupil_center: np.ndarray # [2] float32 px
    iris_center: np.ndarray  # [2] float32 px
    el_norm: np.ndarray      # [2, 5] float32, iris first, normalized coords
    cond: np.ndarray         # [4] float32, 1 = annotation missing
    im_info: np.ndarray      # [3] int32 (im_num, archive_id, dataset_id)


def _scale_sample(img, label, el_param, pupil_center, scale):
    """Reference CurriculumLib.py:78-89 (``scaleFn``) with its bugs fixed:
    the reference accidentally tests/uses elParam[0] for both entries."""
    dsize = (int(scale * img.shape[1]), int(scale * img.shape[0]))
    H = np.array([[scale, 0, 0], [0, scale, 0], [0, 0, 1]], np.float64)
    if _HAS_CV2:
        img = cv2.resize(img, dsize, interpolation=cv2.INTER_LANCZOS4)
        label = cv2.resize(label.astype(np.int32), dsize, interpolation=cv2.INTER_NEAREST)
    else:  # pragma: no cover
        img = img[:: int(1 / scale), :: int(1 / scale)]
        label = label[:: int(1 / scale), :: int(1 / scale)]
    out = []
    for p in el_param:
        if np.all(p == -1):
            out.append(p)
        else:
            out.append(np.asarray(ell.transform_ellipse(p, H, np)))
    if not np.all(pupil_center == -1):
        pupil_center = pupil_center * scale
    return img, label, out, pupil_center


def assemble_sample(
    img: np.ndarray,              # [H, W] uint8 gray
    mask: np.ndarray,             # [H, W] labels 0 bg/1 sclera/2 iris/3 pupil
    iris_param: np.ndarray,       # [5] px or -1s
    pupil_param: np.ndarray,      # [5] px or -1s
    pupil_center: np.ndarray,     # [2] px or -1s
    cond: np.ndarray,             # [4] bool, 1 = missing
    im_info: Optional[np.ndarray] = None,
    size: Sequence[int] = (480, 640),
    scale: Optional[float] = None,
    aug: bool = False,
    rng: Optional[np.random.RandomState] = None,
    edge: Optional[np.ndarray] = None,
) -> Sample:
    img, mask, (iris_param, pupil_param), pupil_center = pad_to_size(
        img, mask, [iris_param, pupil_param], pupil_center, size
    )
    if scale:
        img, mask, (iris_param, pupil_param), pupil_center = _scale_sample(
            img, mask, [iris_param, pupil_param], pupil_center, scale
        )
    if aug:
        img, mask, pupil_center, (pupil_param, iris_param) = _augment(
            img, mask, pupil_center, (pupil_param, iris_param), rng=rng
        )

    # label remap: sclera -> bg, iris -> 1, pupil -> 2 (CurriculumLib.py:124-125)
    label = np.asarray(mask).copy()
    label[label == 1] = 0
    label[label == 2] = 1
    label[label == 3] = 2

    spat = boundary_weights(label)
    dist = signed_distance_maps(label, 3)
    image = standardize(img)[..., None]

    h, w = label.shape
    Hn = np.array(ell.norm_mat(h, w, np), np.float64)
    _, iris_norm = ell.get_ellipse_info(iris_param, Hn, bool(cond[3]), np)
    _, pupil_norm = ell.get_ellipse_info(pupil_param, Hn, bool(cond[2]), np)
    el_norm = np.stack([iris_norm, pupil_norm], axis=0).astype(np.float32)

    pupil_center = np.asarray(pupil_center, np.float32)
    iris_center = (
        np.asarray(iris_param[:2], np.float32) if not cond[3] else pupil_center.copy()
    )
    if im_info is None:
        im_info = np.zeros(3, np.int32)
    if edge is None:
        edge = np.zeros_like(image)
    return Sample(
        image=image.astype(np.float32),
        edge=np.asarray(edge, np.float32),
        target=label.astype(np.int32),
        spat_weights=spat,
        dist_map=dist,
        pupil_center=pupil_center,
        iris_center=iris_center,
        el_norm=el_norm,
        cond=np.asarray(cond, np.float32),
        im_info=np.asarray(im_info, np.int32),
    )
