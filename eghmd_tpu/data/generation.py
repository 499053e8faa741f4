"""Offline dataset-generation drivers (L0): raw datasets -> reference-schema
``<name>.h5`` archives + ``<name>.mat`` master keys.

End-to-end counterparts of the reference's dataset_generation/ scripts:

  * TEyeD video extraction (LPW / Fuhl / NvGaze-AR) —
    Extract_TEyeD_LPW_histo.py:97-301, Extract_TEyeD_FUHL_histo.py:102-230,
    Extract_TEyeD_NvGaze_AR_histo.py:93-190: fixed-interval frame
    subsampling, validity gates, eyelid-polygon clipping, mask
    rasterization (eyeball 1 / iris 2 / pupil 3), axis halving and angle
    normalization to (-90, 90] degrees -> radians.
  * OpenEDS semantic-seg extraction — ExtractOpenEDS_seg_histo.py:85-262:
    crop to eye rows, resize to 640x480, boundary-point RANSAC+ElliFit with
    0.1 error gates, re-rasterized noSkin mask.
  * RIT-Eyes synthetic extraction — ExtractRITEyes_general.py:78-276:
    color-seeded KMeans mask quantization, RANSAC fits with 0.05 gates.
  * datasetSelections — datasetSelections_histo.py:26-41: the pickled
    train/test subset-name dict.

The numeric primitives live in :mod:`eghmd_tpu.data.extraction`; this module
owns the per-dataset drivers and the archive writer.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Iterable, Optional, Sequence, Tuple

import numpy as np

from .extraction import (
    fit_mask_ellipses,
    get_valid_points,
    ransac_ellipse,
)
from ..geometry import ellipse as ell


# ---------------------------------------------------------------------------
# Archive accumulation + writing (reference generateEmptyStorage,
# helperfunctions.py:627-659; save tail e.g. Extract_TEyeD_LPW_histo.py:283-301)
# ---------------------------------------------------------------------------


class ArchiveBuilder:
    """Accumulates samples in the reference's storage layout and writes the
    ``.h5`` archive plus the ``.mat`` master key that
    :func:`eghmd_tpu.data.curriculum.read_archives` consumes."""

    def __init__(self, dataset: str, subset: str, pic_num: Optional[int] = None):
        self.dataset = dataset
        self.subset = subset
        self.pic_num = pic_num
        self.images, self.masks, self.masks_noskin = [], [], []
        self.info, self.pupil_loc = [], []
        self.fits_pupil, self.fits_iris, self.fits_ball = [], [], []
        self.resolution = []

    def __len__(self):
        return len(self.images)

    @property
    def full(self) -> bool:
        return self.pic_num is not None and len(self) >= self.pic_num

    def add(self, image, mask, mask_noskin, info, pupil_loc,
            pupil_fit, iris_fit, ball_fit=None):
        self.images.append(np.asarray(image, np.uint8))
        self.masks.append(np.asarray(mask, np.int8))
        self.masks_noskin.append(np.asarray(mask_noskin, np.int8))
        self.info.append(str(info))
        self.pupil_loc.append(np.asarray(pupil_loc, np.float64))
        self.fits_pupil.append(np.asarray(pupil_fit, np.float64))
        self.fits_iris.append(np.asarray(iris_fit, np.float64))
        if ball_fit is not None:
            self.fits_ball.append(np.asarray(ball_fit, np.float64))
        self.resolution.append(np.asarray(image).shape[:2])

    def save(self, h5_dir: str, mat_dir: Optional[str] = None,
             archive_name: Optional[str] = None) -> Tuple[str, str]:
        """Write ``<archive_name>.h5`` + ``<archive_name>.mat``; returns paths."""
        import h5py
        import scipy.io as scio

        if not self.images:
            raise ValueError("no samples accumulated")
        name = archive_name or self.subset
        mat_dir = mat_dir or h5_dir
        os.makedirs(h5_dir, exist_ok=True)
        os.makedirs(mat_dir, exist_ok=True)
        h5_path = os.path.join(h5_dir, f"{name}.h5")
        mat_path = os.path.join(mat_dir, f"{name}.mat")

        with h5py.File(h5_path, "w") as f:
            f.create_dataset("Images", data=np.stack(self.images))
            f.create_dataset("Masks", data=np.stack(self.masks))
            f.create_dataset("Masks_noSkin", data=np.stack(self.masks_noskin))
            f.create_dataset("pupil_loc", data=np.stack(self.pupil_loc))
            fits = f.create_group("Fits")
            fits.create_dataset("pupil", data=np.stack(self.fits_pupil))
            fits.create_dataset("iris", data=np.stack(self.fits_iris))
            if self.fits_ball:
                fits.create_dataset("ball", data=np.stack(self.fits_ball))
            f.create_dataset("Info",
                             data=np.asarray(self.info, dtype=h5py.string_dtype()))
            f.create_dataset("resolution", data=np.stack(self.resolution))
            f.attrs["dataset"] = self.dataset
            f.attrs["subset"] = self.subset

        scio.savemat(mat_path, {
            "dataset": self.dataset,
            "subset": self.subset,
            "resolution": np.stack(self.resolution),
            "archive": np.asarray([name] * len(self)),
            "pupil_loc": np.stack(self.pupil_loc),
        }, appendmat=True)
        return h5_path, mat_path


# ---------------------------------------------------------------------------
# TEyeD (LPW / Fuhl / NvGaze-AR) — shared per-frame mechanism
# ---------------------------------------------------------------------------


def read_formatted_text(path: str, ignore_lines: int = 0) -> np.ndarray:
    """Read a ';'-separated TEyeD annotation file into a float matrix.

    Reference readFormattedText (Extract_TEyeD_LPW_histo.py:60-71): skip the
    first ``ignore_lines + 1`` lines... actually rows where ``count >
    ignoreLines``; with the default 0 the FIRST line is skipped.
    """
    rows = []
    with open(path, "r") as f:
        for count, line in enumerate(f):
            if count > ignore_lines:
                vals = [float(d) for d in line.split(";")
                        if d.strip() not in ("", "\n")]
                if vals:
                    rows.append(vals)
    n = min(map(len, rows)) if rows else 0
    return np.asarray([r[:n] for r in rows], np.float64)


def eyelid_polygon(lid_row: np.ndarray, scale: float = 1.0) -> np.ndarray:
    """Eyelid polygon from a TEyeD 2-D landmark row.

    Exact index walk of the reference (Extract_TEyeD_LPW_histo.py:160-166):
    indices 2..34 step 2 forward then 68..38 step -2 backward, each an
    (x, y) int pair; Fuhl applies a resolution scale (FUHL:158-163).
    """
    pts = []
    for i in range(2, 35, 2):
        pts.append([int(float(lid_row[i]) * scale), int(float(lid_row[i + 1]) * scale)])
    for i in range(68, 35, -2):
        pts.append([int(float(lid_row[i]) * scale), int(float(lid_row[i + 1]) * scale)])
    return np.asarray(pts, np.int32)


def normalize_teyed_angle(angle_deg: float) -> float:
    """(0, 180] -> (-90, 90] degrees -> radians (reference LPW:208-213)."""
    a = float(angle_deg)
    if a > 90.0:
        a = -(180.0 - a)
    return float(np.deg2rad(a))


def rasterize_teyed_masks(shape: Tuple[int, int], eye_ball, iris, pupil,
                          eyelid_poly: np.ndarray):
    """(mask_inskin, mask_noskin) from TEyeD rows.

    Reference LPW:171-186: eyeball circle -> 1, iris ellipse -> 2, pupil
    ellipse -> 3 (full TEyeD axes are diameters, so cv2 gets axis/2); the
    in-skin mask clears pixels outside the eyelid polygon.
    Rows: eye_ball = [frame, r, cx, cy, ...], iris/pupil =
    [frame, angle_deg, cx, cy, ax_w, ax_h, ...].
    """
    import cv2

    noskin = np.zeros(shape, np.int8)
    cv2.circle(noskin, (int(eye_ball[2]), int(eye_ball[3])), int(eye_ball[1]), 1, -1)
    cv2.ellipse(noskin, (int(iris[2]), int(iris[3])),
                (int(iris[4] / 2), int(iris[5] / 2)), iris[1], 0, 360, 2, -1)
    cv2.ellipse(noskin, (int(pupil[2]), int(pupil[3])),
                (int(pupil[4] / 2), int(pupil[5] / 2)), pupil[1], 0, 360, 3, -1)
    inskin = noskin.copy()
    lid = np.zeros(shape, np.int8)
    cv2.fillPoly(lid, [eyelid_poly], 1)
    inskin[lid == 0] = 0
    return inskin, noskin


def teyed_fit_rows(iris, pupil, eye_ball):
    """(pupil_fit, iris_fit, ball_fit) rows [cx, cy, a, b, theta_rad].

    Axes halved (diameter -> semi-axis) and angles normalized, exactly as
    the reference stores them (LPW:192-218).
    """
    pup = np.array([pupil[2], pupil[3], pupil[4] / 2, pupil[5] / 2,
                    normalize_teyed_angle(pupil[1])])
    iri = np.array([iris[2], iris[3], iris[4] / 2, iris[5] / 2,
                    normalize_teyed_angle(iris[1])])
    ball = np.array([eye_ball[2], eye_ball[3], eye_ball[1], eye_ball[1], 0.0])
    return pup, iri, ball


# Per-variant mechanics (reference per-script constants):
#   LPW    — 130,856 total frames (LPW:97-98), native 640x480, avi videos
#   Fuhl   — 5,000,000 denominator (FUHL:102-104), frames 384-wide, scaled
#            by 640/384 and resized to 640x480 (FUHL:166-175)
#   NVGaze — 2,265,127 denominator (NvGaze:93-95), jpg directories,
#            annotation row fr_num is PRE-incremented (NvGaze:127-140)
TEYED_VARIANTS = {
    "LPW": dict(name="LPW", total=130856, scale=1.0, resize=False, pre_increment=False),
    "Fuhl": dict(name="Fuhl", total=5000000, scale=640.0 / 384.0, resize=True,
                 pre_increment=False),
    "NVGaze": dict(name="NVIDIAAR", total=2265127, scale=1.0, resize=False,
                   pre_increment=True),
}


class TEyeDCounter:
    """Global frame counter shared across videos (reference ``comming``)."""

    def __init__(self):
        self.comming = 0


def extract_teyed_frames(builder: ArchiveBuilder, frames: Iterable,
                         iris_param, pupil_param, eye_ball_param, eye_lid_param,
                         counter: TEyeDCounter, fix_interval: int,
                         scale: float = 1.0, resize: bool = False,
                         pre_increment: bool = False):
    """Run the shared TEyeD per-frame loop over one video's frames.

    ``frames`` yields gray uint8 images. Mirrors LPW:135-222 / FUHL:133-226 /
    NvGaze:126-190 ordering: full-check, interval subsample, validity gates,
    eyelid polygon, rasterize, fits.
    """
    import cv2

    fr_num = 0
    for I in frames:
        if pre_increment:
            fr_num += 1
        row = min(fr_num, len(iris_param) - 1)
        iris_list = np.array(iris_param[row], np.float64)
        pupil_list = np.array(pupil_param[row], np.float64)
        eye_ball_list = np.array(eye_ball_param[row], np.float64)
        eye_lid_list = np.array(eye_lid_param[row], np.float64)
        if not pre_increment:
            fr_num += 1

        if builder.full:
            break
        counter.comming += 1
        if counter.comming % fix_interval != 0:
            continue
        if eye_ball_list[2] < 0 or eye_ball_list[3] < 0 or eye_ball_list[1] < 0:
            continue
        if iris_list[2] < 0 or iris_list[3] < 0:
            continue
        if pupil_list[2] < 0 or pupil_list[3] < 0:
            continue

        lid = eyelid_polygon(eye_lid_list, scale)
        if resize:
            I = cv2.resize(I, (640, 480), interpolation=cv2.INTER_LANCZOS4)
            eye_ball_list[1:4] = eye_ball_list[1:4] * scale
            iris_list[2:6] = iris_list[2:6] * scale
            pupil_list[2:6] = pupil_list[2:6] * scale

        inskin, noskin = rasterize_teyed_masks(I.shape[:2], eye_ball_list,
                                               iris_list, pupil_list, lid)
        pup_fit, iri_fit, ball_fit = teyed_fit_rows(iris_list, pupil_list,
                                                    eye_ball_list)
        builder.add(I, inskin, noskin, str(counter.comming),
                    pupil_list[2:4].copy(), pup_fit, iri_fit, ball_fit)


def iter_video_frames(path: str, gray: bool = True):
    """Decode a video into gray frames (host-side, cv2)."""
    import cv2

    cap = cv2.VideoCapture(path)
    try:
        while True:
            ret, fr = cap.read()
            if not ret:
                break
            if gray and fr.ndim == 3:
                fr = cv2.cvtColor(fr, cv2.COLOR_BGR2GRAY)
            yield fr
    finally:
        cap.release()


def extract_teyed_dataset(variant: str, videos: Sequence[Tuple[str, Dict[str, str]]],
                          pic_num: int = 2500,
                          builder: Optional[ArchiveBuilder] = None) -> ArchiveBuilder:
    """Full TEyeD extraction over (video_path, annotation-paths) pairs.

    ``videos`` items are ``(path_or_frames, {"iris": txt, "pupil": txt,
    "ball": txt, "lid": txt})``. The subsample interval is
    ``total_frames // pic_num`` as in the reference scripts.
    """
    spec = TEYED_VARIANTS[variant]
    fix_interval = max(1, spec["total"] // pic_num)
    if builder is None:
        builder = ArchiveBuilder(spec["name"], f"{spec['name']}_{pic_num}",
                                 pic_num=pic_num)
    counter = TEyeDCounter()
    for src, ann in videos:
        if builder.full:
            break
        frames = iter_video_frames(src) if isinstance(src, str) else src
        extract_teyed_frames(
            builder, frames,
            read_formatted_text(ann["iris"]), read_formatted_text(ann["pupil"]),
            read_formatted_text(ann["ball"]), read_formatted_text(ann["lid"]),
            counter, fix_interval, scale=spec["scale"], resize=spec["resize"],
            pre_increment=spec["pre_increment"],
        )
    return builder


def lpw_file_assignment(path: str) -> Dict[str, str]:
    """Parse LPW-ANNOTATIONS/fileassignement.txt: '1/1' -> '/LPW_1_1'
    (reference LPW:88-93)."""
    out = {}
    with open(path, "r") as f:
        for line in f:
            parts = line.split(".")
            if len(parts) >= 2:
                out[parts[0]] = parts[-2]
    return out


# ---------------------------------------------------------------------------
# OpenEDS (reference ExtractOpenEDS_seg_histo.py:85-262)
# ---------------------------------------------------------------------------


def openeds_crop_resize(image: np.ndarray, label: np.ndarray):
    """Crop to the 300 rows centred on the label extent, resize to 640x480
    (reference OpenEDS:113-121)."""
    import cv2

    r = np.where(label)[0]
    c = int(0.5 * (np.max(r) + np.min(r)))
    top, bot = (0, c + 150 - (c - 150)) if c - 150 < 0 else (c - 150, c + 150)
    I = cv2.resize(image[top:bot, :], (640, 480), interpolation=cv2.INTER_LANCZOS4)
    lab = cv2.resize(label[top:bot, :], (640, 480), interpolation=cv2.INTER_NEAREST)
    return I, lab


def extract_openeds_sample(builder: ArchiveBuilder, image: np.ndarray,
                           label: np.ndarray, info: str,
                           error_gate: float = 0.1) -> bool:
    """One OpenEDS (image, label-map) pair -> archive sample.

    Reference OpenEDS:113-211: crop/resize, boundary RANSAC fits gated at
    0.1, noSkin mask re-rasterized from the fits (iris*2 + pupil -> {2,3}),
    original label map kept as ``Masks``. Returns False if the fits fail.
    """
    I, lab = openeds_crop_resize(image, label)
    iris_param, pupil_param = fit_mask_ellipses(lab, error_gate=error_gate)
    if np.all(iris_param == -1) or np.all(pupil_param == -1):
        return False
    from .extraction import rasterize_noskin_mask

    noskin = rasterize_noskin_mask(I.shape[:2], iris_param, pupil_param)
    if not np.any(noskin == 3) or not np.any(noskin == 2):
        return False
    builder.add(I, lab, noskin, info, pupil_param[:2], pupil_param, iris_param)
    return True


# ---------------------------------------------------------------------------
# RIT-Eyes (reference ExtractRITEyes_general.py:78-276)
# ---------------------------------------------------------------------------

_RITEYES_INIT = np.array([[0, 0, 0],      # background  (black)
                          [0, 0, 255],    # sclera      (blue)
                          [0, 255, 0],    # iris        (green)
                          [255, 0, 0]])   # pupil       (red)


def quantize_riteyes_masks(wskin_rgb: np.ndarray, noskin_rgb: np.ndarray):
    """(mask_inskin, mask_noskin) label maps from rendered RGB masks.

    Reference quantizeMask (ExtractRITEyes_general.py:78-155): KMeans over
    the noSkin RGB seeded at the exact render colors; clusters missing the
    pupil/iris colors shrink the palette (pupil relabelled 3); the in-skin
    map copies the labels and zeroes pixels that are dark in the with-skin
    render (skin).
    """
    from sklearn.cluster import KMeans

    I = np.asarray(noskin_rgb, np.float64)
    r, c, _ = I.shape
    red = np.bitwise_and(I[:, :, 0] >= 248, I[:, :, 1] == 0)
    green = np.bitwise_and(I[:, :, 0] == 0, I[:, :, 1] >= 248)
    has_pupil = np.sum(red) > 20
    has_iris = np.sum(green) > 20

    keep = [0, 1]
    if has_iris:
        keep.append(2)
    if has_pupil:
        keep.append(3)
    init = _RITEYES_INIT[keep]
    km = KMeans(n_clusters=len(init), max_iter=1000, tol=1e-6, n_init=1,
                init=init).fit(I.reshape(-1, 3))
    mask = km.predict(I.reshape(-1, 3))
    # relabel to canonical class ids when the palette shrank
    mask = np.asarray(keep, np.int64)[mask].reshape(r, c)

    w = np.asarray(wskin_rgb, np.float64)
    skin = (w[:, :, 0] < 128) & (w[:, :, 1] < 128) & (w[:, :, 2] < 128)
    inskin = mask.copy()
    inskin[skin] = 0
    return inskin, mask


def extract_riteyes_sample(builder: ArchiveBuilder, image: np.ndarray,
                           wskin_rgb: np.ndarray, noskin_rgb: np.ndarray,
                           info: str, error_gate: float = 0.05) -> bool:
    """One RIT-Eyes rendered triple -> archive sample.

    Reference ExtractRITEyes_general.py:175-226: resize to 640x480, quantize
    masks, RANSAC fits on the noSkin boundaries gated at 0.05, pupil_loc
    from the fit (or the pupil-pixel centroid fallback at :205).
    """
    import cv2

    I = cv2.resize(np.asarray(image, np.uint8), (640, 480),
                   interpolation=cv2.INTER_CUBIC)
    wsk = cv2.resize(np.asarray(wskin_rgb, np.uint8), (640, 480),
                     interpolation=cv2.INTER_NEAREST)
    nsk = cv2.resize(np.asarray(noskin_rgb, np.uint8), (640, 480),
                     interpolation=cv2.INTER_NEAREST)
    inskin, noskin = quantize_riteyes_masks(wsk, nsk)

    pupil_pts, iris_pts = get_valid_points(noskin)
    if pupil_pts.shape[0] < 12 or iris_pts.shape[0] < 12:
        return False
    pup_param, pup_err = ransac_ellipse(pupil_pts)
    iri_param, iri_err = ransac_ellipse(iris_pts)
    if pup_err > error_gate or iri_err > error_gate:
        # (the reference's centroid fallback for pupil_loc, :205, is dead
        # code behind this same gate)
        return False
    builder.add(I, inskin, noskin, info, pup_param[:2], pup_param, iri_param)
    return True


# ---------------------------------------------------------------------------
# datasetSelections (reference datasetSelections_histo.py:26-41)
# ---------------------------------------------------------------------------


def dataset_selections(pic_train: int = 2500, pic_test: int = 11200,
                       riteyes_sets: int = 24) -> Dict:
    train = {
        "NVGaze": [f"NVIDIAAR_{pic_train}"],
        "OpenEDS": [f"OpenEDS_{pic_train}"],
        "LPW": [f"LPW_{pic_train}"],
        "Fuhl": [f"Fuhl_{pic_train}"],
        "riteyes_general": [f"riteyes_general_{i + 1}" for i in range(riteyes_sets)],
    }
    test = {
        "NVGaze": [f"NVIDIAAR_{pic_test}"],
        "OpenEDS": [f"OpenEDS_{pic_test}"],
        "LPW": [f"LPW_{pic_test}"],
        "Fuhl": [f"Fuhl_{pic_test}"],
        "riteyes_general": [f"riteyes_general_{i + 1}"
                            for i in range(riteyes_sets - 1, riteyes_sets)],
    }
    return {"train": train, "test": test}


def write_dataset_selections(path: str, **kwargs) -> Dict:
    sel = dataset_selections(**kwargs)
    with open(path, "wb") as f:
        pickle.dump(sel, f)
    return sel
