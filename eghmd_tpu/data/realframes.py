"""Real-video eye crops as a host-side training-data source.

The only real data shipped anywhere in this environment is the reference's
demo clip (``videos/example1.avi`` — its serving config hardcodes that clip,
reference evaluate.py:357-358). Distillation needs no labels, so these
frames can join a student's training set directly: the teacher pseudo-labels
them (see ``training.distill.pseudo_label_real_samples``) and the resulting
fully-annotated :class:`~eghmd_tpu.data.sample.Sample` objects mix freely
with synthetic ones.

This module does the host side only: decode, dual-eye split (reference
evaluate.py:242-243), and the serving-geometry preprocess (width-align
resize + vertical center pad/chop, reference evaluate.py:69-104) — emitting
raw ``uint8`` eye crops. Standardization and teacher inference happen in the
pseudo-labeling step so the crops stay cheap to cache.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def eyes_from_frames(frames: np.ndarray,
                     eye_size: Tuple[int, int] = (240, 320)) -> np.ndarray:
    """Gray frames ``[N, H, W]`` -> eye crops ``[N or 2N, h, w]`` uint8.

    Frames at least twice the eye width are split into (left, right) eyes at
    the midline (the reference splits its 640-wide frames at x=320,
    evaluate.py:242-243). Each eye is width-aligned to ``w`` by resize and
    vertically center-padded/chopped to ``h`` — the exact serving preprocess
    (reference evaluate.py:69-104, mirrored on device by
    ``inference.preprocess.preprocess_frames``).
    """
    frames = np.asarray(frames)
    if frames.ndim != 3:
        raise ValueError(f"expected [N, H, W] gray frames, got {frames.shape}")
    oh, ow = eye_size
    eyes = []
    for fr in frames:
        if fr.shape[1] >= 2 * ow:
            halves = (fr[:, :ow], fr[:, ow: 2 * ow])
        else:
            halves = (fr,)
        for eye in halves:
            h, w = eye.shape
            if w != ow:
                try:
                    import cv2

                    sc = ow / w
                    eye = cv2.resize(eye, (ow, int(h * sc)),
                                     interpolation=cv2.INTER_LANCZOS4)
                except Exception:  # pragma: no cover - cv2 is in the image
                    step = max(1, w // ow)
                    eye = eye[::step, :ow]
                h = eye.shape[0]
            pad = oh - h
            if pad > 0:
                lo = pad // 2
                eye = np.pad(eye, ((lo, pad - lo), (0, 0)))
            elif pad < 0:
                lo = (-pad) // 2
                eye = eye[lo: lo + oh]
            eyes.append(eye)
    return np.stack(eyes).astype(np.uint8)


def decode_eye_crops(video_path: str, n_eyes: int = 128,
                     eye_size: Tuple[int, int] = (240, 320)) -> np.ndarray:
    """Decode a video and return up to ``n_eyes`` preprocessed eye crops.

    Returns ``[n, h, w] uint8`` (empty array when the clip cannot be read).
    """
    import os

    if not os.path.exists(video_path):
        return np.zeros((0, *eye_size), np.uint8)
    try:
        import cv2

        cap = cv2.VideoCapture(video_path)
        frames = []
        # each dual-eye frame yields 2 crops
        while 2 * len(frames) < n_eyes:
            ok, fr = cap.read()
            if not ok:
                break
            if fr.ndim == 3:
                fr = cv2.cvtColor(fr, cv2.COLOR_BGR2GRAY)
            frames.append(fr)
        cap.release()
    except Exception:  # pragma: no cover
        return np.zeros((0, *eye_size), np.uint8)
    if not frames:
        return np.zeros((0, *eye_size), np.uint8)
    return eyes_from_frames(np.stack(frames), eye_size)[:n_eyes]
