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

Resize-kernel note: when a crop's width differs from the eye width, the
host path resizes with cv2 INTER_LANCZOS4 while the device serving path
uses jax.image lanczos3 (inference/preprocess.py:40) — visually identical
but not bit-equal. The shipped 640-wide clip splits into exactly-320-wide
eyes, so no resize fires on the path the gates actually measure.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def decode_gray_frames(video_path: str, n_frames: int,
                       skip_frames: int = 0) -> np.ndarray:
    """Decode up to ``n_frames`` grayscale frames (``n_frames <= 0`` = the
    whole clip), skipping the first ``skip_frames`` — the skip lets training
    crops use a DISJOINT frame range from the frames an agreement metric
    evaluates on. Returns ``[n, H, W] uint8`` (empty when the clip cannot
    be read)."""
    import os

    if not os.path.exists(video_path):
        return np.zeros((0, 0, 0), np.uint8)
    try:
        import cv2

        cap = cv2.VideoCapture(video_path)
        frames = []
        seen = 0
        while n_frames <= 0 or len(frames) < n_frames:
            ok, fr = cap.read()
            if not ok:
                break
            seen += 1
            if seen <= skip_frames:
                continue
            if fr.ndim == 3:
                fr = cv2.cvtColor(fr, cv2.COLOR_BGR2GRAY)
            frames.append(fr)
        cap.release()
    except Exception:  # pragma: no cover
        return np.zeros((0, 0, 0), np.uint8)
    if not frames:
        return np.zeros((0, 0, 0), np.uint8)
    return np.stack(frames)


def eyes_from_frames(frames: np.ndarray,
                     eye_size: Tuple[int, int] = (240, 320)) -> np.ndarray:
    """Gray frames ``[N, H, W]`` -> eye crops ``[N or 2N, h, w]`` uint8.

    Frames at least twice the eye width are split into (left, right) eyes at
    the midline (the reference splits its 640-wide frames at x=320,
    evaluate.py:242-243). Each eye is width-aligned to ``w`` by resize and
    vertically center-padded/chopped to ``h`` — the serving preprocess
    (reference evaluate.py:69-104, mirrored on device by
    ``inference.preprocess.preprocess_frames``; see the module docstring
    for the resize-kernel caveat).
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
                    eye = cv2.resize(eye, (ow, max(1, int(h * sc))),
                                     interpolation=cv2.INTER_LANCZOS4)
                except Exception:  # pragma: no cover - cv2 is in the image
                    # crude emulation: stride rows AND cols by the same
                    # factor (preserving aspect), then pad to full width
                    step = max(1, round(w / ow))
                    eye = eye[::step, ::step]
                    if eye.shape[1] < ow:
                        eye = np.pad(eye, ((0, 0), (0, ow - eye.shape[1])))
                    eye = eye[:, :ow]
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
                     eye_size: Tuple[int, int] = (240, 320),
                     skip_frames: int = 0) -> np.ndarray:
    """Decode a video and return up to ``n_eyes`` preprocessed eye crops,
    starting ``skip_frames`` frames in (pass the agreement-eval frame count
    here so training crops never overlap the evaluated frames).

    Returns ``[n, h, w] uint8`` (empty array when the clip cannot be read).
    Decodes incrementally: frames are counted by the crops they actually
    yield (2 for dual-eye-wide frames, 1 otherwise), so single-eye clips
    deliver the full request instead of half of it.
    """
    oh, ow = eye_size
    probe = decode_gray_frames(video_path, 1, skip_frames)
    if probe.size == 0:
        return np.zeros((0, oh, ow), np.uint8)
    per_frame = 2 if probe.shape[2] >= 2 * ow else 1
    need = -(-n_eyes // per_frame)
    frames = decode_gray_frames(video_path, need, skip_frames)
    if frames.size == 0:  # pragma: no cover - probe succeeded above
        return np.zeros((0, oh, ow), np.uint8)
    return eyes_from_frames(frames, eye_size)[:n_eyes]
