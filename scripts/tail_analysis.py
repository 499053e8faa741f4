#!/usr/bin/env python3
"""Classify the worst-decile real-clip center-error eyes (VERDICT r4 #3).

The whole-clip protocol's pupil-center delta has a heavy tail (flagship
p90 ~28 px vs p50 ~5 px). The absolute visibility threshold
(REAL_VISIBILITY_MIN_PUPIL_PX = 100) classifies NO eye of the demo clip
as a blink (visible_frac 1.0), so the tail needs a finer account. This
script reads the per-eye arrays `cli/real_protocol.py --dump_scores 1`
saves and answers, offline:

  - is the tail blink/occlusion-like? (teacher-side pupil pixel mass of
    tail eyes vs the clip's median — a RELATIVE smallness signal the
    absolute threshold misses)
  - is it disagreement-wide or center-specific? (seg agreement of tail
    eyes vs the rest; iris delta of the same eyes)
  - is it temporally clustered? (eyes are frame-major, 2 per frame —
    clustered tails mean specific EVENTS, e.g. saccades/half-blinks;
    scattered tails mean a general failure mode)

Writes <artifact>/tail_analysis.json and prints it as one JSON line.

Usage: python scripts/tail_analysis.py --ckpt artifacts/calib_e4s4_rm2
"""

import argparse
import json
import os

import numpy as np


def analyze(scores: dict, decile: float = 90.0) -> dict:
    pup = np.asarray(scores["pup_delta"], float)
    iris = np.asarray(scores["iris_delta"], float)
    agree = np.asarray(scores["agree"], float)
    px_t = np.asarray(scores["pup_px_b"], float)  # teacher (truth side)

    thr = float(np.nanpercentile(pup, decile))
    tail = pup >= thr
    rest = ~tail & np.isfinite(pup)
    med_px = float(np.nanmedian(px_t))
    # relative smallness: a half-blink leaves SOME pupil but far below
    # the clip's typical mass even when it clears an absolute floor
    small = px_t < 0.25 * med_px

    frames = np.flatnonzero(tail) // 2
    uframes = np.unique(frames)
    # cluster = run of consecutive frame indices (an "event")
    clusters = int(1 + np.sum(np.diff(uframes) > 1)) if uframes.size else 0

    def s(v, sel):
        v = v[sel]
        return {
            "mean": round(float(np.nanmean(v)), 3),
            "p50": round(float(np.nanpercentile(v, 50)), 3),
        } if v.size else None

    return {
        "decile": decile,
        "threshold_px": round(thr, 2),
        "n_eyes": int(pup.size),
        "n_tail": int(tail.sum()),
        "teacher_pupil_px": {
            "clip_median": round(med_px, 1),
            "tail": s(px_t, tail),
            "rest": s(px_t, rest),
        },
        "frac_tail_small_pupil": round(float(np.mean(small[tail])), 4)
        if tail.any() else None,
        "frac_rest_small_pupil": round(float(np.mean(small[rest])), 4)
        if rest.any() else None,
        "agreement": {"tail": s(agree, tail), "rest": s(agree, rest)},
        "iris_delta_px": {"tail": s(iris, tail), "rest": s(iris, rest)},
        "temporal": {
            "n_tail_frames": int(uframes.size),
            "n_clusters": clusters,
            "clustered": bool(uframes.size and
                              clusters <= max(1, uframes.size // 3)),
        },
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str, required=True,
                   help="artifact dir containing real_scores.npz")
    p.add_argument("--decile", type=float, default=90.0)
    args = p.parse_args(argv)

    npz = os.path.join(args.ckpt, "real_scores.npz")
    scores = dict(np.load(npz))
    out = analyze(scores, args.decile)
    out["artifact"] = args.ckpt.rstrip("/")
    with open(os.path.join(args.ckpt, "tail_analysis.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
