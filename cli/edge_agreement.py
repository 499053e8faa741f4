#!/usr/bin/env python3
"""Edge-map evidence on real frames: trained BDCN vs its fast-edge modes.

Two questions the synthetic gates can't answer, measured on the reference's
shipped demo clip (the only real data in the image, used by the reference's
own serving config — evaluate.py:357-358):

  1. Does the in-repo-trained BDCN produce plausible contours on REAL
     near-eye frames? Reported as edge-pixel density at the downstream 0.1
     threshold (reference utils.py:653-655) — a frozen stage that fires on
     everything or nothing is useless regardless of synthetic F1.
  2. How much does the fast-edge approximation (BDCN at 1/N resolution,
     bilinear fuse upsample) change the thresholded edge maps the
     downstream network actually consumes? Reported as F1 / IoU of the
     thresholded /N maps against the full-resolution ones, per factor.

Prints one JSON line.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--bdcn_weights", type=str, required=True,
                   help="trained BDCN (cli/train_bdcn.py output dir), "
                        "reference .pt, or 'random'")
    p.add_argument("--video", type=str,
                   default="/root/reference/videos/example1.avi")
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--factors", type=str, default="2,4")
    p.add_argument("--thr", type=float, default=0.1)
    p.add_argument("--image_height", type=int, default=240)
    p.add_argument("--image_width", type=int, default=320)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from eghmd_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from cli.args import build_edge_fn
    from eghmd_tpu.inference.preprocess import preprocess_frames, split_dual_eye

    import cv2

    cap = cv2.VideoCapture(args.video)
    frames = []
    while len(frames) < args.frames:
        ok, fr = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(fr, cv2.COLOR_BGR2GRAY)
                      if fr.ndim == 3 else fr)
    cap.release()
    if not frames:
        raise SystemExit(f"no frames decoded from {args.video}")
    raw = jnp.asarray(np.stack(frames), jnp.float32)
    if raw.shape[2] >= 640:
        left, right = split_dual_eye(raw)
        raw = jnp.concatenate([left, right], axis=0)
    eyes, _ = preprocess_frames(raw, (args.image_height, args.image_width))

    def edge_at(factor):
        class _A:
            bdcn_weights = args.bdcn_weights
            edge_downscale = factor
            image_height = args.image_height
            image_width = args.image_width

        # jit the whole extraction: unjitted, each BDCN op dispatches
        # separately over the axon tunnel (~1 s/dispatch on this image)
        fn = jax.jit(build_edge_fn(_A, jnp.float32))
        return np.asarray(fn(eyes))[..., 0]

    full = edge_at(1)
    full_t = full >= args.thr
    out = {
        "frames": int(raw.shape[0]),
        "edge_density_full": round(float(full_t.mean()), 4),
        "edge_mean_prob": round(float(full.mean()), 4),
    }
    for f in (int(x) for x in args.factors.split(",")):
        ft = edge_at(f) >= args.thr
        tp = float((ft & full_t).sum())
        prec = tp / max(ft.sum(), 1)
        rec = tp / max(full_t.sum(), 1)
        out[f"fast{f}_f1_vs_full"] = round(2 * prec * rec
                                           / max(prec + rec, 1e-12), 4)
        out[f"fast{f}_density"] = round(float(ft.mean()), 4)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
