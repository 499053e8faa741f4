#!/usr/bin/env python3
"""Qualitative image selector — counterpart of reference image_select.py.

Loads per-sample IoU dumps (produced by cli/test.py --record_iou) for a
baseline vs an edge-guided method, sorts by IoU delta, and exports the
indices where the edge method wins big (for paper figures).
Reference image_select.py:5-44.
"""

import argparse
import pickle

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--baseline", required=True, help="baseline ious .pkl")
    p.add_argument("--method", required=True, help="edge-method ious .pkl")
    p.add_argument("--class_idx", type=int, default=1,
                   help="1 iris, 2 pupil (reference compares iris deltas)")
    p.add_argument("--min_delta", type=float, default=0.1)
    p.add_argument("--min_iou", type=float, default=0.8)
    p.add_argument("--out", type=str, default="selected_indices.pkl")
    args = p.parse_args(argv)

    with open(args.baseline, "rb") as f:
        base = np.asarray(pickle.load(f))
    with open(args.method, "rb") as f:
        meth = np.asarray(pickle.load(f))
    assert base.shape == meth.shape, (base.shape, meth.shape)

    delta = base[:, args.class_idx] - meth[:, args.class_idx]
    keep = (delta < -args.min_delta) & (meth[:, args.class_idx] > args.min_iou)
    order = np.argsort(delta)
    selected = [int(i) for i in order if keep[i]]
    with open(args.out, "wb") as f:
        pickle.dump(selected, f)
    print(f"{len(selected)} samples where method wins by >{args.min_delta} "
          f"IoU (class {args.class_idx}); wrote {args.out}")
    return selected


if __name__ == "__main__":
    main()
