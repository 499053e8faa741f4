#!/usr/bin/env python3
"""Gate the serving shortcuts (fast-edge / fast-seg) at a TRAINED checkpoint.

The serving operating points in BASELINE.md downscale the BDCN input
(fast-edge) and the decoder tail (fast-seg). Structural random-weight tests
bound their error, but the accuracy claim belongs at trained checkpoints
(the reference evaluates everything at trained weights, test.py:234-247).
This driver loads a trained ESF-Net checkpoint (+ a trained BDCN), runs the
evaluator over a held-out split at every (edge_downscale, seg_downscale)
combination, and prints one JSON line with the mIoU / pupil-center deltas of
each shortcut vs the full-resolution reference point plus which configs pass
the gate (default: mIoU drop <= 0.02).

Example:
    python cli/gate_serving.py --ckpt logs/ritnet_v2/teacher/checkpoints \
        --bdcn_weights logs/bdcn/dev/checkpoints --synthetic 64
"""

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cli.args import build_datasets, build_edge_fn


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str, required=True,
                   help="orbax checkpoint dir (cli/train.py output)")
    p.add_argument("--setting", type=str, default="baseline_edge")
    p.add_argument("--chz", type=int, default=32)
    p.add_argument("--growth", type=float, default=1.2)
    p.add_argument("--bdcn_weights", type=str, required=True,
                   help="trained BDCN (cli/train_bdcn.py output dir), "
                        "reference .pt, or 'random'")
    p.add_argument("--edge_thres", type=int, default=0)
    p.add_argument("--max_miou_drop", type=float, default=0.02)
    p.add_argument("--max_center_excess", type=float, default=2.0,
                   help="gate: a shortcut's pupil-center error may exceed "
                        "the full-resolution point's by at most this many "
                        "px (the tracker's primary output — reference "
                        "test.py:235-238; VERDICT r3 #2)")
    p.add_argument("--edge_factors", type=str, default="1,2,4")
    p.add_argument("--seg_factors", type=str, default="1,2,4")
    # data
    p.add_argument("--synthetic", type=int, default=64)
    p.add_argument("--curObj", type=str, default="synthetic")
    p.add_argument("--path2data", type=str, default="")
    p.add_argument("--test_mode", type=str, default="leaveoneout")
    p.add_argument("--image_height", type=int, default=240)
    p.add_argument("--image_width", type=int, default=320)
    p.add_argument("--batchsize", type=int, default=8)
    p.add_argument("--workers", type=int, default=2)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from eghmd_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax.numpy as jnp

    from eghmd_tpu.config import VARIANT_PRESETS, scaled_variant
    from eghmd_tpu.data import DataPipeline
    from eghmd_tpu.inference import Evaluator
    from eghmd_tpu.models import ESFNet
    from eghmd_tpu.training.checkpoints import load_checkpoint_variables

    variant = VARIANT_PRESETS[args.setting]
    if args.chz != 32 or args.growth != 1.2:
        variant = scaled_variant(variant, args.chz, args.growth)
    variables = load_checkpoint_variables(args.ckpt)

    _, valid_ds, _ = build_datasets(args, aug_train=False)
    pipe = DataPipeline(valid_ds, args.batchsize, shuffle=False,
                        num_workers=args.workers)

    edge_factors = [int(f) for f in args.edge_factors.split(",")]
    seg_factors = [int(f) for f in args.seg_factors.split(",")]
    results = {}
    for ef, sf in itertools.product(edge_factors, seg_factors):
        class _EdgeArgs:  # build_edge_fn reads these fields
            bdcn_weights = args.bdcn_weights
            edge_downscale = ef
            image_height = args.image_height
            image_width = args.image_width

        model = ESFNet(setting=variant, chz=args.chz, growth=args.growth,
                       seg_downscale=sf)
        ev = Evaluator(model, variables,
                       edge_fn=build_edge_fn(_EdgeArgs, jnp.float32),
                       edge_thres=bool(variant.edge_thres or args.edge_thres))
        out = ev.run(pipe)
        results[f"e{ef}_s{sf}"] = {
            "miou": round(out["mean_iou"], 4),
            "pup_seg_dist": round(out["pup_seg_dist"], 3),
        }
        print(f"edge/{ef} seg/{sf}: mIoU {out['mean_iou']:.4f} "
              f"pup_c {out['pup_seg_dist']:.2f}px", file=sys.stderr)

    ref = results["e1_s1"]["miou"]
    ref_pup = results["e1_s1"]["pup_seg_dist"]
    gated = {}
    for key, r in results.items():
        drop = ref - r["miou"]
        r["miou_drop"] = round(drop, 4)
        r["center_excess_px"] = round(r["pup_seg_dist"] - ref_pup, 3)
        r["gated"] = bool(drop <= args.max_miou_drop
                          and r["center_excess_px"] <= args.max_center_excess)
        if r["gated"]:
            gated[key] = r
    best = max(gated, key=lambda k: (int(k.split("_")[0][1:])
                                     * int(k.split("_s")[1])))
    print(json.dumps({"reference_miou": ref, "max_miou_drop": args.max_miou_drop,
                      "reference_pup_c": ref_pup,
                      "max_center_excess": args.max_center_excess,
                      "best_gated": best, **results}))
    return results


if __name__ == "__main__":
    main()
