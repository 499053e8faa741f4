#!/usr/bin/env python3
"""Model-zoo scorer — counterpart of reference calc_model_score.py.

Sweeps model x dataset combinations, runs the evaluator on each, and writes a
score table (CSV + printed) with the reference's 8 columns
(calc_model_score.py:192-198): mIou, bg_iou, iris_iou, pup_iou, reg_pup,
reg_iris, seg_pup, seg_iris.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--models", nargs="+",
                   default=["ritnet_v1", "baseline", "baseline_edge"])
    p.add_argument("--datasets", nargs="+",
                   default=["synthetic"])
    p.add_argument("--path2data", type=str, default="")
    p.add_argument("--ckpt_root", type=str, default="logs",
                   help="logs/<model>/<expname>/checkpoints layout")
    p.add_argument("--expname", type=str, default="dev")
    p.add_argument("--synthetic", type=int, default=64)
    p.add_argument("--batchsize", type=int, default=8)
    p.add_argument("--out", type=str, default="model_scores.csv")
    args = p.parse_args(argv)

    import jax
    import numpy as np
    import pandas as pd

    from eghmd_tpu.config import VARIANT_PRESETS, resolve_variant
    from eghmd_tpu.data import SyntheticEyeDataset, DataPipeline
    from eghmd_tpu.inference import Evaluator
    from eghmd_tpu.models import build_model

    rows = []
    for name in args.models:
        # 'baseline'/'baseline_edge' name ESF-Net variants; others name models
        if name in VARIANT_PRESETS:
            model_name, variant = "ritnet_v2", resolve_variant(name)
        else:
            model_name, variant = name, VARIANT_PRESETS["baseline"]
        model = build_model(model_name, variant)
        for ds_name in args.datasets:
            if ds_name == "synthetic":
                ds = SyntheticEyeDataset(args.synthetic, (240, 320), seed=5)
            else:
                import glob

                from eghmd_tpu.data import H5EyeDataset

                archives = sorted(glob.glob(
                    os.path.join(args.path2data, f"{ds_name}*.h5")))
                ds = H5EyeDataset(archives)
            pipe = DataPipeline(ds, args.batchsize, shuffle=False, num_workers=4)
            batch = next(iter(pipe))
            variables = jax.jit(
                lambda r, a, b: model.init(r, a, b, train=False)
            )(jax.random.PRNGKey(0), batch["image"], batch["edge"])
            ckpt_dir = os.path.join(args.ckpt_root, model_name, args.expname,
                                    "checkpoints")
            if os.path.isdir(ckpt_dir):
                from eghmd_tpu.training.checkpoints import CheckpointManager
                from eghmd_tpu.training import Trainer
                from eghmd_tpu.config import ExperimentConfig

                trainer = Trainer(ExperimentConfig(setting="baseline"), model,
                                  log_fn=None)
                state = trainer.init_state(batch)
                try:
                    state = CheckpointManager(ckpt_dir).restore(state)
                    variables = {"params": state.params,
                                 "batch_stats": state.batch_stats}
                    print(f"loaded checkpoint for {name}")
                except FileNotFoundError:
                    pass
            ev = Evaluator(model, variables,
                           pupil_only=(model_name == "deepvog"))
            out = ev.run(pipe)
            ious = out["ious"]
            rows.append({
                "model": name, "dataset": ds_name,
                "mIou": out["mean_iou"],
                "bg_iou": float(ious[0]),
                "iris_iou": float(ious[1]) if len(ious) > 1 else np.nan,
                "pup_iou": float(ious[-1]),
                "reg_pup": out["pup_lat_dist"],
                "reg_iris": out["iri_lat_dist"],
                "seg_pup": out["pup_seg_dist"],
                "seg_iris": out["iri_seg_dist"],
            })
            print(rows[-1])
    df = pd.DataFrame(rows)
    df.to_csv(args.out, index=False)
    print(df.to_string())
    print(f"wrote {args.out}")
    return df


if __name__ == "__main__":
    main()
