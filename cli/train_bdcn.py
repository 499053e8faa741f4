#!/usr/bin/env python3
"""Train the BDCN edge stage from scratch (edge-guided stack bootstrap).

The reference uses a frozen pretrained BDCN whose weights are missing from
its repo and ships no way to produce them (train.py:126-127,
.MISSING_LARGE_BLOBS:2). This driver trains one in-repo: class-balanced BCE
on all 11 outputs (training/bdcn_train.py) supervised by boundary maps
derived from the segmentation labels. The resulting checkpoint plugs into
every edge-consuming driver via ``--bdcn_weights <out_dir>``.

Example (synthetic end-to-end bootstrap):
    python cli/train_bdcn.py --synthetic 64 --epochs 5 \
        --image_height 240 --image_width 320 --log_dir logs
    python cli/train.py --setting baseline_edge --synthetic 64 \
        --bdcn_weights logs/bdcn/dev/checkpoints ...
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cli.args import build_datasets


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--prec", type=int, default=32)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batchsize", type=int, default=8)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--dilate", type=int, default=1,
                   help="boundary-band half-width in px for the supervision "
                        "maps")
    p.add_argument("--lr_decay", type=str, default="none",
                   choices=("none", "cosine"),
                   help="cosine: decay the LR to lr*0.01 over the run "
                        "(restarts on --resume); the fixed-LR recipe "
                        "plateaus near val F1 0.47 on the degraded "
                        "distribution (VERDICT r4 #5)")
    p.add_argument("--resume", type=int, default=0,
                   help="continue from this expname's checkpoint for "
                        "--epochs MORE epochs (fresh optimizer)")
    p.add_argument("--expname", type=str, default="dev")
    p.add_argument("--log_dir", type=str, default="logs")
    # data (same flags as cli/train.py)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--synthetic_degrade", type=float, default=0.0)
    p.add_argument("--curObj", type=str, default="synthetic")
    p.add_argument("--path2data", type=str, default="")
    p.add_argument("--test_mode", type=str, default="leaveoneout")
    p.add_argument("--image_height", type=int, default=240)
    p.add_argument("--image_width", type=int, default=320)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from eghmd_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax.numpy as jnp

    from eghmd_tpu.data import DataPipeline
    from eghmd_tpu.training import BDCNTrainer

    dtype = {16: jnp.bfloat16, 32: jnp.float32}[args.prec]
    train_ds, valid_ds, _ = build_datasets(args)
    train_pipe = DataPipeline(train_ds, args.batchsize, shuffle=True,
                              num_workers=args.workers)
    valid_pipe = DataPipeline(valid_ds, args.batchsize, shuffle=False,
                              num_workers=args.workers)

    steps_per_epoch = -(-len(train_ds) // args.batchsize)
    total = (args.epochs * steps_per_epoch if args.lr_decay == "cosine"
             else 0)
    trainer = BDCNTrainer(lr=args.lr, dilate=args.dilate, dtype=dtype,
                          total_steps=total)
    ckpt_dir = os.path.join(args.log_dir, "bdcn", args.expname, "checkpoints")
    from eghmd_tpu.utils.logging import dump_run_args

    dump_run_args(os.path.dirname(ckpt_dir), args)
    params = None
    if args.resume and os.path.isdir(os.path.join(ckpt_dir, "bdcn")):
        from eghmd_tpu.training import load_bdcn_checkpoint

        params = load_bdcn_checkpoint(ckpt_dir)["params"]
        print(f"resumed BDCN params from {ckpt_dir}")
    params, history = trainer.fit(train_pipe, valid_pipe, epochs=args.epochs,
                                  checkpoint_dir=ckpt_dir, params=params)
    # persist the training curve beside the checkpoint so downstream
    # quality gates (scripts/bdcn_gate.py) can read val_f1 without
    # re-running evaluation; appended across --resume continuations
    hist_path = os.path.join(os.path.dirname(ckpt_dir), "history.json")
    prior = []
    if args.resume and os.path.exists(hist_path):
        with open(hist_path) as f:
            prior = json.load(f)
    with open(hist_path, "w") as f:
        json.dump(prior + history, f, indent=1)
    final = history[-1]
    print(json.dumps({
        "checkpoint": ckpt_dir,
        "epochs": len(history),
        "loss": round(final["loss"], 4),
        "f1": round(final["f1"], 4),
        "val_f1": round(final.get("val_f1", float("nan")), 4),
    }))
    return params, history


if __name__ == "__main__":
    main()
