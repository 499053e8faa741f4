#!/usr/bin/env python3
"""Training driver — CLI-parity counterpart of reference train.py.

Example (synthetic smoke run):
    python cli/train.py --synthetic 64 --epochs 3 --setting baseline_edge \
        --batchsize 8 --expname smoke
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cli.args import parse_args, experiment_from_args, build_datasets, build_edge_fn


def main(argv=None):
    args = parse_args(argv)
    cfg = experiment_from_args(args)

    import numpy as np
    import jax

    from eghmd_tpu.config import resolve_variant
    from eghmd_tpu.data import DataPipeline
    from eghmd_tpu.models import build_model
    from eghmd_tpu.models.blocks import LinStack
    from eghmd_tpu.parallel import batch_sharding
    from eghmd_tpu.training import Trainer
    from eghmd_tpu.training.checkpoints import CheckpointManager
    from eghmd_tpu.utils.logging import ExperimentLogger

    variant = resolve_variant(args.setting)
    model = build_model(args.model, variant, cfg.dtype)
    train_ds, valid_ds, _ = build_datasets(args)

    log_dir = os.path.join(cfg.log_dir, args.model, args.expname)
    logger = ExperimentLogger(log_dir)
    ds_head = LinStack(64, 2, num_layers=2, act=False)
    trainer = Trainer(cfg, model, ds_head=ds_head,
                      edge_fn=build_edge_fn(args, cfg.dtype), log_fn=logger.write)

    if args.overfit > 0:
        # the reference's overfit-N smoke check (train.py:208-212)
        train_ds.n = min(len(train_ds), args.overfit * args.batchsize) \
            if hasattr(train_ds, "n") else train_ds.n
        valid_ds.n = min(len(valid_ds), args.overfit * args.batchsize) \
            if hasattr(valid_ds, "n") else valid_ds.n

    sharding = batch_sharding(trainer.mesh)
    train_pipe = DataPipeline(train_ds, cfg.batchsize, sharding=sharding,
                              shuffle=True, num_workers=cfg.workers)
    valid_pipe = DataPipeline(valid_ds, cfg.batchsize, sharding=sharding,
                              shuffle=False, num_workers=cfg.workers)

    ckpt = CheckpointManager(os.path.join(log_dir, "checkpoints"))
    state, history = trainer.fit(train_pipe, valid_pipe, checkpointer=ckpt)
    logger.write(f"done; best stop metric {trainer.early.best_score}")
    logger.dump_history(history)
    return history


if __name__ == "__main__":
    main()
