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

    import jax

    from eghmd_tpu.config import resolve_variant
    from eghmd_tpu.data import DataPipeline, Subset
    from eghmd_tpu.models import build_model
    from eghmd_tpu.models.blocks import LinStack
    from eghmd_tpu.parallel import batch_sharding
    from eghmd_tpu.training import Trainer
    from eghmd_tpu.training.checkpoints import CheckpointManager, bootstrap_state
    from eghmd_tpu.utils.logging import ExperimentLogger

    variant = resolve_variant(args.setting)
    model = build_model(args.model, variant, cfg.dtype, remat=cfg.remat)
    train_ds, valid_ds, test_ds = build_datasets(args)

    log_dir = os.path.join(cfg.log_dir, args.model, args.expname)
    logger = ExperimentLogger(log_dir)
    from eghmd_tpu.utils.logging import dump_run_args

    dump_run_args(log_dir, args)
    ds_head = LinStack(64, 2, num_layers=2, act=False)
    trainer = Trainer(cfg, model, ds_head=ds_head,
                      edge_fn=build_edge_fn(args, cfg.dtype),
                      log_fn=logger.write, logger=logger)

    if args.overfit > 0:
        # the reference's overfit-N smoke check (train.py:208-212)
        train_ds = Subset(train_ds, args.overfit * args.batchsize)
        valid_ds = Subset(valid_ds, args.overfit * args.batchsize)

    sharding = batch_sharding(trainer.mesh)
    train_pipe = DataPipeline(train_ds, cfg.batchsize, sharding=sharding,
                              shuffle=True, seed=cfg.seed,
                              num_workers=cfg.workers)
    valid_pipe = DataPipeline(valid_ds, cfg.batchsize, sharding=sharding,
                              shuffle=False, num_workers=cfg.workers)
    # cross-dataset test split, evaluated whenever the stop metric improves
    # (reference train.py:470-481)
    test_pipe = DataPipeline(test_ds, cfg.batchsize, sharding=sharding,
                             shuffle=False, num_workers=cfg.workers) \
        if len(test_ds) >= cfg.batchsize else None

    from eghmd_tpu.parallel import replicated_sharding

    ckpt = CheckpointManager(os.path.join(log_dir, "checkpoints"))
    state = trainer.init_state(next(iter(valid_pipe)))
    start_epoch = 0
    if cfg.resume and ckpt.latest_epoch() is not None:
        # resume the run in progress: restore the latest epoch's full state
        # (params + optimizer + step) and continue at epoch+1
        # (reference train.py:151-160)
        last = ckpt.latest_epoch()
        state = ckpt.restore(state, tag=f"epoch_{last}")
        start_epoch = last + 1
        logger.write(f"resumed from epoch {last}; continuing at {start_epoch}")
    elif cfg.loadfile:
        # pretrained bootstrap: weights only, fresh optimizer
        # (reference train.py:162-172)
        state = bootstrap_state(state, cfg.loadfile, setting=variant)
        logger.write(f"bootstrapped weights from {cfg.loadfile}")
    if start_epoch or cfg.loadfile:
        # orbax restores leaves with single-device placement; the jitted
        # step needs everything replicated over the mesh again
        state = jax.device_put(state, replicated_sharding(trainer.mesh))
    if start_epoch == 0:
        # `_init` snapshot for lottery-ticket-style studies
        # (reference train.py:174-178)
        ckpt._ckptr.save(ckpt._path("init"),
                         {"params": state.params,
                          "batch_stats": state.batch_stats}, force=True)

    state, history = trainer.fit(train_pipe, valid_pipe, checkpointer=ckpt,
                                 start_epoch=start_epoch, state=state,
                                 test_pipe=test_pipe)
    logger.write(f"done; best stop metric {trainer.early.best_score}")
    logger.dump_history(history)
    return history


if __name__ == "__main__":
    main()
