"""Shared CLI argument parsing — flag-compatible with the reference.

Mirrors reference args.py:30-65 (all 23 flags, plus TPU-specific additions
and a --synthetic data source since the real H5 blobs are not shipped).
"""

from __future__ import annotations

import argparse
from pprint import pprint


def parse_args(argv=None, train=True):
    from eghmd_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    p = argparse.ArgumentParser()
    p.add_argument("--lr", type=float, default=5e-4, help="learning rate")
    p.add_argument("--prec", type=int, default=32, help="precision: 16 (bf16) or 32")
    p.add_argument("--disp", type=int, default=0, help="display intermediate output")
    p.add_argument("--model", type=str, default="ritnet_v2", help="select model")
    p.add_argument("--curObj", type=str, default="synthetic",
                   help="curriculum / dataset to train on")
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--resume", type=int, default=0)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--overfit", type=int, default=0,
                   help="overfit to N batches (training smoke check)")
    p.add_argument("--expname", type=str, default="dev")
    p.add_argument("--selfCorr", type=int, default=0)
    p.add_argument("--loadfile", type=str, default="")
    p.add_argument("--path2data", type=str, default="")
    p.add_argument("--batchsize", type=int, default=12)
    p.add_argument("--test_mode", type=str, default="leaveoneout")
    p.add_argument("--disentangle", type=int, default=1)
    p.add_argument("--test_save_op_masks", type=int, default=0)
    p.add_argument("--setting", type=str, default="baseline",
                   help="variant preset name or YAML path")
    p.add_argument("--id", type=int, default=0)
    p.add_argument("--edge_thres", type=int, default=0)
    p.add_argument("--test_normal", type=int, default=0)
    p.add_argument("--record_iou", type=int, default=0)
    p.add_argument("--record_img", type=int, default=0)
    p.add_argument("--iou_filename", type=str, default="test.pkl")
    p.add_argument("--visual_dir", type=str, default="iris")
    p.add_argument("--method", type=str, default="baseline")
    # TPU-native additions
    p.add_argument("--synthetic", type=int, default=0,
                   help="use the synthetic dataset (n samples) instead of H5")
    p.add_argument("--synthetic_degrade", type=float, default=0.0,
                   help="photometric degradation strength [0,1] for the "
                        "synthetic renderer (contrast compression, defocus "
                        "blur, noise, vignette; GT stays exact) — the "
                        "edge-guidance stress distribution")
    p.add_argument("--image_height", type=int, default=240)
    p.add_argument("--image_width", type=int, default=320)
    p.add_argument("--bdcn_weights", type=str, default="",
                   help="path to converted/reference BDCN weights; empty -> "
                        "ground-truth edge maps (synthetic) or zeros")
    p.add_argument("--edge_downscale", type=int, default=1,
                   help="fast-edge mode: run BDCN at 1/N resolution and "
                        "bilinearly upsample the fuse map (~N^2 FLOP cut)")
    p.add_argument("--seg_downscale", type=int, default=1,
                   help="fast-seg serving mode: decode the seg map at 1/N "
                        "resolution (checkpoint-compatible)")
    p.add_argument("--seed", type=int, default=0,
                   help="experiment seed: model init + epoch-shuffle order "
                        "(data distribution stays fixed, so multi-seed runs "
                        "are PAIRED on identical samples — the edge-ablation "
                        "protocol, scripts/edge_ablation_seeds.sh)")
    p.add_argument("--mesh", type=int, default=0,
                   help="data-parallel mesh size; 0 -> all devices")
    p.add_argument("--remat", type=int, default=0,
                   help="rematerialize encoder/decoder in the backward pass "
                        "(jax.checkpoint): fits 240x320 batch>=16 f32 "
                        "training on a 16 GB chip")
    p.add_argument("--batch_frames", type=int, default=32,
                   help="video eval: frames per device batch. Each batch is "
                        "ONE dispatch; on links with high per-dispatch "
                        "latency (this image's axon tunnel: ~1 s) larger "
                        "batches amortize it — 451 frames at 8/batch is 57 "
                        "dispatches, at 64/batch it is 8")
    p.add_argument("--no_overlay", type=int, default=0,
                   help="video eval: skip the overlay + edge mp4 outputs "
                        "(host-encode cost) and write only the per-frame "
                        "ellipse .npy and center pickle — the "
                        "production-shaped serving path")
    p.add_argument("--log_dir", type=str, default="logs")
    p.add_argument("--profile_dir", type=str, default="",
                   help="capture a jax.profiler trace of the first steps")
    p.add_argument("--weights_init", type=str, default="flax",
                   choices=["flax", "reference", "xavier"],
                   help="from-scratch init scheme (reference = the He/0.01 "
                        "scheme of models/RITnet_v2.py:356-369)")
    args = p.parse_args(argv)
    print("------\nparsed arguments:")
    pprint(vars(args))
    return args


def experiment_from_args(args):
    from eghmd_tpu.config import ExperimentConfig

    return ExperimentConfig(
        lr=args.lr,
        prec="bfloat16" if args.prec == 16 else "float32",
        model=args.model,
        cur_obj=args.curObj,
        epochs=args.epochs,
        resume=bool(args.resume),
        workers=args.workers,
        overfit=args.overfit,
        expname=args.expname,
        self_corr=bool(args.selfCorr),
        loadfile=args.loadfile,
        path2data=args.path2data,
        batchsize=args.batchsize,
        test_mode=args.test_mode,
        disentangle=bool(args.disentangle),
        setting=args.setting,
        edge_thres=args.edge_thres,
        edge_downscale=args.edge_downscale,
        test_normal=bool(args.test_normal),
        image_size=(args.image_height, args.image_width),
        log_dir=args.log_dir,
        profile_dir=args.profile_dir,
        weights_init=getattr(args, "weights_init", "flax"),
        remat=bool(getattr(args, "remat", 0)),
        mesh_shape=(args.mesh,) if args.mesh else None,
        seed=getattr(args, "seed", 0),
    )


def build_datasets(args, aug_train=True):
    """Dataset selection, in priority order:
    1. synthetic (``--synthetic N`` or curObj 'synthetic');
    2. a prebuilt ``<test_mode>/cond_<curObj>.pkl`` split (cli/make_splits.py
       — the reference's unpickled split objects, train.py:86-94), with
       archives under ``--path2data``;
    3. a stratified random split over ``<path2data>/<curObj>*.h5``.
    """
    import glob
    import os

    from eghmd_tpu.data import SyntheticEyeDataset

    size = (args.image_height, args.image_width)
    if args.synthetic or args.curObj == "synthetic":
        n = args.synthetic or 256
        deg = getattr(args, "synthetic_degrade", 0.0)
        train = SyntheticEyeDataset(n, size, aug=aug_train, seed=1,
                                    degrade=deg)
        valid = SyntheticEyeDataset(max(n // 4, 8), size, aug=False, seed=2,
                                    degrade=deg)
        test = SyntheticEyeDataset(max(n // 4, 8), size, aug=False, seed=3,
                                   degrade=deg)
        return train, valid, test

    cond_pkl = os.path.join(args.test_mode, f"cond_{args.curObj}.pkl")
    if os.path.exists(cond_pkl):
        from eghmd_tpu.data.curriculum import datasets_from_split, load_split

        split = load_split(cond_pkl)
        return datasets_from_split(split, archives_dir=args.path2data,
                                   size=size, aug_train=aug_train)

    archives = sorted(glob.glob(os.path.join(args.path2data, f"{args.curObj}*.h5")))
    if not archives:
        raise FileNotFoundError(
            f"no split pkl at {cond_pkl} and no H5 archives matching "
            f"{args.curObj}*.h5 under {args.path2data}; "
            "use --synthetic N for the synthetic dataset"
        )
    from eghmd_tpu.data.curriculum import make_splits

    return make_splits(archives, size=size, aug_train=aug_train)


def build_edge_fn(args, dtype):
    """Frozen BDCN edge function, or None to use the batch's edge maps.

    ``--bdcn_weights`` accepts:
      * ``random`` — a randomly initialized BDCN (the pretrained
        ``gen_00000016.pt`` blob is not shipped in the reference either,
        .MISSING_LARGE_BLOBS:2) so the two-stage pipeline can be exercised;
      * a directory — an orbax checkpoint from ``cli/train_bdcn.py`` (the
        in-repo BDCN self-training recipe, training/bdcn_train.py);
      * a file — the reference's torch BDCN checkpoint, converted.
    """
    if not args.bdcn_weights:
        return None
    import jax
    import jax.numpy as jnp

    from eghmd_tpu.models.bdcn import BDCN, edge_input_dims, make_edge_fn

    downscale = getattr(args, "edge_downscale", 1)
    if args.bdcn_weights == "random":
        h, w = edge_input_dims(args.image_height, args.image_width, downscale)
        bdcn = BDCN(dtype=dtype)
        variables = jax.jit(bdcn.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32))
    else:
        from eghmd_tpu.training.checkpoints import load_bdcn_variables

        variables = load_bdcn_variables(args.bdcn_weights)
    return make_edge_fn(variables, dtype=dtype, downscale=downscale)
