#!/usr/bin/env python3
"""Dataset evaluation driver — CLI-parity counterpart of reference test.py.

Example:
    python cli/test.py --synthetic 64 --setting baseline_edge \
        --loadfile logs/ritnet_v2/dev/checkpoints --record_iou 1
"""

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cli.args import parse_args, experiment_from_args, build_datasets, build_edge_fn


def main(argv=None):
    args = parse_args(argv, train=False)
    cfg = experiment_from_args(args)

    import jax
    import numpy as np

    from eghmd_tpu.config import resolve_variant
    from eghmd_tpu.data import DataPipeline
    from eghmd_tpu.inference import Evaluator
    from eghmd_tpu.models import build_model

    variant = resolve_variant(args.setting)
    model = build_model(args.model, variant, cfg.dtype,
                        seg_downscale=args.seg_downscale)
    _, _, test_ds = build_datasets(args, aug_train=False)
    pipe = DataPipeline(test_ds, cfg.batchsize, shuffle=False,
                        num_workers=cfg.workers)

    batch = next(iter(pipe))
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(lambda r, a, b: model.init(r, a, b, train=False))(
        rng, batch["image"], batch["edge"])
    if args.loadfile:
        if args.loadfile.endswith(".pkl"):
            # a reference torch checkpoint — convert on the fly
            from eghmd_tpu.utils.torch_convert import load_reference_esfnet_checkpoint

            variables = jax.tree.map(
                jax.numpy.asarray, load_reference_esfnet_checkpoint(args.loadfile, variant))
        else:
            from eghmd_tpu.training.checkpoints import CheckpointManager
            from eghmd_tpu.training import Trainer
            from eghmd_tpu.models.blocks import LinStack

            trainer = Trainer(cfg, model, ds_head=LinStack(64, 2), log_fn=None)
            state = trainer.init_state(batch)
            state = CheckpointManager(args.loadfile).restore(state)
            variables = {"params": state.params, "batch_stats": state.batch_stats}

    if args.disp:
        # headless counterpart of the reference's --disp grid
        # (test.py:175-181 / utils.py generateImageGrid): saves one
        # annotated prediction grid for the first batch into visual_dir
        import jax.numpy as jnp

        from eghmd_tpu.geometry.ellipse import transform_ellipse, unnorm_mat
        from eghmd_tpu.losses import el_pred_from_seg_centers
        from eghmd_tpu.ops import seg_centers
        from eghmd_tpu.utils.visual import save_image_grid

        op, el_out, _ = model.apply(variables, batch["image"], batch["edge"],
                                    train=False)
        el_pred = el_pred_from_seg_centers(seg_centers(op), el_out)
        h, w = op.shape[1:3]
        hu = unnorm_mat(h, w, jnp, dtype=jnp.float32)
        to_px = lambda e: np.asarray(
            transform_ellipse(jnp.asarray(e, jnp.float32), hu, jnp))
        pred_px = np.stack([to_px(el_pred[:, :5]), to_px(el_pred[:, 5:])], 1)
        gt_px = np.stack([to_px(batch["el_norm"][:, 0]),
                          to_px(batch["el_norm"][:, 1])], 1)
        os.makedirs(args.visual_dir, exist_ok=True)
        grid_path = os.path.join(args.visual_dir, "disp_grid.png")
        save_image_grid(grid_path, np.asarray(batch["image"])[..., 0],
                        np.asarray(jnp.argmax(op, -1)),
                        np.asarray(batch["target"]), pred_px, gt_px)
        print(f"disp grid saved to {grid_path}")

    ev = Evaluator(model, variables, edge_fn=build_edge_fn(args, cfg.dtype),
                   edge_thres=bool(variant.edge_thres or args.edge_thres),
                   bbox_iou=bool(args.record_img), refine=False,
                   pupil_only=(args.model == "deepvog"))
    max_batches = 10 if args.test_normal else None
    out = ev.run(pipe, max_batches=max_batches, log_fn=print)

    if args.record_iou:
        if args.iou_filename and args.iou_filename != "test.pkl":
            path = args.iou_filename
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        else:
            # reference layout: img/<curObj>_<method>_ious.pkl
            os.makedirs("img", exist_ok=True)
            path = os.path.join("img", f"{args.curObj}_{args.method}_ious.pkl")
        with open(path, "wb") as f:
            pickle.dump(out["iou_by_sample"], f)
        print(f"!!!ious result dump to {path} .... shape: {out['iou_by_sample'].shape}")
    return out


if __name__ == "__main__":
    main()
