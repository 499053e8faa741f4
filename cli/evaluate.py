#!/usr/bin/env python3
"""Video inference driver — CLI-parity counterpart of reference evaluate.py.

Walks --path2data recursively for videos and writes per-video overlay mp4,
edge mp4, per-frame ellipse .npy and pupil-center pickle.

Example:
    python cli/evaluate.py --path2data videos/ --setting baseline_edge \
        --loadfile <ckpt dir or reference .pkl> --method ours
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cli.args import parse_args, experiment_from_args, build_edge_fn


def main(argv=None):
    args = parse_args(argv, train=False)
    cfg = experiment_from_args(args)

    import jax
    import jax.numpy as jnp

    from eghmd_tpu.config import resolve_variant
    from eghmd_tpu.inference import VideoPipeline
    from eghmd_tpu.models import build_model

    variant = resolve_variant(args.setting)
    model = build_model(args.model, variant, cfg.dtype,
                        seg_downscale=args.seg_downscale)
    img = jnp.zeros((1, 240, 320, 1), jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(lambda r, a, b: model.init(r, a, b, train=False))(rng, img, img)
    if args.loadfile:
        if args.loadfile.endswith(".pkl"):
            from eghmd_tpu.utils.torch_convert import load_reference_esfnet_checkpoint

            variables = jax.tree.map(
                jnp.asarray, load_reference_esfnet_checkpoint(args.loadfile, variant))
        else:
            raise SystemExit("pass a reference .pkl or train first (cli/train.py)")

    vp = VideoPipeline(model, variables, edge_fn=build_edge_fn(args, cfg.dtype),
                       edge_thres=bool(variant.edge_thres or args.edge_thres),
                       batch_frames=args.batch_frames, refine=True)
    vids = []
    for ext in ("*.avi", "*.mp4", "*.mkv"):
        vids += glob.glob(os.path.join(args.path2data, "**", ext), recursive=True)
    if not vids:
        raise SystemExit(f"no videos under {args.path2data}")
    for v in sorted(vids):
        print(f"evaluate {os.path.basename(v)}...")
        # write next to the video unless the source tree is read-only
        out_dir = args.visual_dir if args.visual_dir != "iris" else \
            os.path.join(os.path.dirname(v), "output")
        vp.process_video(v, out_dir, method=args.method,
                         write_videos=not args.no_overlay)
    print(f"processed {len(vids)} videos")


if __name__ == "__main__":
    main()
