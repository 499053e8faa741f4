#!/usr/bin/env python3
"""Export the serving step as a self-contained StableHLO artifact.

Bakes model + BDCN weights into one ``jax.export`` module whose only input
is a frame batch; a serving host loads it with
``eghmd_tpu.inference.load_serving_artifact`` (or any StableHLO runtime)
without needing the model code or checkpoints. The reference has no
deployment-bundle equivalent (its evaluate.py re-builds the torch modules
from source + .pkl every run, evaluate.py:315-371).

Examples:
    # flagship parity config with trained weights
    python cli/export.py --out artifacts/flagship \
        --ckpt logs/ritnet_v2/<exp>/checkpoints --setting baseline_edge

    # a gated distilled student (random weights if --ckpt omitted)
    python cli/export.py --out artifacts/student \
        --ckpt logs/distill/<exp>/checkpoints \
        --setting baseline_input_concat --chz 16
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, required=True, help="artifact directory")
    p.add_argument("--ckpt", type=str, default="",
                   help="orbax checkpoint dir with the model weights to bake "
                        "(train or distill CLI output); empty -> random init")
    p.add_argument("--bdcn_weights", type=str, default="",
                   help="reference BDCN checkpoint to convert and bake; "
                        "empty -> random init")
    p.add_argument("--setting", type=str, default="baseline_edge")
    p.add_argument("--chz", type=int, default=32)
    p.add_argument("--growth", type=float, default=1.2)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--batch_frames", type=int, default=64)
    p.add_argument("--edge_downscale", type=int, default=4)
    p.add_argument("--seg_downscale", type=int, default=2)
    p.add_argument("--input_downscale", type=int, default=1,
                   help="fast-input factor (must match how the checkpoint "
                        "was trained: cli/distill.py --input_downscale)")
    p.add_argument("--refine", action="store_true")
    p.add_argument("--platforms", type=str, default="tpu,cpu",
                   help="comma-separated lowering targets")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax.numpy as jnp

    from eghmd_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from eghmd_tpu.inference.serving import export_serving_artifact

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[args.dtype]
    variables = None
    if args.ckpt:
        from eghmd_tpu.training.checkpoints import load_checkpoint_variables

        variables = load_checkpoint_variables(args.ckpt)
    bdcn_vars = None
    if args.bdcn_weights:
        from eghmd_tpu.training.checkpoints import load_bdcn_variables

        bdcn_vars = load_bdcn_variables(args.bdcn_weights)

    provenance = {}
    if args.ckpt:
        provenance["ckpt"] = os.path.abspath(args.ckpt)
    if args.bdcn_weights:
        provenance["bdcn_weights"] = args.bdcn_weights
    out = export_serving_artifact(
        args.out, variables=variables, bdcn_vars=bdcn_vars,
        provenance=provenance or None,
        batch_frames=args.batch_frames,
        platforms=tuple(args.platforms.split(",")),
        dtype=dtype, refine=args.refine,
        edge_downscale=args.edge_downscale,
        seg_downscale=args.seg_downscale,
        input_downscale=args.input_downscale,
        setting=args.setting, chz=args.chz, growth=args.growth,
    )
    size = os.path.getsize(os.path.join(out, "serving.stablehlo"))
    print(f"exported {out} ({size / 1e6:.1f} MB, "
          f"platforms={args.platforms}, batch={args.batch_frames})")
    return out


if __name__ == "__main__":
    main()
