"""Headline benchmark: end-to-end dual-eye inference throughput.

Measures the full serving path on one chip at the reference's operating point
(640x400 dual-eye IR frames, split at x=320, each eye -> 240x320 — reference
evaluate.py:242-247): frame split + preprocess + frozen BDCN edge net +
ESF-Net (baseline_edge) + soft-argmax centers + ellipse unnormalization, all
in ONE jitted bf16 computation. Weights are random (the pretrained blobs are
not in this image); throughput is weight-independent.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline relative to the 5,000 frames/sec/chip north star (BASELINE.md).
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def build_pipeline(dtype=jnp.bfloat16, batch_frames=32, refine=False):
    from eghmd_tpu.config import VARIANT_PRESETS
    from eghmd_tpu.models import ESFNet
    from eghmd_tpu.models.bdcn import BDCN, make_edge_fn
    from eghmd_tpu.inference.preprocess import preprocess_frames
    from eghmd_tpu.losses import compute_all_losses, el_pred_from_seg_centers
    from eghmd_tpu.geometry.ellipse import transform_ellipse, unnorm_mat
    from eghmd_tpu.ops import refine_ellipse_batch

    rng = jax.random.PRNGKey(0)
    model = ESFNet(setting=VARIANT_PRESETS["baseline_edge"], dtype=dtype)
    x0 = jnp.zeros((1, 240, 320, 1), jnp.float32)
    # jit the inits: eager flax init dispatches each conv separately (minutes
    # of per-op compiles on TPU); one traced init compiles in seconds
    variables = jax.jit(lambda r, a, b: model.init(r, a, b, train=False))(rng, x0, x0)

    bdcn = BDCN(dtype=dtype)
    bdcn_vars = jax.jit(bdcn.init)(rng, jnp.zeros((1, 240, 320, 3), jnp.float32))
    edge_fn = make_edge_fn(bdcn_vars, dtype=dtype)

    def step(variables, bdcn_vars, frames):
        b = frames.shape[0]
        eyes = jnp.concatenate([frames[:, :, :320], frames[:, :, 320:640]], axis=0)
        img, _ = preprocess_frames(eyes, (240, 320))
        edge = edge_fn(img)
        op, el_out, _ = model.apply(variables, img, edge, train=False)
        n, h, w = 2 * b, 240, 320
        out = compute_all_losses(
            op, el_out, jnp.zeros((n, h, w), jnp.int32), jnp.zeros((n, 2)),
            jnp.zeros((n, 2, 5)), jnp.zeros((n, h, w)), jnp.zeros((n, h, w, 3)),
            jnp.zeros((n, 4)), 0.0,
        )
        el_pred = el_pred_from_seg_centers(out.pred_c_seg, el_out)
        seg = jnp.argmax(op, axis=-1).astype(jnp.uint8)
        hu = unnorm_mat(h, w, jnp, dtype=jnp.float32)
        iris_px = transform_ellipse(el_pred[:, :5].astype(jnp.float32), hu, jnp)
        pupil_px = transform_ellipse(el_pred[:, 5:].astype(jnp.float32), hu, jnp)
        if refine:
            iris_px = refine_ellipse_batch((seg == 1).astype(jnp.float32), iris_px)
            pupil_px = refine_ellipse_batch((seg == 2).astype(jnp.float32), pupil_px)
        return seg, iris_px, pupil_px

    jitted = jax.jit(step)
    frames = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, (batch_frames, 400, 640)),
        jnp.float32,
    )
    return jitted, variables, bdcn_vars, frames


def measure(jitted, variables, bdcn_vars, frames, iters=30, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(jitted(variables, bdcn_vars, frames))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(variables, bdcn_vars, frames)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return frames.shape[0] * iters / dt


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--batch-frames", type=int, default=32)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--refine", action="store_true",
                   help="include on-device ellipse refinement in the timed path")
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[args.dtype]
    jitted, variables, bdcn_vars, frames = build_pipeline(
        dtype=dtype, batch_frames=args.batch_frames, refine=args.refine
    )
    fps = measure(jitted, variables, bdcn_vars, frames, iters=args.iters)
    metric = "e2e_dual_eye_inference_fps_640x400"
    if args.refine:
        metric += "_refined"
    print(json.dumps({
        "metric": metric,
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 5000.0, 4),
    }))


if __name__ == "__main__":
    main()
