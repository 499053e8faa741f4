"""The one-dispatch serving step and AOT serving artifacts.

The serving path (reference evaluate.py:112-166: per-eye preprocess ->
frozen BDCN edge -> ESF-Net -> seg argmax + soft-argmax centers -> ellipse
un-normalization) is built here as a single jittable function over a batch
of dual-eye frames. ``bench.py`` times it; :func:`export_serving_artifact`
freezes it — weights baked in as constants — into a portable StableHLO
module via ``jax.export`` that a serving host can load and run without the
model code or checkpoint (the TPU-native analog of a TorchScript/ONNX
deployment bundle, which the reference does not have).
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


def build_serving_step(dtype=jnp.bfloat16, refine=False, edge_downscale=1,
                       seg_downscale=1, setting="baseline_edge", chz=32,
                       growth=1.2, rng_seed=0,
                       eye_size: Tuple[int, int] = (240, 320),
                       frame_size: Tuple[int, int] = (400, 640),
                       input_downscale=1):
    """Build (step_fn, variables, bdcn_vars) for the dual-eye serving path.

    ``step_fn(variables, bdcn_vars, frames[B, Hf, Wf])`` returns
    ``(seg[2B, H, W] uint8, iris_px[2B, 5], pupil_px[2B, 5])`` with the two
    eyes stacked on the batch axis (left eyes first), frames split at
    Wf/2 like reference evaluate.py:242-243.
    """
    from ..config import VARIANT_PRESETS, scaled_variant
    from ..models import ESFNet
    from ..models.bdcn import BDCN, edge_input_dims, make_edge_fn
    from .preprocess import preprocess_frames
    from ..losses import el_pred_from_seg_centers
    from ..geometry.ellipse import transform_ellipse, unnorm_mat
    from ..ops import refine_ellipse_batch, seg_centers

    h, w = eye_size
    half_w = frame_size[1] // 2
    rng = jax.random.PRNGKey(rng_seed)
    variant = VARIANT_PRESETS[setting]
    if chz != 32 or growth != 1.2:
        # width-scaled serving student (training/distill.py)
        variant = scaled_variant(variant, chz, growth)
    model = ESFNet(setting=variant, dtype=dtype, chz=chz, growth=growth,
                   seg_downscale=seg_downscale,
                   input_downscale=input_downscale)
    x0 = jnp.zeros((1, h, w, 1), jnp.float32)
    # traced init: eager flax init dispatches each conv separately
    variables = jax.jit(lambda r, a, b: model.init(r, a, b, train=False))(rng, x0, x0)

    needs_edge = not (variant.add_edge == 0 and variant.input_concat == 0
                      and variant.only_edge == 0)
    bdcn = BDCN(dtype=dtype)
    eh, ew = edge_input_dims(h, w, edge_downscale)
    bdcn_vars = jax.jit(bdcn.init)(rng, jnp.zeros((1, eh, ew, 3), jnp.float32))
    edge_fn = make_edge_fn(bdcn_vars, dtype=dtype, downscale=edge_downscale)

    def step(variables, bdcn_vars, frames):
        eyes = jnp.concatenate(
            [frames[:, :, :half_w], frames[:, :, half_w:2 * half_w]], axis=0)
        img, _ = preprocess_frames(eyes, (h, w))
        edge = edge_fn(img) if needs_edge else jnp.zeros_like(img)
        op, el_out, _ = model.apply(variables, img, edge, train=False)
        el_pred = el_pred_from_seg_centers(seg_centers(op), el_out)
        seg = jnp.argmax(op, axis=-1).astype(jnp.uint8)
        hu = unnorm_mat(h, w, jnp, dtype=jnp.float32)
        iris_px = transform_ellipse(el_pred[:, :5].astype(jnp.float32), hu, jnp)
        pupil_px = transform_ellipse(el_pred[:, 5:].astype(jnp.float32), hu, jnp)
        if refine:
            # one batched refinement over [iris; pupil] masks (2B rows)
            masks = jnp.concatenate([(seg == 1), (seg == 2)]).astype(jnp.float32)
            els = jnp.concatenate([iris_px, pupil_px], axis=0)
            ref = refine_ellipse_batch(masks, els)
            iris_px, pupil_px = ref[:seg.shape[0]], ref[seg.shape[0]:]
        return seg, iris_px, pupil_px

    return step, variables, bdcn_vars


MANIFEST = "manifest.json"
MODULE = "serving.stablehlo"


def export_serving_artifact(out_dir: str, variables=None, bdcn_vars=None,
                            batch_frames: int = 64,
                            platforms: Tuple[str, ...] = ("tpu", "cpu"),
                            provenance=None, **build_kwargs) -> str:
    """Freeze the serving step into a self-contained StableHLO artifact.

    Weights are baked into the module as constants; the artifact's only
    input is the frame batch ``[batch_frames, Hf, Wf] f32``. Pass
    ``variables``/``bdcn_vars`` (e.g. restored from a checkpoint) to bake
    trained weights; omitted, the freshly initialized ones are used.
    ``provenance`` (a dict, e.g. checkpoint paths) is recorded verbatim in
    the manifest so a deployed artifact traces back to the gate evidence
    of the weights it bakes. Returns the artifact directory.
    """
    from jax import export as jexport

    step, init_vars, init_bdcn = build_serving_step(**build_kwargs)
    variables = variables if variables is not None else init_vars
    bdcn_vars = bdcn_vars if bdcn_vars is not None else init_bdcn

    frame_size = build_kwargs.get("frame_size", (400, 640))
    spec = jax.ShapeDtypeStruct((batch_frames, *frame_size), jnp.float32)
    fn = jax.jit(lambda frames: step(variables, bdcn_vars, frames))
    if len(platforms) > 1:
        # portable artifact: the Pallas soft-argmax cannot multi-platform
        # lower; swap in the numerically-equivalent XLA path
        from ..ops.pallas_softargmax import reference_softargmax

        with reference_softargmax():
            exported = jexport.export(fn, platforms=list(platforms))(spec)
    else:
        exported = jexport.export(fn, platforms=list(platforms))(spec)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, MODULE), "wb") as f:
        f.write(exported.serialize())
    manifest = {
        "input": {"shape": list(spec.shape), "dtype": "float32"},
        "outputs": ["seg[2B,H,W] uint8 (eyes stacked: left half first)",
                    "iris_px[2B,5]", "pupil_px[2B,5]"],
        "platforms": list(platforms),
        "build": {k: (str(v) if k == "dtype" else v)
                  for k, v in build_kwargs.items()},
        **({"provenance": provenance} if provenance else {}),
        "batch_frames": batch_frames,
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2, default=str)
    return out_dir


def load_serving_artifact(art_dir: str):
    """Load an exported artifact. Returns (call, manifest): ``call(frames)``
    runs the baked serving step on the current default platform."""
    from jax import export as jexport

    with open(os.path.join(art_dir, MODULE), "rb") as f:
        exported = jexport.deserialize(f.read())
    with open(os.path.join(art_dir, MANIFEST)) as f:
        manifest = json.load(f)
    return exported.call, manifest
