"""BDCN self-training: make the edge-guided stack trainable from nothing.

The reference's defining input is a FROZEN pretrained BDCN whose weights
(``gen_00000016.pt``) are absent from its repo (.MISSING_LARGE_BLOBS:2,
loaded at reference train.py:126-127) and it ships no training code for it —
so out of the box the paper's edge-guided behavior is unreachable end-to-end.
This module closes that gap with a TPU-native training recipe:

  * supervision: boundary maps derived on-device from the segmentation
    labels the datasets already carry (iris/pupil contour pixels — exactly
    the content the paper wants from its edge stage: "only eyelid and
    iris/pupil contours", and what the synthetic stand-in edge maps encode,
    data/synthetic.py::render_edge_map);
  * objective: per-image class-balanced binary cross-entropy applied to all
    11 outputs — the 10 cascade maps and the fuse map (output structure:
    reference bdcn_new.py:165-191). Balance weights follow the BDCN paper
    (He et al., CVPR'19): positives weighted by the negative fraction,
    negatives by 1.1x the positive fraction; side losses weighted 0.5 and
    the fuse loss 1.1. Computed from logits (stable log-sigmoid form);
  * driver: ONE jitted step (forward + backward + adam), batch shardable
    over the data mesh like every other trainer here.

After training, freeze the checkpoint and pass it to any edge-consuming
variant via ``--bdcn_weights <orbax dir>`` (cli/args.py::build_edge_fn) —
the same wiring the reference uses for its pretrained blob.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..models.bdcn import BDCN


def boundary_map_from_labels(target, dilate: int = 1):
    """Derive a binary boundary map [B,H,W,1] from seg labels [B,H,W].

    A pixel is boundary iff its label differs from a 4-neighbor (both sides
    of the contour are marked, matching the reference's 2-px-wide cv2 edge
    convention in its spatial-weight path, CurriculumLib.py:128-129 — and
    the synthetic ground-truth edge maps). ``dilate`` grows the band with a
    (2d+1)^2 max-pool; class-balanced BCE needs a couple of positive pixels
    per contour to be stable at high resolutions.
    """
    lab = target.astype(jnp.int32)
    down = jnp.not_equal(lab[:, :-1, :], lab[:, 1:, :])
    right = jnp.not_equal(lab[:, :, :-1], lab[:, :, 1:])
    edge = jnp.zeros(lab.shape, jnp.float32)
    edge = edge.at[:, :-1, :].max(down.astype(jnp.float32))
    edge = edge.at[:, 1:, :].max(down.astype(jnp.float32))
    edge = edge.at[:, :, :-1].max(right.astype(jnp.float32))
    edge = edge.at[:, :, 1:].max(right.astype(jnp.float32))
    if dilate > 0:
        k = 2 * dilate + 1
        edge = jax.lax.reduce_window(
            edge, -jnp.inf, jax.lax.max, (1, k, k), (1, 1, 1), "SAME")
    return edge[..., None]


def class_balanced_bce(logit, y, neg_scale: float = 1.1):
    """Per-image class-balanced BCE from logits (BDCN/HED convention).

    logit, y: [B,H,W,1]; y binary. Positives (edge pixels, ~2% of the
    image) are weighted by the negative fraction and vice versa so the
    all-background solution is not a minimum. Returns a scalar (mean over
    batch of per-image means).
    """
    y = y.astype(jnp.float32)
    z = logit.astype(jnp.float32)
    n = y[0].size
    npos = jnp.sum(y, axis=(1, 2, 3), keepdims=True)
    w_pos = (n - npos) / n
    w_neg = neg_scale * npos / n
    # stable BCE-with-logits: softplus(-z) = -log sigmoid(z)
    per_px = (w_pos * y * jax.nn.softplus(-z)
              + w_neg * (1.0 - y) * jax.nn.softplus(z))
    return jnp.mean(jnp.sum(per_px, axis=(1, 2, 3)) / n)


def bdcn_loss(outputs_logits, y, side_weight: float = 0.5,
              fuse_weight: float = 1.1):
    """Total BDCN objective over the 10 cascade outputs + fuse."""
    sides = outputs_logits[:-1]
    fuse = outputs_logits[-1]
    loss = fuse_weight * class_balanced_bce(fuse, y)
    for s in sides:
        loss = loss + side_weight * class_balanced_bce(s, y)
    return loss


def edge_f1(fuse_prob, y, thr: float = 0.1):
    """Precision/recall/F1 of the thresholded fuse map vs the boundary map.

    ``thr=0.1`` matches the downstream hard threshold the edge_thres parity
    configs apply to the fuse map (reference utils.py:653-655).
    """
    pred = (fuse_prob >= thr).astype(jnp.float32)
    y = y.astype(jnp.float32)
    tp = jnp.sum(pred * y)
    prec = tp / jnp.maximum(jnp.sum(pred), 1.0)
    rec = tp / jnp.maximum(jnp.sum(y), 1.0)
    f1 = 2 * prec * rec / jnp.maximum(prec + rec, 1e-12)
    return {"precision": prec, "recall": rec, "f1": f1}


def bdcn_reference_init(params, seed: int = 0):
    """Re-draw BDCN params with the reference's from-scratch init scheme —
    the flax default (lecun) init is unstable for this normalization-free
    VGG cascade (measured: even a one-batch overfit diverges).

    Scheme (reference bdcn_new.py:193-217 + vgg16_c.py:90-105):
      * VGG convs: He fan-out normal, std = sqrt(2 / (kh*kw*out_c));
      * MSBlock / down / score convs: normal(0, 0.01);
      * fuse conv: constant 0.080;
      * all biases zero.
    Small head weights start every side logit near zero (sigmoid 0.5), so
    the early balanced-BCE gradients are moderate and well-scaled.
    """
    rng = np.random.RandomState(seed)

    def redraw(path, leaf):
        keys = [getattr(p, "key", str(p)) for p in path]
        shape = leaf.shape
        if keys[-1] == "bias":
            return jnp.zeros(shape, leaf.dtype)
        if keys[0] == "fuse":
            return jnp.full(shape, 0.080, leaf.dtype)
        if keys[0] == "features":
            n = shape[0] * shape[1] * shape[-1]  # kh*kw*out_c (HWIO)
            return jnp.asarray(
                rng.normal(0.0, np.sqrt(2.0 / n), shape), leaf.dtype)
        return jnp.asarray(rng.normal(0.0, 0.01, shape), leaf.dtype)

    return jax.tree_util.tree_map_with_path(redraw, params)


def make_bdcn_train_step(model: BDCN, tx, dilate: int = 1):
    def loss_fn(params, batch):
        outs = model.apply({"params": params},
                           jnp.repeat(batch["image"], 3, axis=-1),
                           logits=True)
        y = boundary_map_from_labels(batch["target"], dilate=dilate)
        loss = bdcn_loss(outs, y)
        return loss, (jax.nn.sigmoid(outs[-1]), y)

    def train_step(params, opt_state, batch):
        (loss, (fuse, y)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {"loss": loss, **edge_f1(fuse, y)}
        return params, opt_state, metrics

    return jax.jit(train_step, donate_argnums=(0, 1))


def make_bdcn_eval_step(model: BDCN, dilate: int = 1):
    def eval_step(params, batch):
        fuse = model.apply({"params": params},
                           jnp.repeat(batch["image"], 3, axis=-1))[-1]
        y = boundary_map_from_labels(batch["target"], dilate=dilate)
        return edge_f1(fuse, y)

    return jax.jit(eval_step)


@dataclass
class BDCNTrainer:
    """Minimal experiment driver for the edge stage.

    ``total_steps`` > 0 enables a cosine decay of the learning rate to
    ``lr * 0.01`` over that many optimizer steps — the fixed-LR recipe
    plateaus around val F1 0.47 on the degraded distribution while the
    edge-ablation oracle arm shows the guidance mechanism has more to buy
    (VERDICT r4 #5); the tail of the schedule is where the thin contour
    bands sharpen.
    """

    lr: float = 1e-3
    dilate: int = 1
    dtype: Any = jnp.float32
    total_steps: int = 0
    log_fn: Optional[Any] = print
    model: BDCN = field(init=False)

    def __post_init__(self):
        self.model = BDCN(dtype=self.dtype)
        # measured on a one-batch overfit (64x96): flax default init
        # diverges at every lr; reference init + clip(1.0) + adam(1e-3)
        # is the fastest stable point (loss 1.07 -> 0.60, f1 0.51 in 40
        # steps; 1e-4 and 3e-4 converge slower, 1e-3 unclipped explodes)
        lr = (optax.cosine_decay_schedule(self.lr, self.total_steps,
                                          alpha=0.01)
              if self.total_steps > 0 else self.lr)
        self.tx = optax.chain(optax.clip_by_global_norm(1.0),
                              optax.adam(lr))
        self.train_step = make_bdcn_train_step(self.model, self.tx,
                                               self.dilate)
        self.eval_step = make_bdcn_eval_step(self.model, self.dilate)

    def init_params(self, sample_batch, seed: int = 0):
        x = jnp.repeat(sample_batch["image"], 3, axis=-1)
        variables = jax.jit(self.model.init)(jax.random.PRNGKey(seed), x)
        return bdcn_reference_init(variables["params"], seed=seed)

    def fit(self, train_pipe, valid_pipe=None, epochs: int = 5, params=None,
            checkpoint_dir: Optional[str] = None):
        if params is None:
            params = self.init_params(next(iter(train_pipe)))
        opt_state = self.tx.init(params)
        history = []
        best_f1, best_params = -1.0, None
        for epoch in range(epochs):
            if hasattr(train_pipe, "set_epoch"):
                train_pipe.set_epoch(epoch)
            agg, t0 = [], time.time()
            for batch in train_pipe:
                params, opt_state, m = self.train_step(params, opt_state,
                                                       batch)
                agg.append(m)
            agg = jax.device_get(agg)
            rec = {k: float(np.mean([a[k] for a in agg])) for k in agg[0]}
            rec["epoch"] = epoch
            rec["sec"] = time.time() - t0
            if valid_pipe is not None:
                va = jax.device_get(
                    [self.eval_step(params, b) for b in valid_pipe])
                rec.update({f"val_{k}": float(np.mean([a[k] for a in va]))
                            for k in va[0]})
            history.append(rec)
            if rec.get("val_f1", rec["f1"]) > best_f1:
                # the served artifact is the BEST val-F1 state, not the
                # final epoch's — a long cosine run must not regress the
                # checkpoint if the tail wobbles
                best_f1 = rec.get("val_f1", rec["f1"])
                best_params = jax.device_get(params)
            if self.log_fn:
                msg = (f"bdcn epoch {epoch}: loss {rec['loss']:.4f} "
                       f"f1 {rec['f1']:.4f}")
                if "val_f1" in rec:
                    msg += f" val_f1 {rec['val_f1']:.4f}"
                self.log_fn(msg)
        if best_params is not None:
            params = jax.tree.map(jnp.asarray, best_params)
        if checkpoint_dir is not None:
            save_bdcn_checkpoint(checkpoint_dir, params)
        return params, history


def save_bdcn_checkpoint(directory: str, params) -> None:
    import os

    import orbax.checkpoint as ocp

    ocp.PyTreeCheckpointer().save(
        os.path.abspath(os.path.join(directory, "bdcn")),
        {"params": jax.device_get(params)}, force=True)


def load_bdcn_checkpoint(directory: str):
    """Restore BDCN variables saved by :func:`save_bdcn_checkpoint` (accepts
    the directory that contains ``bdcn/`` or the ``bdcn`` path itself)."""
    import os

    path = os.path.abspath(directory)
    for sub in ("bdcn", os.path.join("checkpoints", "bdcn")):
        if os.path.isdir(os.path.join(path, sub)):
            path = os.path.join(path, sub)
            break
    from .checkpoints import restore_pytree

    raw = restore_pytree(path)
    return {"params": jax.tree.map(jnp.asarray, raw["params"])}
