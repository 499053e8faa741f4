"""Jitted train/eval steps and the experiment driver.

TPU-native counterpart of the reference train driver (reference
train.py:51-489):
  * ONE jitted computation per step fusing the frozen edge net (when
    provided), ESF-Net forward/backward, optimizer update, and on-device
    batch metrics — the reference dispatches BDCN and the model separately
    per batch (train.py:266-282) and round-trips predictions to sklearn on
    CPU every batch (train.py:294-338);
  * optax Adam with the dsIdentify head partitioned out of the main
    optimizer and checkpoints (reference train.py:146, 447);
  * data parallelism via a jax.sharding Mesh: params replicated, batch
    sharded; XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..config import ExperimentConfig
from ..losses import compute_all_losses, conf_loss, el_pred_from_seg_centers
from ..losses.point import self_consistency_loss
from ..losses.total import LossOutputs
from ..metrics import seg_iou_metrics, point_metric, angle_metric
from ..geometry.points import unnorm_pts
from ..parallel import make_mesh, replicated_sharding
from .schedule import alpha_schedule, composite_stop_metric, EarlyStopping, ReduceLROnPlateau


class TrainState(NamedTuple):
    params: Any        # main model params (dsIdentify excluded)
    batch_stats: Any
    opt_state: Any
    ds_params: Any     # dsIdentify head params
    ds_opt_state: Any
    step: jnp.ndarray


def _apply_edge_threshold(edge, enabled: bool):
    """Hard edge threshold (reference utils.py:653-655): >= 0.1 -> 1.0."""
    if not enabled:
        return edge
    return jnp.where(edge >= 0.1, jnp.ones_like(edge), edge)


def batch_metrics(op, el_out, pred_c_seg, batch):
    """On-device metrics matching what the reference tracks per batch
    (train.py:294-338): per-class IoU, latent & seg center distances (px),
    angular errors (deg), scale ratios."""
    h, w = op.shape[1], op.shape[2]
    pred = jnp.argmax(op, axis=-1)
    mean_iou, per_class, _ = seg_iou_metrics(batch["target"], pred, batch["cond"][:, 1])

    pup_lat = unnorm_pts(el_out[:, 5:7], (h, w), jnp)
    iri_lat = unnorm_pts(el_out[:, 0:2], (h, w), jnp)
    pup_seg = unnorm_pts(pred_c_seg[:, 1], (h, w), jnp)
    iri_seg = unnorm_pts(pred_c_seg[:, 0], (h, w), jnp)
    pup_c_lat = point_metric(batch["pupil_center"], pup_lat, batch["cond"][:, 0])[0]
    iri_c_lat = point_metric(batch["iris_center"], iri_lat, batch["cond"][:, 1])[0]
    pup_c_seg = point_metric(batch["pupil_center"], pup_seg, batch["cond"][:, 0])[0]
    iri_c_seg = point_metric(batch["iris_center"], iri_seg, batch["cond"][:, 1])[0]
    pup_ang = angle_metric(batch["el_norm"][:, 1, 4], el_out[:, 9], batch["cond"][:, 1])[0]
    iri_ang = angle_metric(batch["el_norm"][:, 0, 4], el_out[:, 4], batch["cond"][:, 1])[0]
    return {
        "mean_iou": mean_iou,
        "per_class_iou": per_class,
        "pup_c_lat": pup_c_lat,
        "iri_c_lat": iri_c_lat,
        "pup_c_seg": pup_c_seg,
        "iri_c_seg": iri_c_seg,
        "pup_ang": pup_ang,
        "iri_ang": iri_ang,
    }


def _pad_pupil_only_op(op):
    """DeepVOG emits 2-channel (bg/pupil) logits; pad an unreachable iris
    channel so every 3-class consumer (argmax labels {0, 2}, soft-argmax of
    op[..., 2]) works unchanged (the reference remaps labels instead,
    test.py:157-158)."""
    neg = jnp.full_like(op[..., :1], -1e4)
    return jnp.concatenate([op[..., :1], neg, op[..., 1:]], axis=-1)


def make_train_step(model, ds_head_apply, tx, ds_tx, edge_fn=None,
                    edge_thres=False, self_corr=False, disentangle=True,
                    train_ds_head=True, donate=True, loss_mode="full"):
    """Build the jitted global-view train step.

    model: flax ESFNet-like module (apply(x, edge, train) -> op, el_out, latent)
    ds_head_apply: fn(ds_params, latent) -> logits
    edge_fn: optional fn(image[B,H,W,1]) -> edge[B,H,W,1] (frozen, fused in)
    loss_mode: 'full' (reference get_allLoss) or 'deepvog' (the DeepVOG
        baseline's own CE+seg2pt loss, reference deepvog_pytorch.py:151-168)
    """

    def loss_fn(params, batch_stats, ds_params, batch, edge, alpha):
        (op, el_out, latent), mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image"], edge, train=True, mutable=["batch_stats"],
        )
        if loss_mode == "deepvog":
            from ..models import deepvog_loss

            loss, pred_c = deepvog_loss(op, batch["target"],
                                        batch["pupil_center"], batch["cond"])
            op = _pad_pupil_only_op(op)
            z = jnp.zeros(())
            out = LossOutputs(loss, jnp.stack([pred_c, pred_c], axis=1),
                              z, z, z, z)
            if disentangle:
                logits = ds_head_apply(ds_params, latent)
                loss = loss + 2.0 * conf_loss(logits, batch["im_info"][:, 2], True)
            return loss, (mut["batch_stats"], op, el_out, latent, out)
        out = compute_all_losses(
            op, el_out, batch["target"], batch["pupil_center"], batch["el_norm"],
            batch["spat_weights"], batch["dist_map"], batch["cond"], alpha,
        )
        loss = out.total
        el_pred = el_pred_from_seg_centers(out.pred_c_seg, el_out)
        if self_corr:
            mask_valid = (1.0 - batch["cond"][:, 1]).astype(op.dtype)
            loss = loss + 10.0 * self_consistency_loss(op, el_pred, mask_valid)
        if disentangle:
            # confusion term only — the reference never activates the
            # secondary phase in its driver (SURVEY §2.3)
            logits = ds_head_apply(ds_params, latent)
            loss = loss + 2.0 * conf_loss(logits, batch["im_info"][:, 2], True)
        return loss, (mut["batch_stats"], op, el_out, latent, out)

    def ds_loss_fn(ds_params, latent, ds_id):
        logits = ds_head_apply(ds_params, jax.lax.stop_gradient(latent))
        return conf_loss(logits, ds_id, False)

    def train_step(state: TrainState, batch, alpha):
        edge = batch["edge"] if edge_fn is None else edge_fn(batch["image"])
        edge = jax.lax.stop_gradient(_apply_edge_threshold(edge, edge_thres))
        grads, (new_bs, op, el_out, latent, out) = jax.grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, state.ds_params, batch, edge, alpha)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        if train_ds_head and disentangle:
            ds_grads = jax.grad(ds_loss_fn)(state.ds_params, latent, batch["im_info"][:, 2])
            ds_updates, new_ds_opt = ds_tx.update(ds_grads, state.ds_opt_state, state.ds_params)
            new_ds_params = optax.apply_updates(state.ds_params, ds_updates)
        else:
            new_ds_params, new_ds_opt = state.ds_params, state.ds_opt_state

        metrics = batch_metrics(op, el_out, out.pred_c_seg, batch)
        metrics["loss"] = out.total
        new_state = TrainState(new_params, new_bs, new_opt, new_ds_params,
                               new_ds_opt, state.step + 1)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, edge_fn=None, edge_thres=False, loss_mode="full"):
    """Jitted eval step: forward + loss(alpha) + on-device metrics."""

    def eval_step(params, batch_stats, batch, alpha):
        edge = batch["edge"] if edge_fn is None else edge_fn(batch["image"])
        edge = _apply_edge_threshold(edge, edge_thres)
        op, el_out, latent = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image"], edge, train=False,
        )
        if loss_mode == "deepvog":
            from ..models import deepvog_loss

            loss, pred_c = deepvog_loss(op, batch["target"],
                                        batch["pupil_center"], batch["cond"])
            op = _pad_pupil_only_op(op)
            z = jnp.zeros(())
            out = LossOutputs(loss, jnp.stack([pred_c, pred_c], axis=1),
                              z, z, z, z)
            metrics = batch_metrics(op, el_out, out.pred_c_seg, batch)
            metrics["loss"] = loss
            el_pred = el_pred_from_seg_centers(out.pred_c_seg, el_out)
            return metrics, (op, el_out, el_pred, latent)
        out = compute_all_losses(
            op, el_out, batch["target"], batch["pupil_center"], batch["el_norm"],
            batch["spat_weights"], batch["dist_map"], batch["cond"], alpha,
        )
        metrics = batch_metrics(op, el_out, out.pred_c_seg, batch)
        metrics["loss"] = out.total
        el_pred = el_pred_from_seg_centers(out.pred_c_seg, el_out)
        return metrics, (op, el_out, el_pred, latent)

    return jax.jit(eval_step)


@dataclass
class Trainer:
    """Experiment driver: epochs, schedules, checkpoints, logging.

    Mirrors the reference epoch loop (train.py:246-489) minus its
    GPU->CPU->sklearn round trips: all step work happens in one jitted
    computation; only small metric scalars come back to the host.
    """

    config: ExperimentConfig
    model: Any
    ds_head: Any = None
    edge_fn: Optional[Callable] = None
    log_fn: Optional[Callable] = print
    logger: Any = None  # optional ExperimentLogger for TB scalars/grids/embeddings

    def __post_init__(self):
        cfg = self.config
        self.mesh = make_mesh(cfg.mesh_shape)
        self.tx = optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr)
        self.ds_tx = optax.adam(cfg.lr)
        self.plateau = ReduceLROnPlateau(lr=cfg.lr, patience=5, factor=0.1)
        self.early = EarlyStopping(patience=10, delta=1e-3)
        variant = cfg.variant
        loss_mode = "deepvog" if cfg.model == "deepvog" else "full"
        self.train_step = make_train_step(
            self.model,
            self._ds_apply,
            self.tx,
            self.ds_tx,
            edge_fn=self.edge_fn,
            edge_thres=bool(variant.edge_thres or cfg.edge_thres),
            self_corr=cfg.self_corr,
            disentangle=cfg.disentangle,
            donate=cfg.donate_state,
            loss_mode=loss_mode,
        )
        self.eval_step = make_eval_step(
            self.model, edge_fn=self.edge_fn,
            edge_thres=bool(variant.edge_thres or cfg.edge_thres),
            loss_mode=loss_mode,
        )

    def _ds_apply(self, ds_params, latent):
        if self.ds_head is None:
            # degenerate 0-logit head; conf_loss on it is constant
            return jnp.zeros((latent.shape[0], 2), latent.dtype)
        return self.ds_head.apply({"params": ds_params}, latent)

    def init_state(self, sample_batch, rng=None) -> TrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(self.config.seed)
        # traced init: eager flax init dispatches every conv as its own XLA
        # program — a single jitted init compiles once
        variables = jax.jit(
            lambda r, a, b: self.model.init(r, a, b, train=False)
        )(rng, sample_batch["image"], sample_batch["edge"])
        params = variables["params"]
        if self.config.weights_init != "flax":
            from ..utils.init import INIT_SCHEMES

            params = INIT_SCHEMES[self.config.weights_init](
                params, jax.random.fold_in(rng, 1))
        batch_stats = variables.get("batch_stats", {})
        if self.ds_head is not None:
            latent_dim = self.config.variant.feature_channels
            ds_vars = self.ds_head.init(rng, jnp.zeros((1, latent_dim)))
            ds_params = ds_vars["params"]
        else:
            ds_params = {}
        state = TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            ds_params=ds_params,
            ds_opt_state=self.ds_tx.init(ds_params),
            step=jnp.zeros((), jnp.int32),
        )
        return jax.device_put(state, replicated_sharding(self.mesh))

    def set_lr(self, state: TrainState, lr: float) -> TrainState:
        # Keep the new scalar on the OLD leaf's sharding: a bare jnp.asarray
        # lands as SingleDeviceSharding, which differs from the jit output's
        # NamedSharding and changes the train-step cache key — forcing a full
        # recompile of the train program at the first epoch boundary (and
        # OOM-killing the axon compile helper on big programs).
        opt_state = state.opt_state
        old = opt_state.hyperparams["learning_rate"]
        new = jnp.asarray(lr, jnp.float32)
        if hasattr(old, "sharding"):
            new = jax.device_put(new, old.sharding)
        opt_state.hyperparams["learning_rate"] = new
        return state._replace(opt_state=opt_state)

    def run_epoch(self, state, pipeline, epoch):
        # alpha rides as a python float: jit traces it as a weak-typed f32
        # scalar whose cache key is value-independent, so the per-epoch
        # schedule does NOT respecialize the step (committed histories
        # confirm: epochs 2+ run at steady state with changing alpha).
        # Keeping the signature byte-stable also preserves server-side
        # persistent-cache hits for the big train programs.
        alpha = alpha_schedule(epoch, self.config.epochs)
        if hasattr(pipeline, "set_epoch"):
            pipeline.set_epoch(epoch)  # resume-reproducible shuffle order
        agg = []
        t0 = time.time()
        nb = 0
        # first-class device tracing (SURVEY §5): capture the first few
        # steps of the first epoch into a TensorBoard-loadable trace
        tracing = bool(self.config.profile_dir) and epoch == 0
        if tracing:
            jax.profiler.start_trace(self.config.profile_dir)
        for batch in pipeline:
            state, metrics = self.train_step(state, batch, alpha)
            agg.append(metrics)
            nb += 1
            if tracing and nb >= 3:
                # host fetch, not block_until_ready: on the axon tunnel the
                # latter can return before execution finishes (see bench._fence)
                jax.device_get(metrics["loss"])
                jax.profiler.stop_trace()
                tracing = False
            if self.config.test_normal and nb >= 50:
                # truncated-run sanity flag: stop after 50 batches
                # (reference train.py:263)
                break
        if tracing:  # short epoch: close the trace cleanly
            jax.profiler.stop_trace()
        agg = jax.device_get(agg)
        summary = {
            k: float(np.nanmean([np.asarray(m[k]) for m in agg]))
            for k in agg[0]
            if k != "per_class_iou"
        }
        summary["per_class_iou"] = np.nanmean(
            np.stack([np.asarray(m["per_class_iou"]) for m in agg]), axis=0
        )
        summary["sec"] = time.time() - t0
        summary["steps"] = nb
        summary["steps_per_sec"] = nb / max(summary["sec"], 1e-9)
        summary["samples_per_sec"] = (nb * self.config.batchsize
                                      / max(summary["sec"], 1e-9))
        return state, summary

    def evaluate(self, state, pipeline, alpha=0.0, max_batches=None):
        agg = []
        for i, batch in enumerate(pipeline):
            if max_batches is not None and i >= max_batches:
                break
            metrics, _ = self.eval_step(state.params, state.batch_stats, batch, alpha)
            agg.append(metrics)
        agg = jax.device_get(agg)
        out = {
            k: float(np.nanmean([np.asarray(m[k]) for m in agg]))
            for k in agg[0]
            if k != "per_class_iou"
        }
        out["per_class_iou"] = np.nanmean(
            np.stack([np.asarray(m["per_class_iou"]) for m in agg]), axis=0
        )
        return out

    def stop_metric(self, valid):
        return composite_stop_metric(
            valid["mean_iou"], valid["pup_c_lat"], valid["iri_c_lat"],
            valid["pup_ang"], valid["iri_ang"],
        )

    def fit(self, train_pipe, valid_pipe, checkpointer=None, start_epoch=0,
            state=None, test_pipe=None, tb_every: int = 5):
        """Full training run. Returns (state, history).

        ``state`` may be a pre-initialized/restored TrainState (resume or
        pretrained bootstrap — reference train.py:151-178); ``start_epoch``
        continues the alpha/LR schedules from that epoch. ``test_pipe``
        enables the reference's per-epoch cross-dataset protocol
        (train.py:470-481): the held-out split is evaluated whenever the
        stop metric improves. With a ``logger``, TB scalars are written
        every epoch and prediction grids + latent embeddings every
        ``tb_every`` epochs (train.py:433-439).
        """
        if state is None:
            state = self.init_state(next(iter(valid_pipe)))
        if checkpointer is not None and start_epoch > 0:
            from .schedule import restore_schedule_state

            if restore_schedule_state(checkpointer.directory, self.plateau,
                                      self.early):
                state = self.set_lr(state, self.plateau.lr)
        history = []
        for epoch in range(start_epoch, self.config.epochs):
            state, train_sum = self.run_epoch(state, train_pipe, epoch)
            alpha = alpha_schedule(epoch, self.config.epochs)
            valid_sum = self.evaluate(state, valid_pipe, alpha=alpha)
            metric = self.stop_metric(valid_sum)
            new_lr = self.plateau.step(metric)
            state = self.set_lr(state, new_lr)
            improved = self.early.step(metric)
            record = {"epoch": epoch, "train": train_sum, "valid": valid_sum,
                      "stop_metric": metric, "lr": new_lr}
            if test_pipe is not None and improved:
                test_sum = self.evaluate(state, test_pipe, alpha=0.0)
                record["test"] = test_sum
                if self.log_fn:
                    self.log_fn(f"epoch {epoch}: cross-dataset test mIoU "
                                f"{test_sum['mean_iou']:.4f}")
            history.append(record)
            if self.logger is not None:
                self.logger.scalars(epoch, train_sum, valid_sum)
                if epoch % tb_every == 0:
                    self._tb_snapshots(state, valid_pipe, epoch)
            if self.log_fn:
                self.log_fn(
                    f"epoch {epoch}: loss {train_sum['loss']:.4f} "
                    f"mIoU {valid_sum['mean_iou']:.4f} stop {metric:.4f} lr {new_lr:.2e}"
                )
            if checkpointer is not None:
                checkpointer.save(epoch, state, is_best=improved)
                from .schedule import save_schedule_state

                save_schedule_state(checkpointer.directory, self.plateau,
                                    self.early)
            if self.early.early_stop:
                if self.log_fn:
                    self.log_fn(f"early stopping at epoch {epoch}")
                break
        return state, history

    def _tb_snapshots(self, state, pipe, epoch):
        """Prediction grid + latent embedding from one validation batch."""
        batch = next(iter(pipe))
        _, (op, _, _, latent) = self.eval_step(state.params, state.batch_stats,
                                               batch, 0.0)
        images = np.asarray(batch["image"])[..., 0]
        preds = np.asarray(jnp.argmax(op, axis=-1))
        targets = np.asarray(batch["target"])
        self.logger.prediction_grid(epoch, images, preds, targets)
        self.logger.embedding(epoch, np.asarray(latent),
                              labels=np.asarray(batch["im_info"][:, 2]).tolist())
