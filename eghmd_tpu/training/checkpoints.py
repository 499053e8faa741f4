"""Checkpoint / resume management (orbax).

Counterpart of the reference's checkpointing (SURVEY §5): per-epoch
``<model>_<ep>.pkl`` saves with dsIdentify keys stripped (reference
train.py:445-447, 486-488), a best-metric checkpoint via EarlyStopping
(pytorchtools.py:60-67), and priority-ordered resume (pytorchtools.py:140-154:
checkpoint first, then the explicit loadfile).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def _to_saveable(state, include_ds=False):
    d = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if include_ds:
        # the reference strips dsIdentify from saved checkpoints
        d["ds_params"] = state.ds_params
    return d


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ocp = ocp
        self._ckptr = ocp.PyTreeCheckpointer()
        self.keep = keep

    def _path(self, tag):
        return os.path.join(self.directory, str(tag))

    def save(self, epoch: int, state, is_best: bool = False):
        self._ckptr.save(self._path(f"epoch_{epoch}"), _to_saveable(state), force=True)
        if is_best:
            self._ckptr.save(self._path("best"), _to_saveable(state), force=True)
        self._gc(epoch)

    def _gc(self, newest_epoch: int):
        eps = sorted(
            int(d.split("_")[1]) for d in os.listdir(self.directory)
            if d.startswith("epoch_")
        )
        for e in eps[: max(0, len(eps) - self.keep)]:
            import shutil

            shutil.rmtree(self._path(f"epoch_{e}"), ignore_errors=True)

    def latest_epoch(self) -> Optional[int]:
        eps = [
            int(d.split("_")[1]) for d in os.listdir(self.directory)
            if d.startswith("epoch_")
        ]
        return max(eps) if eps else None

    def restore(self, state, tag=None):
        """Restore into an existing (template) state. Priority: explicit tag,
        then best, then latest epoch (reference load priority semantics)."""
        if tag is None:
            if os.path.isdir(self._path("best")):
                tag = "best"
            else:
                ep = self.latest_epoch()
                if ep is None:
                    raise FileNotFoundError(f"no checkpoints under {self.directory}")
                tag = f"epoch_{ep}"
        template = _to_saveable(state)
        restored = self._ckptr.restore(self._path(tag), item=template)
        return state._replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )

    def restore_weights_only(self, state, tag=None):
        """Pretrained-bootstrap restore: params + batch_stats, fresh optimizer.

        Counterpart of the reference's pretrained bootstrap path
        (train.py:162-172 via partial_weight_loading) — model weights come
        from the checkpoint, training state starts from scratch.
        """
        restored = self.restore(state, tag=tag)
        return state._replace(params=restored.params,
                              batch_stats=restored.batch_stats)


def resolve_checkpoint_dir(path: str) -> str:
    """Resolve a CheckpointManager directory to one orbax checkpoint path:
    prefer ``best``, else the highest ``epoch_N``; a path that is already a
    single checkpoint is returned unchanged. Shared by cli/export.py and
    cli/distill.py (reference load-priority semantics,
    pytorchtools.py:140-154)."""
    entries = set(os.listdir(path))
    if "best" in entries:
        return os.path.join(path, "best")
    epochs = [int(e.split("_")[1]) for e in entries if e.startswith("epoch_")]
    if epochs:
        return os.path.join(path, f"epoch_{max(epochs)}")
    return path


def restore_pytree(path: str):
    """Restore an orbax PyTree checkpoint, platform-portably.

    A checkpoint saved on one backend (e.g. the TPU) records device
    shardings that don't exist on another (e.g. a CPU serving/export
    host); when the default restore rejects them, the tree is restored
    as plain host numpy instead.
    """
    import numpy as np
    import orbax.checkpoint as ocp

    p = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    try:
        return ckptr.restore(p)
    except ValueError:
        meta = ckptr.metadata(p)  # StepMetadata -> TreeMetadata -> plain tree
        tree = getattr(meta, "item_metadata", meta)
        tree = getattr(tree, "tree", tree)
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
        return ckptr.restore(p, restore_args=restore_args)


def load_checkpoint_variables(path: str):
    """Load ``{'params', 'batch_stats'}`` model variables from an orbax
    checkpoint directory (manager dir or single checkpoint)."""
    import jax.numpy as jnp

    raw = restore_pytree(resolve_checkpoint_dir(path))
    return jax.tree.map(jnp.asarray, {
        "params": raw["params"], "batch_stats": raw.get("batch_stats", {})})


def load_bdcn_variables(spec: str):
    """Resolve a ``--bdcn_weights``-style spec to BDCN variables.

    Accepts an orbax directory (the in-repo self-training recipe,
    cli/train_bdcn.py) or a torch checkpoint file (the reference's
    pretrained blob, converted). Shared by cli/args.py::build_edge_fn
    and cli/export.py so the two can't drift.
    """
    import jax.numpy as jnp

    if os.path.isdir(spec):
        from .bdcn_train import load_bdcn_checkpoint

        return load_bdcn_checkpoint(spec)
    from ..utils.torch_convert import load_reference_bdcn_checkpoint

    return jax.tree.map(jnp.asarray, load_reference_bdcn_checkpoint(spec))


def bootstrap_state(state, loadfile: str, setting=None):
    """Initialize model weights from ``loadfile``: an orbax checkpoint
    directory (this framework) or a torch ``.pkl``/``.pt`` reference
    checkpoint (converted via utils.torch_convert). Optimizer state and step
    are left fresh — reference train.py:162-172 semantics."""
    import jax.numpy as jnp

    if os.path.isdir(loadfile):
        # either a manager directory (contains best/epoch_N) or a single
        # orbax checkpoint path
        entries = set(os.listdir(loadfile))
        if "best" in entries or any(e.startswith("epoch_") for e in entries):
            mgr = CheckpointManager(loadfile)
            return mgr.restore_weights_only(state)
        import orbax.checkpoint as ocp

        restored = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(loadfile), item=_to_saveable(state))
        return state._replace(params=restored["params"],
                              batch_stats=restored["batch_stats"])
    from ..utils.torch_convert import load_reference_esfnet_checkpoint

    variables = load_reference_esfnet_checkpoint(loadfile, setting)
    params = jax.tree.map(jnp.asarray, variables["params"])
    bs = jax.tree.map(jnp.asarray, variables.get("batch_stats", state.batch_stats))
    return state._replace(params=params, batch_stats=bs)


def partial_bootstrap_state(state, ckpt_dir: str):
    """Bootstrap ``state`` from a nearly-architecture-identical checkpoint:
    every params/batch_stats leaf whose tree path AND shape match is copied;
    mismatched leaves keep their fresh init. Optimizer state stays fresh.

    The fast-input (``input_downscale``) students need this: their
    regression-head flatten width differs from the full-resolution model
    (reference utils.py:1007 hardcodes the bottleneck geometry), so a strict
    teacher-init cannot apply — but every conv/BN leaf transfers.
    Returns (state, n_copied, n_total) over params+batch_stats leaves.
    """
    src = load_checkpoint_variables(ckpt_dir)
    params, cp, tp = partial_weight_loading(src["params"], state.params)
    stats, cb, tb = partial_weight_loading(src.get("batch_stats", {}),
                                           state.batch_stats)
    return (state._replace(params=params, batch_stats=stats),
            cp + cb, tp + tb)


def partial_weight_loading(src_params, dst_params):
    """Copy every leaf whose tree path AND shape match from ``src_params``
    into ``dst_params``; leaves that don't match keep the destination's
    (fresh) values.

    Counterpart of reference pytorchtools.py:85-101 — used to bootstrap one
    model variant from another's checkpoint (e.g. a baseline encoder into an
    add_edge model, whose decoder widths differ).
    Returns (merged_params, n_copied, n_total).
    """
    import jax

    flat_src = dict(jax.tree_util.tree_flatten_with_path(src_params)[0])
    flat_dst, treedef = jax.tree_util.tree_flatten_with_path(dst_params)
    merged, copied = [], 0
    for path, leaf in flat_dst:
        cand = flat_src.get(path)
        if cand is not None and getattr(cand, "shape", None) == leaf.shape:
            merged.append(cand)
            copied += 1
        else:
            merged.append(leaf)
    return (jax.tree_util.tree_unflatten(treedef, merged), copied,
            len(flat_dst))
