"""Experiment logging: append-mode file + stdout mirror + TensorBoard scalars.

Counterpart of the reference Logger (utils.py:83-118) and its tensorboardX
scalar groups (train.py:402-439). tensorboardX is optional; the file/stdout
logger always works.
"""

from __future__ import annotations

import json
import os
import time
import numpy as np


class ExperimentLogger:
    def __init__(self, log_dir: str, tb: bool = True):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "logs.log"), "a+")
        self.writer = None
        if tb:
            try:
                from tensorboardX import SummaryWriter

                self.writer = SummaryWriter(os.path.join(log_dir, "TB.lock"))
            except Exception:
                self.writer = None

    def write(self, msg: str):
        stamp = time.strftime("%H:%M:%S")
        self._f.write(f"[{stamp}] {msg}\n")
        self._f.flush()
        print(msg, flush=True)

    def scalars(self, epoch: int, train: dict, valid: dict):
        """Mirror the reference's iris/pupil scalar groups (train.py:402-430)."""
        if self.writer is None:
            return
        pairs = [
            ("iri_c/mu", "iri_c_lat"), ("pup_c/mu", "pup_c_lat"),
            ("iri_ang/mu", "iri_ang"), ("pup_ang/mu", "pup_ang"),
        ]
        for tag, key in pairs:
            self.writer.add_scalars(tag, {"train": train.get(key, np.nan),
                                          "valid": valid.get(key, np.nan)}, epoch)
        self.writer.add_scalar("loss/train", train.get("loss", np.nan), epoch)
        self.writer.add_scalar("loss/valid", valid.get("loss", np.nan), epoch)

    def prediction_grid(self, epoch: int, images: np.ndarray,
                        preds: np.ndarray, targets: np.ndarray, max_n: int = 8):
        """TB grid of [image | prediction | ground truth] per sample.

        Counterpart of the reference's per-5-epoch prediction image
        (train.py:433, via torchvision make_grid of the disp figure).
        images: [B, H, W] gray float; preds/targets: [B, H, W] int.
        """
        if self.writer is None:
            return
        n = min(max_n, images.shape[0])
        palette = np.array([[0, 0, 0], [0, 255, 0], [255, 0, 0]], np.uint8)
        rows = []
        for i in range(n):
            img = images[i]
            img = (255 * (img - img.min()) / max(img.max() - img.min(), 1e-6))
            img3 = np.stack([img.astype(np.uint8)] * 3, axis=-1)
            pr = palette[np.clip(preds[i].astype(np.int64), 0, 2)]
            gt = palette[np.clip(targets[i].astype(np.int64), 0, 2)]
            rows.append(np.concatenate([img3, pr, gt], axis=1))
        grid = np.concatenate(rows, axis=0)
        self.writer.add_image("predictions", grid, epoch, dataformats="HWC")

    def embedding(self, epoch: int, latents: np.ndarray, labels=None):
        """TB latent-space embedding every N epochs (reference train.py:435-439)."""
        if self.writer is None:
            return
        try:
            self.writer.add_embedding(
                np.asarray(latents),
                metadata=list(labels) if labels is not None else None,
                global_step=epoch, tag="latent")
        except Exception:
            pass  # tensorboardX embedding needs optional deps

    def dump_history(self, history):
        def clean(o):
            if isinstance(o, dict):
                return {k: clean(v) for k, v in o.items()}
            if isinstance(o, (list, tuple)):
                return [clean(v) for v in o]
            if isinstance(o, np.ndarray):
                return o.tolist()
            if isinstance(o, (np.floating, np.integer)):
                return o.item()
            return o

        with open(os.path.join(self.log_dir, "history.json"), "w") as f:
            json.dump(clean(history), f, indent=1)


def dump_run_args(log_dir, args):
    """Record the exact CLI invocation in the run directory (args.json).

    The reference leaves no record of how a checkpoint was produced; every
    training/distillation run here writes its argparse namespace so ladder
    entries (BASELINE.md) can be reproduced verbatim from the artifact dir.
    """
    import json
    import os
    import sys

    os.makedirs(log_dir, exist_ok=True)
    payload = {"argv": sys.argv, "args": {k: v for k, v in sorted(
        vars(args).items())}}
    with open(os.path.join(log_dir, "args.json"), "w") as f:
        json.dump(payload, f, indent=2, default=str)
