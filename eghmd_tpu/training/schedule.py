"""Training schedules: alpha ramp, plateau LR decay, early stopping.

Host-side, per-epoch logic — exact counterparts of the reference's
``linVal`` (helperfunctions.py:431-443), ``ReduceLROnPlateau(max, patience 5,
factor 0.1)`` (train.py:192-196) and ``EarlyStopping(max, patience 10,
delta 1e-3)`` (train.py:198-203, pytorchtools.py:13-67).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np


def alpha_schedule(epoch: int, epochs: int) -> float:
    """Loss-curriculum ramp 0 -> 1 over training (reference train.py:255)."""
    if epoch < 0:
        return 0.0
    if epoch > epochs:
        return 1.0
    return float(epoch) / float(epochs)


def composite_stop_metric(mean_iou, pup_c_dist, iri_c_dist, pup_ang, iri_ang):
    """The reference's early-stop composite, max 5.0 (train.py:450-458).

    Falls back to ``1 - pup_c_dist/400`` when IoU is NaN (no masks in the
    validation set).
    """
    if not np.isnan(mean_iou):
        return float(
            mean_iou + 2.0 - 2.5e-3 * (pup_c_dist + iri_c_dist)
            + (1.0 - pup_ang / 90.0) + (1.0 - iri_ang / 90.0)
        )
    return float(1.0 - pup_c_dist / 400.0)


def save_schedule_state(directory: str, plateau: "ReduceLROnPlateau",
                        early: "EarlyStopping") -> None:
    """Persist host-side schedule state (plateau LR + early-stop history)
    next to the checkpoints so ``--resume`` continues LR decay / patience
    counters instead of silently resetting them."""
    import json
    import os

    with open(os.path.join(directory, "schedule.json"), "w") as f:
        json.dump({
            "plateau": {"lr": plateau.lr, "best": plateau.best,
                        "num_bad": plateau.num_bad},
            "early": {"best_score": early.best_score,
                      "counter": early.counter,
                      "early_stop": early.early_stop},
        }, f)


def restore_schedule_state(directory: str, plateau: "ReduceLROnPlateau",
                           early: "EarlyStopping") -> bool:
    """Restore state written by :func:`save_schedule_state`. Returns True
    if a schedule file was found (older checkpoints lack one)."""
    import json
    import os

    path = os.path.join(directory, "schedule.json")
    if not os.path.exists(path):
        return False
    with open(path) as f:
        d = json.load(f)
    plateau.lr = float(d["plateau"]["lr"])
    plateau.best = float(d["plateau"]["best"])
    plateau.num_bad = int(d["plateau"]["num_bad"])
    bs = d["early"]["best_score"]
    early.best_score = None if bs is None else float(bs)
    early.counter = int(d["early"]["counter"])
    early.early_stop = bool(d["early"]["early_stop"])
    return True


@dataclass
class ReduceLROnPlateau:
    """max-mode plateau LR decay (torch semantics, rel threshold 1e-4)."""

    lr: float
    patience: int = 5
    factor: float = 0.1
    threshold: float = 1e-4
    min_lr: float = 0.0
    best: float = -np.inf
    num_bad: int = 0

    def step(self, metric: float) -> float:
        # torch is_better (mode='max', threshold_mode='rel'): a > best*(1+eps)
        if metric > self.best * (1.0 + self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr


@dataclass
class EarlyStopping:
    """max-mode early stopping with min-delta (pytorchtools.py:13-67)."""

    patience: int = 10
    delta: float = 1e-3
    best_score: Optional[float] = None
    counter: int = 0
    early_stop: bool = False
    improved: bool = False  # True right after a step that set a new best

    def step(self, metric: float) -> bool:
        """Returns True if this epoch produced a new best (caller saves ckpt)."""
        self.improved = False
        if self.best_score is None:
            self.best_score = metric
            self.improved = True
        elif metric < self.best_score + self.delta:
            self.counter += 1
            if self.counter >= self.patience:
                self.early_stop = True
        else:
            self.best_score = metric
            self.counter = 0
            self.improved = True
        return self.improved
