"""Summarize the edge-guidance ablation (scripts/edge_ablation.sh): per run,
the best-stop-metric epoch's validation/test mIoU and pupil-center error —
the evidence table for BASELINE.md's edge-guidance section."""

import json
import os
import sys


def best_epoch(history, delta=1e-3):
    """The epoch whose checkpoint `best` actually holds: replicate the
    trainer's EarlyStopping acceptance (schedule.py: new best only when
    metric > best + delta), NOT argmax(stop_metric) — a later epoch can
    beat the running best by < delta and be rejected (its test split is
    then never evaluated and its weights never saved)."""
    best, accepted = None, None
    for e in history:
        if best is None or e["stop_metric"] >= best + delta:
            best, accepted = e["stop_metric"], e
    return accepted


def main(log_dir="logs", runs=("control_r2", "teacher_r2",
                               "ctrl_hard", "edge_hard_bdcn",
                               "edge_hard_bdcn2", "edge_hard_gt")):
    rows = []
    for run in runs:
        path = os.path.join(log_dir, "ritnet_v2", run, "history.json")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            b = best_epoch(json.load(f))
        rows.append({
            "run": run, "best_epoch": b["epoch"],
            "val_miou": round(b["valid"]["mean_iou"], 4),
            "test_miou": round(b.get("test", {}).get("mean_iou",
                                                     float("nan")), 4),
            "val_pup_c_seg": round(b["valid"]["pup_c_seg"], 2),
            "stop_metric": round(b["stop_metric"], 4),
        })
    print(json.dumps(rows, indent=1))
    return rows


if __name__ == "__main__":
    main(*(sys.argv[1:] or []))
