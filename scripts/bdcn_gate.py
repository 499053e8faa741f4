#!/usr/bin/env python3
"""Quality gate for the from-scratch BDCN edge stage.

The reference freezes a CONVERGED pretrained edge net (gen_00000016.pt,
reference train.py:126-127); the in-repo self-training recipe
(cli/train_bdcn.py) must therefore clear a quality bar before any
downstream teacher/student/gate inherits its edge maps. Verdict:

  accepted = best val_f1 >= --min_f1   (boundary-band F1 on the held-out
             synthetic split; round-2's 10-epoch run stopped at 0.297
             while still climbing ~0.03/epoch — an unconverged edge net)

The downstream delta (edge-guided teacher vs no-edge control val mIoU) is
recorded informationally by scripts/regen_artifacts.sh once both arms
exist; on the clean synthetic distribution that comparison saturates
(BASELINE.md), so the scientific edge-guidance evidence lives in the
degraded-distribution ablation (scripts/edge_ablation.sh) instead.

Writes gate.json beside the run's checkpoints and prints it as one JSON
line (picked up by logs/regen_gates.jsonl). Exit 0 on pass, 3 on fail so
the regen chain can refuse a failing BDCN.
"""

import argparse
import json
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", default="logs/bdcn/r2",
                   help="cli/train_bdcn.py run dir (contains history.json)")
    p.add_argument("--min_f1", type=float, default=0.35)
    args = p.parse_args(argv)

    hist_path = os.path.join(args.run_dir, "history.json")
    with open(hist_path) as f:
        history = json.load(f)
    vals = [e["val_f1"] for e in history if "val_f1" in e]
    best = max(vals) if vals else float("nan")
    final = vals[-1] if vals else float("nan")
    record = {
        "stage": "bdcn_gate",
        "run_dir": args.run_dir,
        "epochs": len(history),
        "best_val_f1": round(best, 4),
        "final_val_f1": round(final, 4),
        "min_f1": args.min_f1,
        "accepted": bool(best >= args.min_f1),
    }
    with open(os.path.join(args.run_dir, "gate.json"), "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))
    return 0 if record["accepted"] else 3


if __name__ == "__main__":
    sys.exit(main())
