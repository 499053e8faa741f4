"""Summarize the multi-seed edge-guidance ablation
(scripts/edge_ablation_seeds.sh) into paired per-seed deltas.

VERDICT r3 #3: one seed per arm cannot support a +0.005 sign claim. This
reads every ``{ctrl_hard,edge_hard_bdcn,edge_hard_gt}_s<seed>`` run's
history.json, takes the best-early-stop epoch per run (the epoch whose
weights the ``best`` checkpoint actually holds), and reports PAIRED
per-seed deltas (arm - control at the same seed) with mean / min / max,
plus whether early stopping fired before the epoch budget (if not, the
budget — not convergence — bound the estimate and the run should be
extended). Writes the evidence JSON consumed by BASELINE.md's
edge-guidance section.
"""

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.summarize_ablation import best_epoch

ARMS = ("ctrl_hard", "edge_hard_bdcn", "edge_hard_gt")


def load_run(log_dir, run):
    path = os.path.join(log_dir, "ritnet_v2", run, "history.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        hist = json.load(f)
    b = best_epoch(hist)
    args_path = os.path.join(log_dir, "ritnet_v2", run, "args.json")
    budget = None
    if os.path.exists(args_path):
        with open(args_path) as f:
            budget = json.load(f).get("args", {}).get("epochs")
    last = hist[-1]["epoch"]
    return {
        "best_epoch": b["epoch"],
        "last_epoch": last,
        "epoch_budget": budget,
        # early stopping fired iff training ended before the budget;
        # patience is 10, so last >= best + 10 also implies it fired
        "early_stopped": bool(budget is not None and last + 1 < budget),
        "val_miou": round(b["valid"]["mean_iou"], 4),
        "test_miou": round(b.get("test", {}).get("mean_iou", float("nan")), 4),
        "val_pup_c_seg": round(b["valid"]["pup_c_seg"], 2),
        "stop_metric": round(b["stop_metric"], 4),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--log_dir", default="logs")
    p.add_argument("--out", default="artifacts/edge_ablation_seeds.json")
    args = p.parse_args(argv)

    seeds = sorted({
        int(m.group(1))
        for d in glob.glob(os.path.join(args.log_dir, "ritnet_v2",
                                        "ctrl_hard_s*"))
        if (m := re.search(r"_s(\d+)$", d))
    })
    runs = {}
    for seed in seeds:
        per_arm = {arm: load_run(args.log_dir, f"{arm}_s{seed}")
                   for arm in ARMS}
        if all(per_arm.values()):
            runs[seed] = per_arm

    deltas = {}
    for arm in ARMS[1:]:
        per_seed = {
            s: {
                "d_val_miou": round(r[arm]["val_miou"]
                                    - r["ctrl_hard"]["val_miou"], 4),
                "d_test_miou": round(r[arm]["test_miou"]
                                     - r["ctrl_hard"]["test_miou"], 4),
                "d_val_pup_c": round(r[arm]["val_pup_c_seg"]
                                     - r["ctrl_hard"]["val_pup_c_seg"], 2),
            }
            for s, r in runs.items()
        }
        summary = {}
        for key in ("d_val_miou", "d_test_miou", "d_val_pup_c"):
            vals = [v[key] for v in per_seed.values()]
            if vals:
                summary[key] = {
                    "mean": round(sum(vals) / len(vals), 4),
                    "min": min(vals), "max": max(vals),
                    "sign_consistent": bool(
                        all(v > 0 for v in vals) or all(v < 0 for v in vals)),
                }
        deltas[arm] = {"per_seed": per_seed, "summary": summary}

    out = {
        "protocol": {
            "paired": True,
            "seed_varies": "model init + epoch shuffle (identical samples)",
            "n_seeds": len(runs),
            "stat": "per-seed paired delta (arm - control), mean/min/max",
        },
        "runs": {str(s): r for s, r in runs.items()},
        "paired_deltas": deltas,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"seeds_complete": len(runs), "out": args.out,
                      **{arm: deltas[arm]["summary"] for arm in deltas}}))
    return out


if __name__ == "__main__":
    main()
