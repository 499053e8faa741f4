"""Summarize the edge-QUALITY arm (scripts/edge_quality.sh) against the
committed multi-seed ablation arms.

VERDICT r4 #5 / weak #5: the practical F1-0.47 BDCN arm's mIoU deltas
straddle zero while the oracle arm shows the mechanism's headroom. This
reads the ``edge_hard_bdcn2_s<seed>`` runs (same seeds + identical samples
as the committed ablation arms) trained against the HIGHER-F1 ``hard2``
BDCN and reports, per seed, paired deltas vs control alongside the
F1-0.47 arm's — quantifying what edge quality buys downstream. Writes
``artifacts/edge_quality.json``.
"""

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.summarize_ablation_seeds import load_run


def bdcn_f1(log_dir, name):
    path = os.path.join(log_dir, "bdcn", name, "history.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        hist = json.load(f)
    vals = [e["val_f1"] for e in hist if "val_f1" in e]
    return {"best_val_f1": round(max(vals), 4) if vals else None,
            "epochs": len(hist)}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--log_dir", default="logs")
    p.add_argument("--out", default="artifacts/edge_quality.json")
    args = p.parse_args(argv)

    seeds = sorted({
        int(m.group(1))
        for d in glob.glob(os.path.join(args.log_dir, "ritnet_v2",
                                        "edge_hard_bdcn2_s*"))
        if (m := re.search(r"_s(\d+)$", d))
    })
    per_seed, runs = {}, {}
    for seed in seeds:
        ctrl = load_run(args.log_dir, f"ctrl_hard_s{seed}")
        arm047 = load_run(args.log_dir, f"edge_hard_bdcn_s{seed}")
        arm2 = load_run(args.log_dir, f"edge_hard_bdcn2_s{seed}")
        if not (ctrl and arm2):
            continue
        runs[str(seed)] = {"ctrl_hard": ctrl, "edge_hard_bdcn2": arm2}
        row = {
            "bdcn2_d_val_miou": round(arm2["val_miou"] - ctrl["val_miou"], 4),
            "bdcn2_d_test_miou": round(arm2["test_miou"]
                                       - ctrl["test_miou"], 4),
            "bdcn2_d_val_pup_c": round(arm2["val_pup_c_seg"]
                                       - ctrl["val_pup_c_seg"], 2),
        }
        if arm047:
            row["bdcn047_d_val_miou"] = round(
                arm047["val_miou"] - ctrl["val_miou"], 4)
            row["bdcn047_d_test_miou"] = round(
                arm047["test_miou"] - ctrl["test_miou"], 4)
            row["bdcn047_d_val_pup_c"] = round(
                arm047["val_pup_c_seg"] - ctrl["val_pup_c_seg"], 2)
        per_seed[str(seed)] = row

    summary = {}
    for key in ("bdcn2_d_val_miou", "bdcn2_d_test_miou", "bdcn2_d_val_pup_c"):
        vals = [v[key] for v in per_seed.values() if key in v]
        if vals:
            summary[key] = {
                "mean": round(sum(vals) / len(vals), 4),
                "min": min(vals), "max": max(vals),
                "sign_consistent": bool(
                    all(v > 0 for v in vals) or all(v < 0 for v in vals)),
            }

    out = {
        "protocol": {
            "paired": True,
            "arm": "edge_hard_bdcn2 (hard2 BDCN: 256 samples, cosine LR, "
                   "best-F1 ckpt) vs the same seed's committed control",
            "n_seeds": len(per_seed),
        },
        "bdcn_f1": {"hard": bdcn_f1(args.log_dir, "hard"),
                    "hard2": bdcn_f1(args.log_dir, "hard2")},
        "runs": runs,
        "per_seed": per_seed,
        "summary": summary,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"seeds_complete": len(per_seed),
                      "bdcn_f1": out["bdcn_f1"], "summary": summary}))
    return out


if __name__ == "__main__":
    main()
