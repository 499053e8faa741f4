#!/bin/bash
# Multi-seed edge-guidance ablation on the DEGRADED distribution
# (VERDICT r3 #3: the round-3 single-seed +0.005 for a converged BDCN is
# within plausible seed noise, and the converged arm's best epoch was its
# last — the 20-epoch budget bound the estimate).
#
# Protocol: 3 arms x 3 seeds, PAIRED — every seed trains all three arms on
# IDENTICAL samples (--seed varies model init + epoch shuffle only, never
# the data), and the headline statistic is the per-seed paired delta
# (arm - control), not a cross-seed mean of absolutes. Each arm trains
# with --epochs 48 so EarlyStopping(patience 10) fires on its own instead
# of the budget cap binding the estimate.
#   control   : baseline (no edge input)
#   edge_bdcn : baseline_edge fed by the CONVERGED degraded-trained BDCN
#               (F1-gated by scripts/bdcn_gate.py, same bar as round 3)
#   edge_gt   : baseline_edge fed ORACLE GT boundary maps (upper bound)
# Summarize + export: python scripts/summarize_ablation_seeds.py
# Idempotent: finished stages are skipped; 3 attempts per stage (axon
# compile-helper OOMs are transient).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-logs}
[ "$LOG" = "--save-wip" ] && LOG=${2:-logs}
DEG=${DEG:-1.0}
EPOCHS=${EPOCHS:-48}
SEEDS=${SEEDS:-"0 1 2"}
mkdir -p "$LOG"

# logs/ does not survive between build rounds but artifacts/ does: restore
# any committed work-in-progress (finished stages incl. the converged hard
# BDCN) so a continuing round never retrains a completed arm. Save back
# with: bash scripts/edge_ablation_seeds.sh --save-wip
WIP=artifacts/edge_ablation_seeds_wip
if [ "${1:-}" = "--save-wip" ]; then
    mkdir -p "$WIP"
    for d in "$LOG"/bdcn/hard* "$LOG"/ritnet_v2/*hard*_s*; do
        [ -d "$d" ] || continue
        # only COMPLETE stages may be saved: a restored partial arm would
        # be skipped by the done-marker as if finished. An arm is complete
        # iff early stopping fired (schedule.json early_stop) or it ran
        # its whole epoch budget; the bdcn stage iff its marker exists.
        if ! python - "$d" <<'EOF'
import json, os, sys
d = sys.argv[1]
if os.path.basename(os.path.dirname(d)) == "bdcn":
    sys.exit(0 if os.path.isdir(os.path.join(d, "checkpoints", "bdcn"))
             else 1)
try:
    sched = json.load(open(os.path.join(d, "checkpoints", "schedule.json")))
    if sched.get("early", {}).get("early_stop"):
        sys.exit(0)
    hist = json.load(open(os.path.join(d, "history.json")))
    budget = json.load(open(os.path.join(d, "args.json")))["args"]["epochs"]
    sys.exit(0 if hist[-1]["epoch"] + 1 >= budget else 1)
except Exception:
    sys.exit(1)
EOF
        then
            echo "== skip (incomplete): $d"
            continue
        fi
        rel=${d#"$LOG"/}
        mkdir -p "$WIP/$(dirname "$rel")"
        rm -rf "$WIP/$rel"
        cp -r "$d" "$WIP/$rel"
        # per-epoch checkpoints are dead weight for resume (the done-marker
        # is `best`/`bdcn`; the summarizer reads history+args+schedule)
        rm -rf "$WIP/$rel"/checkpoints/epoch_* "$WIP/$rel"/checkpoints/init \
            "$WIP/$rel"/TB* 2>/dev/null
        echo "== saved $d -> $WIP/$rel"
    done
    exit 0
fi
if [ -d "$WIP" ]; then
    (cd "$WIP" && find . -type d) | while read -r d; do
        mkdir -p "$LOG/$d"
    done
    (cd "$WIP" && find . -type f) | while read -r f; do
        [ -f "$LOG/$f" ] || cp "$WIP/$f" "$LOG/$f"
    done
    echo "== restored WIP stages from $WIP"
fi

run() { # run <done-marker-dir> <cmd...>
    local marker=$1; shift
    local attempt
    for attempt in 1 2 3; do
        if [ -d "$marker" ]; then
            [ "$attempt" = 1 ] && echo "== skip (exists): $marker"
            return 0
        fi
        echo "== run (attempt $attempt): $*"
        "$@" 2>&1 | tee -a "$LOG/edge_ablation_seeds.log"
    done
    [ -d "$marker" ] || echo "== FAILED after 3 attempts: $marker"
}

# shared converged edge net: train on the degraded distribution, then
# resume until it clears the same F1 bar the clean chain enforces (an
# UNCONVERGED edge net HURTS — round-3 result, artifacts/edge_ablation.json)
run "$LOG/bdcn/hard/checkpoints/bdcn" \
    python cli/train_bdcn.py --synthetic 64 --epochs 10 \
    --synthetic_degrade "$DEG" --expname hard --log_dir "$LOG"
for attempt in 1 2 3 4; do
    if python scripts/bdcn_gate.py --run_dir "$LOG/bdcn/hard"; then break; fi
    echo "== hard bdcn below bar; resuming +10 epochs (attempt $attempt)"
    python cli/train_bdcn.py --synthetic 64 --epochs 10 --resume 1 \
        --synthetic_degrade "$DEG" --expname hard --log_dir "$LOG" 2>&1 \
        | tee -a "$LOG/edge_ablation_seeds.log"
done

for seed in $SEEDS; do
    run "$LOG/ritnet_v2/ctrl_hard_s$seed/checkpoints/best" \
        python cli/train.py --setting baseline --synthetic 128 \
        --batchsize 16 --remat 1 --epochs "$EPOCHS" --seed "$seed" \
        --synthetic_degrade "$DEG" --expname "ctrl_hard_s$seed" \
        --log_dir "$LOG"
    run "$LOG/ritnet_v2/edge_hard_bdcn_s$seed/checkpoints/best" \
        python cli/train.py --setting baseline_edge --synthetic 128 \
        --batchsize 16 --remat 1 --epochs "$EPOCHS" --seed "$seed" \
        --synthetic_degrade "$DEG" \
        --bdcn_weights "$LOG/bdcn/hard/checkpoints" \
        --expname "edge_hard_bdcn_s$seed" --log_dir "$LOG"
    run "$LOG/ritnet_v2/edge_hard_gt_s$seed/checkpoints/best" \
        python cli/train.py --setting baseline_edge --synthetic 128 \
        --batchsize 16 --remat 1 --epochs "$EPOCHS" --seed "$seed" \
        --synthetic_degrade "$DEG" --expname "edge_hard_gt_s$seed" \
        --log_dir "$LOG"
    # commit-grade summary lands incrementally: each finished seed updates
    # the exported JSON so a cut-off round still carries partial evidence
    python scripts/summarize_ablation_seeds.py --log_dir "$LOG" \
        --out artifacts/edge_ablation_seeds.json 2>&1 \
        | tee -a "$LOG/edge_ablation_seeds.log"
done

echo "== multi-seed ablation complete"
