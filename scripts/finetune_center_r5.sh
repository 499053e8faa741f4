#!/bin/bash
# Round-5 restoration chain for the rungs the WIDENED gate demoted.
#
# The 256-sample + iris re-evaluation (scripts/reeval_gates.py) demoted
# two rungs, both on val-center criteria alone and both with large mIoU
# slack:
#   b4_rm2      pupil excess 2.26 px (CI 1.89-2.64), iris excess 2.64 px
#               (CI 2.43-2.84); miou_drop 0.0112 of the 0.02 budget
#   ns_chz6_rm2 pupil excess 2.005 px vs the 2.0 bar (CI 1.63-2.41) — a
#               0.005-px point-estimate miss; miou_drop NEGATIVE (-0.0023)
#   ns_s8_rm2   pupil excess 2.20 px (CI 1.83-2.62); everything else
#               passes; miou_drop 0.008 of the 0.02 budget
# Same situation as round 4's demotions, same proven remedy
# (scripts/finetune_center.sh): short LOW-LR center-KD fine-tunes from the
# committed weights — small steps from a seg-good solution toward centers.
# The KD center term trains BOTH centers (the [B,2,2] soft-argmax), so the
# b4 iris miss is covered by the same knob. Each attempt gates under the
# FULL round-5 criteria (256-sample eval + iris + CIs — cli/distill.py
# defaults); a pass replaces the artifact and re-scores the whole clip
# with the refine A/B; a fail leaves the demotion standing.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-logs}
ART=artifacts
T="$ART/teacher/checkpoints"
BDCN="$ART/bdcn/checkpoints"
GATES="$LOG/finetune_center_r5_gates.jsonl"
mkdir -p "$LOG"

run() { # run <done-marker-dir> <cmd...>
    local marker=$1; shift
    local attempt
    for attempt in 1 2 3; do
        if [ -d "$marker" ]; then
            [ "$attempt" = 1 ] && echo "== skip (exists): $marker"
            return 0
        fi
        echo "== run (attempt $attempt): $*"
        "$@" 2>&1 | tee -a "$LOG/finetune_center_r5.log" \
            | grep -E '^\{' >> "$GATES" || true
    done
    [ -d "$marker" ] || echo "== FAILED after 3 attempts: $marker"
}

passed() {
    python - "$1" <<'EOF'
import json, os, sys
try:
    rec = json.load(open(os.path.join(sys.argv[1], "gate.json")))
    sys.exit(0 if rec.get("accepted") else 1)
except Exception:
    sys.exit(1)
EOF
}

export_art() { # export_art <name> <run_dir>
    local name=$1 run=$2
    mkdir -p "$ART/$name"
    rm -rf "$ART/$name/checkpoints"
    mkdir -p "$ART/$name/checkpoints"
    cp -r "$run/checkpoints/best" "$ART/$name/checkpoints/best"
    local f
    for f in gate.json args.json history.json; do
        [ -f "$run/$f" ] && cp "$run/$f" "$ART/$name/$f"
    done
    rm -f "$ART/$name/real_protocol.json"
    echo "== exported $run -> $ART/$name"
}

finish() { # finish <rung> <run_dir>
    if passed "$2"; then
        export_art "$1" "$2"
    else
        echo "== $1 fine-tune did NOT pass the round-5 gate; demotion stands"
    fi
}

# 1. north-star chz6 rung: needs ~0.1 px — the gentlest possible nudge
#    (its round-4 fine-tune at lr 1e-4 / w_center 10 moved centers ~1.5 px,
#    far more than needed; halve the LR and the epochs)
run "$LOG/distill/ns_chz6_ftc5/checkpoints/best" \
    python cli/distill.py --teacher_ckpt "$T" --setting baseline --chz 6 \
    --growth 1.0 --seg_downscale 4 --epochs 6 --real_mix 128 \
    --bdcn_weights "$BDCN" --synthetic 128 \
    --init_ckpt "$ART/ns_chz6_rm2/checkpoints" --lr 5e-5 \
    --w_center 10 --expname ns_chz6_ftc5 --log_dir "$LOG"
finish ns_chz6_rm2 "$LOG/distill/ns_chz6_ftc5"

# 2. chz4 ceiling rung: needs -0.26 px pupil / -0.64 px iris with 0.009
#    mIoU slack — slightly heavier center weight than round 4's pass,
#    same low LR so the seg solution is not unlearned
run "$LOG/distill/b4_ftc5/checkpoints/best" \
    python cli/distill.py --teacher_ckpt "$T" --setting baseline --chz 4 \
    --growth 1.0 --seg_downscale 4 --epochs 10 --real_mix 128 \
    --bdcn_weights "$BDCN" --synthetic 128 --remat 1 \
    --init_ckpt "$ART/b4_rm2/checkpoints" --lr 1e-4 \
    --w_center 14 --expname b4_ftc5 --log_dir "$LOG"
finish b4_rm2 "$LOG/distill/b4_ftc5"

# 3. seg/8 rung: needs -0.20 px pupil with 0.012 mIoU slack
run "$LOG/distill/ns_s8_ftc5/checkpoints/best" \
    python cli/distill.py --teacher_ckpt "$T" --setting baseline --chz 6 \
    --growth 1.0 --seg_downscale 8 --epochs 8 --real_mix 128 \
    --bdcn_weights "$BDCN" --synthetic 128 \
    --init_ckpt "$ART/ns_s8_rm2/checkpoints" --lr 1e-4 \
    --w_center 10 --expname ns_s8_ftc5 --log_dir "$LOG"
finish ns_s8_rm2 "$LOG/distill/ns_s8_ftc5"

# whole-clip out-of-sample re-score (+ refine A/B — all are scored
# rungs) for every rung whose weights changed
for rung in ns_chz6_rm2 b4_rm2 ns_s8_rm2; do
    if [ -d "$ART/$rung/checkpoints/best" ] \
            && [ ! -f "$ART/$rung/real_protocol.json" ]; then
        python cli/real_protocol.py --ckpt "$ART/$rung" --refine_ab 1 2>&1 \
            | tee -a "$LOG/finetune_center_r5.log" \
            | grep -E '^\{' >> "$GATES" || true
    fi
done

# keep criteria blocks consistent across every artifact after the swaps
python scripts/regate_artifacts.py 2>&1 \
    | tee -a "$LOG/finetune_center_r5.log" | grep -E '^\{' >> "$GATES" || true

echo "== finetune_center_r5 complete; gate lines in $GATES"
