#!/bin/bash
# Second-chance recipes for the fast-input (in/2) flagship rung after the
# w_center=20 retrain traded too much seg fidelity (drop 0.0313 > 0.02
# with centers fixed at 2.87 px — logs/distill/calib_e4s4_in2_bootc).
#
# A: short low-LR center fine-tune FROM the round-3 in2 weights (drop
#    0.0186 pass / centers 8.02 px fail): small steps from a seg-good
#    solution toward centers, hoping to stay inside the drop budget.
# B: full in/2 retrain from the center-KD full-res student with a lower
#    center weight (w_center=8, the knob between 0 -> 8 px and 20 ->
#    0.031 drop).
# First attempt that passes the FULL gate replaces the demoted
# artifacts/calib_e4s4_in2_boot and is re-scored on the whole clip.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-logs}
ART=artifacts
T="$ART/teacher/checkpoints"
BDCN="$ART/bdcn/checkpoints"
GATES="$LOG/retry_in2_gates.jsonl"
mkdir -p "$LOG"

run() {
    local marker=$1; shift
    local attempt
    for attempt in 1 2 3; do
        if [ -d "$marker" ]; then
            [ "$attempt" = 1 ] && echo "== skip (exists): $marker"
            return 0
        fi
        echo "== run (attempt $attempt): $*"
        "$@" 2>&1 | tee -a "$LOG/retry_in2.log" \
            | grep -E '^\{' >> "$GATES" || true
    done
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

export_and_score() { # <run_dir>
    local run=$1 name=calib_e4s4_in2_boot
    mkdir -p "$ART/$name"
    rm -rf "$ART/$name/checkpoints"
    mkdir -p "$ART/$name/checkpoints"
    cp -r "$run/checkpoints/best" "$ART/$name/checkpoints/best"
    local f
    for f in gate.json args.json history.json; do
        [ -f "$run/$f" ] && cp "$run/$f" "$ART/$name/$f"
    done
    rm -f "$ART/$name/real_protocol.json"
    python cli/real_protocol.py --ckpt "$ART/$name" --refine_ab 1 2>&1 \
        | tee -a "$LOG/retry_in2.log" | grep -E '^\{' >> "$GATES" || true
    echo "== exported $run -> $ART/$name"
}

# A: low-LR center fine-tune from the round-3 seg-passing in2 weights
run "$LOG/distill/in2_ftc/checkpoints/best" \
    python cli/distill.py --teacher_ckpt "$T" --setting baseline_edge \
    --chz 32 --edge_downscale 4 --seg_downscale 4 --input_downscale 2 \
    --init_ckpt "$ART/calib_e4s4_in2_boot/checkpoints" --lr 1e-4 \
    --epochs 12 --real_mix 128 --bdcn_weights "$BDCN" --synthetic 128 \
    --w_center 10 --expname in2_ftc --log_dir "$LOG"
if passed "$LOG/distill/in2_ftc"; then
    export_and_score "$LOG/distill/in2_ftc"
    exit 0
fi

# B: lower-w_center full retrain from the center-KD full-res student
run "$LOG/distill/in2_wc8/checkpoints/best" \
    python cli/distill.py --teacher_ckpt "$T" --setting baseline_edge \
    --chz 32 --edge_downscale 4 --seg_downscale 4 --input_downscale 2 \
    --init_ckpt "$ART/calib_e4s4_rm2/checkpoints" --lr 3e-4 \
    --epochs 40 --real_mix 128 --bdcn_weights "$BDCN" --synthetic 128 \
    --w_center 8 --expname in2_wc8 --log_dir "$LOG"
if passed "$LOG/distill/in2_wc8"; then
    export_and_score "$LOG/distill/in2_wc8"
    exit 0
fi
echo "== retry_in2: no attempt passed the full gate; demotion stands"
exit 1
