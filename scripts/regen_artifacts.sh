#!/bin/bash
# Regenerate every trained artifact behind BASELINE.md's gated claims from
# nothing (no reference weights, no datasets): BDCN edge net -> baseline_edge
# teacher -> fidelity-gated serving-student ladder (real-frame mix-in,
# disjoint-frame protocol). Each stage appends its JSON gate line to
# logs/regen_gates.jsonl. Safe to re-run: finished stages are skipped.
#
# Usage: bash scripts/regen_artifacts.sh [logdir]   (default: logs)
set -u
cd "$(dirname "$0")/.."
LOG=${1:-logs}
mkdir -p "$LOG"
GATES="$LOG/regen_gates.jsonl"
VID=/root/reference/videos/example1.avi

run() { # run <done-marker-dir> <cmd...>
    local marker=$1; shift
    if [ -d "$marker" ]; then
        echo "== skip (exists): $marker"
        return 0
    fi
    echo "== run: $*"
    "$@" 2>&1 | tee -a "$LOG/regen.log" | grep -E '^\{' >> "$GATES" || true
}

# 1. BDCN edge stage, trained from scratch on synthetic boundary maps
#    (CLAUDE.md recipe: reference init + clip(1.0) + adam(1e-3)).
run "$LOG/bdcn/r2/checkpoints/bdcn" \
    python cli/train_bdcn.py --synthetic 64 --epochs 10 --expname r2 --log_dir "$LOG"

BDCN="$LOG/bdcn/r2/checkpoints"

# 2. baseline_edge chz32 teacher (BASELINE.md recipe; 20 epochs so the
#    reference schedule — plateau patience 5, early-stop patience 10 —
#    actually gets to fire; at 8 epochs a mid-run regression can freeze
#    the best checkpoint at a weak early epoch).
run "$LOG/ritnet_v2/teacher_r2/checkpoints/best" \
    python cli/train.py --setting baseline_edge --synthetic 128 --batchsize 16 \
    --remat 1 --epochs 20 --bdcn_weights "$BDCN" --expname teacher_r2 --log_dir "$LOG"

T="$LOG/ritnet_v2/teacher_r2/checkpoints"

# 2b. No-edge control at identical settings: the edge-guided-beats-baseline
#     comparison (BASELINE.md) must be reproducible from the same chain.
run "$LOG/ritnet_v2/control_r2/checkpoints/best" \
    python cli/train.py --setting baseline --synthetic 128 --batchsize 16 \
    --remat 1 --epochs 20 --expname control_r2 --log_dir "$LOG"

# 2c. Post-hoc serving-shortcut gate table at the trained teacher: evidence
#     that eval-time downscales FAIL the gate (so calibration is required).
if [ ! -f "$LOG/gate_posthoc.jsonl" ]; then
    echo "== run: gate_serving post-hoc table"
    python cli/gate_serving.py --ckpt "$T" --bdcn_weights "$BDCN" 2>&1 \
        | tee -a "$LOG/regen.log" | grep -E '^\{' > "$LOG/gate_posthoc.jsonl" || true
fi

# 3. Flagship shortcut calibration at the bench default shape (edge/4 seg/4):
#    same chz32 arch, serving downscales trained through, teacher-bootstrapped.
run "$LOG/distill/calib_e4s4_rm2/checkpoints/best" \
    python cli/distill.py --teacher_ckpt "$T" --setting baseline_edge --chz 32 \
    --init_from_teacher 1 --edge_downscale 4 --seg_downscale 4 --epochs 15 \
    --real_mix 128 --bdcn_weights "$BDCN" --synthetic 128 \
    --expname calib_e4s4_rm2 --log_dir "$LOG"

# 3b. The same calibration at edge/4 seg/2 (the former headline shape;
#     bench serves it under --seg-downscale 2).
run "$LOG/distill/calib_e4s2_rm2/checkpoints/best" \
    python cli/distill.py --teacher_ckpt "$T" --setting baseline_edge --chz 32 \
    --init_from_teacher 1 --edge_downscale 4 --seg_downscale 2 --epochs 15 \
    --real_mix 128 --bdcn_weights "$BDCN" --synthetic 128 \
    --expname calib_e4s2_rm2 --log_dir "$LOG"

# 4. North-star rung: baseline chz6 growth1.0 seg/4 (the 5,000+ fps shape).
run "$LOG/distill/ns_chz6_rm2/checkpoints/best" \
    python cli/distill.py --teacher_ckpt "$T" --setting baseline --chz 6 \
    --growth 1.0 --seg_downscale 4 --epochs 30 --real_mix 128 \
    --bdcn_weights "$BDCN" --synthetic 128 \
    --expname ns_chz6_rm2 --log_dir "$LOG"

# 5-7. Remaining ladder rungs (input_concat chz16/chz8, no-edge chz8).
run "$LOG/distill/ic16_rm2/checkpoints/best" \
    python cli/distill.py --teacher_ckpt "$T" --chz 16 --seg_downscale 4 \
    --epochs 30 --real_mix 128 --bdcn_weights "$BDCN" --synthetic 128 \
    --expname ic16_rm2 --log_dir "$LOG"

run "$LOG/distill/ic8_rm2/checkpoints/best" \
    python cli/distill.py --teacher_ckpt "$T" --chz 8 --seg_downscale 4 \
    --epochs 30 --real_mix 128 --bdcn_weights "$BDCN" --synthetic 128 \
    --expname ic8_rm2 --log_dir "$LOG"

run "$LOG/distill/b8_rm2/checkpoints/best" \
    python cli/distill.py --teacher_ckpt "$T" --setting baseline --chz 8 \
    --seg_downscale 4 --epochs 30 --real_mix 128 --bdcn_weights "$BDCN" \
    --synthetic 128 --expname b8_rm2 --log_dir "$LOG"

# 8. Fast-input frontier: the north-star student additionally runs the whole
#    net at 1/2 res (inputs pooled at model entry, logits upsampled back) —
#    the bandwidth-bound step's bytes drop ~4x. Gate decides if it serves.
run "$LOG/distill/ns_chz6_in2_rm2/checkpoints/best" \
    python cli/distill.py --teacher_ckpt "$T" --setting baseline --chz 6 \
    --growth 1.0 --seg_downscale 4 --input_downscale 2 --epochs 30 \
    --real_mix 128 --bdcn_weights "$BDCN" --synthetic 128 \
    --expname ns_chz6_in2_rm2 --log_dir "$LOG"

echo "== regen complete; gate lines in $GATES"
