#!/bin/bash
# Regenerate every trained artifact behind BASELINE.md's gated claims from
# nothing (no reference weights, no datasets): BDCN edge net (quality-gated,
# resumed until it clears the bar) -> baseline_edge teacher + no-edge
# control -> fidelity-gated serving-student ladder (real-frame mix-in,
# disjoint-frame protocol). Each stage appends its JSON gate line to
# logs/regen_gates.jsonl AND exports its servable artifact (best checkpoint
# + gate.json + history) into the COMMITTED artifacts/ tree, so the repo
# alone carries the evidence (bench.py auto-discovers artifacts/ first).
#
# Stages are ordered highest-leverage first so a time-boxed round that
# kills the chain early still leaves bench serving gated weights.
# Safe to re-run: finished stages are skipped. REGEN_QUICK=1 halves all
# epoch budgets for a time-boxed pass.
#
# Usage: bash scripts/regen_artifacts.sh [logdir]   (default: logs)
set -u
cd "$(dirname "$0")/.."
LOG=${1:-logs}
ART=artifacts
mkdir -p "$LOG" "$ART"
GATES="$LOG/regen_gates.jsonl"
VID=/root/reference/videos/example1.avi
Q=${REGEN_QUICK:-0}
ep() { if [ "$Q" = 1 ]; then echo $((($1 + 1) / 2)); else echo "$1"; fi; }

run() { # run <done-marker-dir> <cmd...>
    # The axon compile helper is OOM-SIGKILLed server-side now and then
    # (HTTP 500 through remote_compile) — transient; a rerun usually hits
    # the persistent compile cache. Retry each stage up to 3 times until
    # its done-marker exists (a retry restarts the stage fresh; compile
    # failures happen at epoch 0, before any work worth keeping).
    local marker=$1; shift
    local attempt
    for attempt in 1 2 3; do
        if [ -d "$marker" ]; then
            [ "$attempt" = 1 ] && echo "== skip (exists): $marker"
            return 0
        fi
        echo "== run (attempt $attempt): $*"
        "$@" 2>&1 | tee -a "$LOG/regen.log" | grep -E '^\{' >> "$GATES" || true
    done
    [ -d "$marker" ] || echo "== FAILED after 3 attempts: $marker"
}

export_art() { # export_art <name> <run_dir> [weights|noweights]
    local name=$1 run=$2 mode=${3:-weights}
    mkdir -p "$ART/$name"
    if [ "$mode" = weights ]; then
        rm -rf "$ART/$name/checkpoints"
        mkdir -p "$ART/$name/checkpoints"
        local tag
        for tag in best bdcn; do
            [ -d "$run/checkpoints/$tag" ] && \
                cp -r "$run/checkpoints/$tag" "$ART/$name/checkpoints/$tag"
        done
    fi
    local f
    for f in gate.json args.json history.json; do
        [ -f "$run/$f" ] && cp "$run/$f" "$ART/$name/$f"
    done
    echo "== exported $run -> $ART/$name ($mode)"
}

# ---------------------------------------------------------------- 1. BDCN
# Edge stage trained from scratch on synthetic boundary maps (CLAUDE.md
# recipe: reference init + clip(1.0) + adam(1e-3)), then RESUMED until it
# clears the quality bar (best val_f1 >= 0.35; round-2's 10-epoch run
# stopped at 0.297 still climbing — an unconverged edge net, VERDICT #3).
# Round-5 recipe upgrade (BASELINE.md edge-quality chain): 4x data +
# cosine LR decay + best-val-F1 checkpointing lifted the DEGRADED-
# distribution BDCN from F1 0.47 to 0.765 at the same epoch budget, and
# only at that quality does the downstream mIoU gain appear — so the
# regen default is now the converging recipe, not the minimal one.
# Downstream stages refuse a BDCN whose gate has not passed.
run "$LOG/bdcn/r2/checkpoints/bdcn" \
    python cli/train_bdcn.py --synthetic 256 --epochs "$(ep 30)" \
    --lr_decay cosine --expname r2 --log_dir "$LOG"

BDCN_RUN="$LOG/bdcn/r2"
BDCN="$BDCN_RUN/checkpoints"

bdcn_ok() {
    BDCN_RUN="$BDCN_RUN" python -c '
import json, os, sys
try:
    rec = json.load(open(os.path.join(os.environ["BDCN_RUN"], "gate.json")))
    sys.exit(0 if rec.get("accepted") else 1)
except Exception:
    sys.exit(1)'
}

if ! bdcn_ok; then
    for attempt in 1 2 3; do
        if [ -f "$BDCN_RUN/history.json" ]; then
            python scripts/bdcn_gate.py --run_dir "$BDCN_RUN" 2>&1 \
                | tee -a "$LOG/regen.log" | grep -E '^\{' >> "$GATES" || true
            bdcn_ok && break
        fi
        echo "== bdcn below quality bar; resuming +$(ep 10) epochs (attempt $attempt)"
        python cli/train_bdcn.py --synthetic 256 --epochs "$(ep 10)" --resume 1 \
            --lr_decay cosine --expname r2 --log_dir "$LOG" 2>&1 \
            | tee -a "$LOG/regen.log" | grep -E '^\{' >> "$GATES" || true
        python scripts/bdcn_gate.py --run_dir "$BDCN_RUN" 2>&1 \
            | tee -a "$LOG/regen.log" | grep -E '^\{' >> "$GATES" || true
        bdcn_ok && break
    done
fi
if ! bdcn_ok; then
    echo "== ABORT: BDCN failed its quality gate (logs/bdcn/r2/gate.json);"
    echo "   downstream teacher/students refuse an unconverged edge net."
    exit 3
fi
export_art bdcn "$BDCN_RUN"

# ------------------------------------------------------------- 2. teacher
# baseline_edge chz32 teacher (BASELINE.md recipe; 20 epochs so the
# reference schedule — plateau patience 5, early-stop patience 10 —
# actually gets to fire).
run "$LOG/ritnet_v2/teacher_r2/checkpoints/best" \
    python cli/train.py --setting baseline_edge --synthetic 128 --batchsize 16 \
    --remat 1 --epochs "$(ep 20)" --bdcn_weights "$BDCN" \
    --expname teacher_r2 --log_dir "$LOG"

T="$LOG/ritnet_v2/teacher_r2/checkpoints"
export_art teacher "$LOG/ritnet_v2/teacher_r2"

# 2b. No-edge control at identical settings: the edge-guided-vs-baseline
#     comparison must be reproducible from the same chain (history only —
#     the control's evidence is its training curve, not its weights).
run "$LOG/ritnet_v2/control_r2/checkpoints/best" \
    python cli/train.py --setting baseline --synthetic 128 --batchsize 16 \
    --remat 1 --epochs "$(ep 20)" --expname control_r2 --log_dir "$LOG"
export_art control "$LOG/ritnet_v2/control_r2" noweights

# 2c. Downstream BDCN delta (informational): best-val-mIoU of the
#     edge-guided teacher vs the no-edge control. On the clean synthetic
#     distribution this saturates (BASELINE.md); the scientific
#     edge-guidance evidence is scripts/edge_ablation.sh on the degraded
#     distribution.
if [ ! -f "$ART/bdcn/downstream.json" ]; then
    LOG="$LOG" ART="$ART" python -c '
import json, os
log, art = os.environ["LOG"], os.environ["ART"]
def best_miou(run):
    with open(os.path.join(log, "ritnet_v2", run, "history.json")) as f:
        h = json.load(f)
    return max(e["valid"]["mean_iou"] for e in h)
t, c = best_miou("teacher_r2"), best_miou("control_r2")
rec = {"stage": "bdcn_downstream_delta", "teacher_val_miou": round(t, 4),
       "control_val_miou": round(c, 4), "delta": round(t - c, 4),
       "accepted": bool(t >= c - 0.005)}
with open(os.path.join(art, "bdcn", "downstream.json"), "w") as f:
    json.dump(rec, f, indent=1)
print(json.dumps(rec))' 2>&1 | tee -a "$LOG/regen.log" | grep -E '^\{' >> "$GATES" || true
fi

# 2d. Post-hoc serving-shortcut gate table at the trained teacher: evidence
#     that eval-time downscales FAIL the gate (so calibration is required).
if [ ! -f "$LOG/gate_posthoc.jsonl" ]; then
    echo "== run: gate_serving post-hoc table"
    python cli/gate_serving.py --ckpt "$T" --bdcn_weights "$BDCN" 2>&1 \
        | tee -a "$LOG/regen.log" | grep -E '^\{' > "$LOG/gate_posthoc.jsonl" || true
    cp "$LOG/gate_posthoc.jsonl" "$ART/gate_posthoc.jsonl" 2>/dev/null || true
fi

# ------------------------------------------- 3. flagship calibrated rungs
# Shortcut calibration at the bench default shape (edge/4 seg/4): same
# chz32 arch, serving downscales trained through, teacher-bootstrapped.
run "$LOG/distill/calib_e4s4_rm2/checkpoints/best" \
    python cli/distill.py --teacher_ckpt "$T" --setting baseline_edge --chz 32 \
    --init_from_teacher 1 --edge_downscale 4 --seg_downscale 4 \
    --epochs "$(ep 15)" --real_mix 128 --bdcn_weights "$BDCN" --synthetic 128 \
    --expname calib_e4s4_rm2 --log_dir "$LOG"
export_art calib_e4s4_rm2 "$LOG/distill/calib_e4s4_rm2"

# ------------------------------------------------- 4. student ladder core
# North-star rung: baseline chz6 growth1.0 seg/4 (the 5,000+ fps shape).
run "$LOG/distill/ns_chz6_rm2/checkpoints/best" \
    python cli/distill.py --teacher_ckpt "$T" --setting baseline --chz 6 \
    --growth 1.0 --seg_downscale 4 --epochs "$(ep 30)" --real_mix 128 \
    --bdcn_weights "$BDCN" --synthetic 128 \
    --expname ns_chz6_rm2 --log_dir "$LOG"
export_art ns_chz6_rm2 "$LOG/distill/ns_chz6_rm2"

# Fast-input frontier: the north-star student additionally runs the whole
# net at 1/2 res — the bandwidth-bound step's bytes drop ~4x.
run "$LOG/distill/ns_chz6_in2_rm2/checkpoints/best" \
    python cli/distill.py --teacher_ckpt "$T" --setting baseline --chz 6 \
    --growth 1.0 --seg_downscale 4 --input_downscale 2 --epochs "$(ep 30)" \
    --real_mix 128 --bdcn_weights "$BDCN" --synthetic 128 \
    --expname ns_chz6_in2_rm2 --log_dir "$LOG"
export_art ns_chz6_in2_rm2 "$LOG/distill/ns_chz6_in2_rm2"

# ------------------------------- 5. fast-input PARITY-ARCHITECTURE rung
# The chz32 baseline_edge flagship at edge/4 seg/4 ADDITIONALLY trained
# through in/2 (VERDICT r2 #4): the flagship roofline is dominated by
# full-res early feature maps; in/2 cuts them ~4x. Not strictly
# teacher-initable (regression-head flatten width changes), so it gets
# the longer student schedule. From scratch this FAILS its gate (drop
# 0.031 — kept as committed negative evidence).
run "$LOG/distill/calib_e4s4_in2_rm2/checkpoints/best" \
    python cli/distill.py --teacher_ckpt "$T" --setting baseline_edge --chz 32 \
    --edge_downscale 4 --seg_downscale 4 --input_downscale 2 \
    --epochs "$(ep 30)" --real_mix 128 --bdcn_weights "$BDCN" --synthetic 128 \
    --expname calib_e4s4_in2_rm2 --log_dir "$LOG"
export_art calib_e4s4_in2_rm2 "$LOG/distill/calib_e4s4_in2_rm2"

# 5b. The fix that GATES in/2 (round 3): partial-bootstrap every
#     path+shape-matching leaf from the gated full-res e4s4 student
#     (--init_ckpt; only the regression head's flatten Dense stays fresh)
#     at a gentler lr. Passing gate -> bench.py auto-promotes in/2 to the
#     default flagship measurement (2,228 fps vs 621 at full-res input).
run "$LOG/distill/calib_e4s4_in2_boot/checkpoints/best" \
    python cli/distill.py --teacher_ckpt "$T" --setting baseline_edge --chz 32 \
    --edge_downscale 4 --seg_downscale 4 --input_downscale 2 \
    --init_ckpt "$LOG/distill/calib_e4s4_rm2/checkpoints" --lr 3e-4 \
    --epochs "$(ep 30)" --real_mix 128 --bdcn_weights "$BDCN" --synthetic 128 \
    --expname calib_e4s4_in2_boot --log_dir "$LOG"
export_art calib_e4s4_in2_boot "$LOG/distill/calib_e4s4_in2_boot"

# ---------------------------------------------- 6. remaining ladder rungs
# The former headline shape (edge/4 seg/2; bench serves it under
# --seg-downscale 2).
run "$LOG/distill/calib_e4s2_rm2/checkpoints/best" \
    python cli/distill.py --teacher_ckpt "$T" --setting baseline_edge --chz 32 \
    --init_from_teacher 1 --edge_downscale 4 --seg_downscale 2 \
    --epochs "$(ep 15)" --real_mix 128 --bdcn_weights "$BDCN" --synthetic 128 \
    --expname calib_e4s2_rm2 --log_dir "$LOG"
export_art calib_e4s2_rm2 "$LOG/distill/calib_e4s2_rm2"

run "$LOG/distill/ic16_rm2/checkpoints/best" \
    python cli/distill.py --teacher_ckpt "$T" --chz 16 --seg_downscale 4 \
    --epochs "$(ep 30)" --real_mix 128 --bdcn_weights "$BDCN" --synthetic 128 \
    --expname ic16_rm2 --log_dir "$LOG"
export_art ic16_rm2 "$LOG/distill/ic16_rm2"

run "$LOG/distill/ic8_rm2/checkpoints/best" \
    python cli/distill.py --teacher_ckpt "$T" --chz 8 --seg_downscale 4 \
    --epochs "$(ep 30)" --real_mix 128 --bdcn_weights "$BDCN" --synthetic 128 \
    --expname ic8_rm2 --log_dir "$LOG"
export_art ic8_rm2 "$LOG/distill/ic8_rm2"

run "$LOG/distill/b8_rm2/checkpoints/best" \
    python cli/distill.py --teacher_ckpt "$T" --setting baseline --chz 8 \
    --seg_downscale 4 --epochs "$(ep 30)" --real_mix 128 --bdcn_weights "$BDCN" \
    --synthetic 128 --expname b8_rm2 --log_dir "$LOG"
export_art b8_rm2 "$LOG/distill/b8_rm2"

# Ceiling probes past the 5,021 fps north star (gated either way):
run "$LOG/distill/b4_rm2/checkpoints/best" \
    python cli/distill.py --teacher_ckpt "$T" --setting baseline --chz 4 \
    --growth 1.0 --seg_downscale 4 --epochs "$(ep 30)" --real_mix 128 \
    --bdcn_weights "$BDCN" --synthetic 128 --expname b4_rm2 --log_dir "$LOG" \
    --remat 1
export_art b4_rm2 "$LOG/distill/b4_rm2"

run "$LOG/distill/ns_s8_rm2/checkpoints/best" \
    python cli/distill.py --teacher_ckpt "$T" --setting baseline --chz 6 \
    --growth 1.0 --seg_downscale 8 --epochs "$(ep 30)" --real_mix 128 \
    --bdcn_weights "$BDCN" --synthetic 128 --expname ns_s8_rm2 --log_dir "$LOG"
export_art ns_s8_rm2 "$LOG/distill/ns_s8_rm2"

# North-star in/2 via the partial bootstrap that gated the flagship in/2
# (from-scratch in/2 at chz6 FAILED its gate — kept as negative evidence
# in artifacts/ns_chz6_in2_rm2).
run "$LOG/distill/ns_chz6_in2_boot/checkpoints/best" \
    python cli/distill.py --teacher_ckpt "$T" --setting baseline --chz 6 \
    --growth 1.0 --seg_downscale 4 --input_downscale 2 \
    --init_ckpt "$LOG/distill/ns_chz6_rm2/checkpoints" --lr 3e-4 \
    --epochs "$(ep 30)" --real_mix 128 --bdcn_weights "$BDCN" --synthetic 128 \
    --expname ns_chz6_in2_boot --log_dir "$LOG"
export_art ns_chz6_in2_boot "$LOG/distill/ns_chz6_in2_boot"

# Ceiling x fast-input: chz4 additionally at in/2, partial-bootstrapped
# from the gated full-res chz4 rung (same recipe that gated in/2 at
# chz6 and chz32). --remat 1 keeps the chz4 distill program small
# enough for the server-side compile helper.
run "$LOG/distill/b4_in2_boot/checkpoints/best" \
    python cli/distill.py --teacher_ckpt "$T" --setting baseline --chz 4 \
    --growth 1.0 --seg_downscale 4 --input_downscale 2 \
    --init_ckpt "$LOG/distill/b4_rm2/checkpoints" --lr 3e-4 \
    --epochs "$(ep 30)" --real_mix 128 --bdcn_weights "$BDCN" --synthetic 128 \
    --expname b4_in2_boot --log_dir "$LOG" --remat 1
export_art b4_in2_boot "$LOG/distill/b4_in2_boot"

# ---------------------------------------- 7. whole-clip real protocol
# Re-score the key artifacts on all demo-clip frames out-of-sample
# (VERDICT r2 #6); writes real_protocol.json beside each gate.json.
for rung in calib_e4s4_rm2 ns_chz6_rm2 b8_rm2 calib_e4s4_in2_boot \
            ns_s8_rm2 b4_rm2 ns_chz6_in2_boot b4_in2_boot \
            ic16_rm2 ic8_rm2 calib_e4s2_rm2; do
    if [ ! -f "$ART/$rung/real_protocol.json" ]; then
        python cli/real_protocol.py --ckpt "$ART/$rung" 2>&1 \
            | tee -a "$LOG/regen.log" | grep -E '^\{' >> "$GATES" || true
    fi
done

echo "== regen complete; gate lines in $GATES; artifacts in $ART/"
