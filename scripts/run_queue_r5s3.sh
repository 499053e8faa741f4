#!/bin/bash
# Round-5 session-3 serial TPU queue (one chip — one job at a time).
#
# Previous session committed the gate reeval (256-sample + iris + CIs);
# logs/ (gitignored) was reset, so the stages that DID NOT land in
# committed artifacts are re-driven here, highest evidentiary value
# first:
#   1. flagship whole-clip protocol refresh with per-eye score dump +
#      refine A/B, then the offline tail classification (VERDICT r4 #3/#4
#      tail half — the 27.9-px p90 needs a per-frame account)
#   2. restoration fine-tunes for the three widened-gate demotions
#      (b4 / ns_chz6 / ns_s8 — each failed ONLY the new center criteria,
#      with big mIoU slack; scripts/finetune_center_r5.sh)
#   3. round-5 protocol refresh (iris deltas + visibility tail) for every
#      remaining artifact whose committed real_protocol.json predates the
#      round-5 schema
#   4. criteria re-application over all artifacts (disk-only)
#   5. argless bench warm run so the driver's end-of-round invocation
#      hits a hot compile cache on the NEW stages (refine-on fps +
#      latency_by_rung)
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-logs}
mkdir -p "$LOG"
Q="$LOG/queue_r5s3.log"

stage() { # stage <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    local marker="$LOG/queue_r5s3.$name.done"
    if [ -f "$marker" ]; then
        echo "[q3] skip $name (done)" | tee -a "$Q"
        return 0
    fi
    echo "[q3] start $name $(date -u +%H:%M:%S)" | tee -a "$Q"
    timeout "$tmo" "$@" >> "$Q" 2>&1
    local rc=$?
    echo "[q3] stage $name rc=$rc $(date -u +%H:%M:%S)" | tee -a "$Q"
    [ "$rc" = 0 ] && touch "$marker"
    return 0
}

# list artifacts whose real_protocol.json lacks the round-5 iris fields
need_protocol() {
    python - <<'EOF'
import json, os, glob
order = ["b4_rm2", "ns_chz6_rm2", "ns_s8_rm2", "b8_rm2", "calib_e4s2_rm2",
         "ic8_rm2", "ic16_rm2", "ns_chz6_in2_boot", "calib_e4s4_in2_boot",
         "calib_e4s4_in2_rm2", "ns_chz6_in2_rm2"]
for name in order:
    d = os.path.join("artifacts", name)
    if not os.path.isdir(os.path.join(d, "checkpoints")):
        continue
    p = os.path.join(d, "real_protocol.json")
    need = True
    if os.path.exists(p):
        try:
            rec = json.load(open(p))
            need = not any("iris" in k for k in rec.get("vs_teacher", {}))
        except Exception:
            need = True
    if need:
        print(name)
EOF
}

# 1. flagship protocol + tail classification
stage protocol_flagship 2700 \
    python cli/real_protocol.py --ckpt artifacts/calib_e4s4_rm2 \
    --refine_ab 1 --dump_scores 1
stage tail_flagship 600 \
    python scripts/tail_analysis.py --ckpt artifacts/calib_e4s4_rm2

# 2. restoration fine-tunes (script is idempotent per-rung via markers in
#    $LOG/distill/<exp>; ends with protocol re-score + regate for swapped
#    rungs)
stage finetune_chain 6000 bash scripts/finetune_center_r5.sh

# 3. remaining round-5 protocol refreshes (scored rungs get the A/B;
#    every run dumps per-eye scores for offline tail work)
for art in $(need_protocol); do
    ab=0
    case "$art" in b4_rm2|ns_chz6_rm2) ab=1 ;; esac
    stage "protocol_$art" 2400 \
        python cli/real_protocol.py --ckpt "artifacts/$art" \
        --refine_ab "$ab" --dump_scores 1
    stage "tail_$art" 600 \
        python scripts/tail_analysis.py --ckpt "artifacts/$art"
done

# 4. keep criteria blocks consistent everywhere
stage regate 900 python scripts/regate_artifacts.py

# 5. bench warm run (new refine-on + latency_by_rung stages)
stage bench 2700 env BENCH_BUDGET_S=2100 python bench.py
grep -h '^{"metric"' "$Q" | tail -1 > artifacts/bench_r5_verify.jsonl \
    2>/dev/null || true
python -c "import json; json.load(open('artifacts/bench_r5_verify.jsonl'))" \
    2>/dev/null || rm -f artifacts/bench_r5_verify.jsonl

touch "$LOG/queue_r5s3_done"
echo "[q3] all stages attempted $(date -u +%H:%M:%S)" | tee -a "$Q"
