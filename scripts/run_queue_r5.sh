#!/bin/bash
# Round-5 serial measurement queue (one TPU chip — never two jobs at once).
# Stage order is by evidentiary weight (VERDICT r4):
#   1. edge-quality chain remainder (idempotent re-entry; #5)
#   2. reeval_gates: 256-sample + iris + center-CI gate re-evaluation over
#      every committed artifact (#3/#4)
#   3. real_protocol refresh: iris deltas + visibility tail blocks for all
#      gated rungs, refine_ab at the three scored rungs (#3, weak #3)
#   4. argless bench with the new refine-on + latency_by_rung stages (#2/#6)
# Each stage appends to $LOG/queue_r5.log; markers make re-runs cheap.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-logs}
mkdir -p "$LOG"
Q="$LOG/queue_r5.log"

stage() { # stage <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    local marker="$LOG/queue_r5.$name.done"
    if [ -f "$marker" ]; then
        echo "[queue] skip $name (done)" | tee -a "$Q"
        return 0
    fi
    echo "[queue] start $name $(date -u +%H:%M:%S)" | tee -a "$Q"
    timeout "$tmo" "$@" >> "$Q" 2>&1
    local rc=$?
    echo "[queue] stage $name done rc=$rc $(date -u +%H:%M:%S)" | tee -a "$Q"
    [ "$rc" = 0 ] && touch "$marker"
    return 0
}

stage edge_quality 14400 bash scripts/edge_quality.sh
stage reeval_gates 14400 python scripts/reeval_gates.py

# whole-clip protocol refresh (refine_ab only at the three rungs scored in
# round 4 — flagship + the two deployment students)
for art in calib_e4s4_rm2 b4_rm2 ns_chz6_rm2; do
    stage "protocol_$art" 3600 \
        python cli/real_protocol.py --ckpt "artifacts/$art" --refine_ab 1
done
for art in calib_e4s2_rm2 b8_rm2 ns_s8_rm2 ic8_rm2 ic16_rm2 \
           calib_e4s4_in2_boot ns_chz6_in2_boot; do
    stage "protocol_$art" 3600 \
        python cli/real_protocol.py --ckpt "artifacts/$art"
done

# criteria re-application with the refreshed whole-clip numbers (cheap,
# reads disk only; keeps gate.json and real_protocol.json consistent)
stage regate 600 python scripts/regate_artifacts.py

# full argless bench with a wide budget to compile+warm the new stages so
# the driver's end-of-round run is fast; JSON lines land in the log AND
# the last one in artifacts/bench_r5_verify.jsonl
stage bench 7200 env BENCH_BUDGET_S=5400 python bench.py
grep -h '^{"metric"' "$Q" | tail -1 > artifacts/bench_r5_verify.jsonl \
    2>/dev/null || true
python -c "import json; json.load(open('artifacts/bench_r5_verify.jsonl'))" \
    2>/dev/null || rm -f artifacts/bench_r5_verify.jsonl

touch "$LOG/queue_r5_done"
echo "[queue] all stages attempted" | tee -a "$Q"
