#!/bin/bash
# Round-4 TPU evidence queue: wait for the axon tunnel, then run the
# round's TPU-bound jobs sequentially (they contend on one chip + one
# host core, so never in parallel):
#   1. b256 serving-cliff diagnostic          (VERDICT r3 #6, fast)
#   2. center-KD retrain of demoted rungs     (VERDICT r3 #2) + refine A/B
#      re-protocols                           (VERDICT r3 #5)
#   3. multi-seed paired edge ablation        (VERDICT r3 #3)
# Every stage is idempotent (done-markers / skip-if-exists), so rerunning
# this script after a tunnel outage or timeout continues where it left
# off. Stage timeouts bound tunnel-hang damage; evidence exports happen
# incrementally inside each stage.
set -u
cd "$(dirname "$0")/.."
LOG=logs
mkdir -p "$LOG"

probe() { # tunnel up? (process-level timeout reclaims a native hang)
    timeout 75 python -c "import jax; print('NDEV', len(jax.devices()))" \
        >/dev/null 2>&1
}

wait_tunnel() {
    local n=0
    until probe; do
        n=$((n + 1))
        echo "[queue] tunnel down (probe $n); retrying in 180s" \
            | tee -a "$LOG/queue.log"
        sleep 180
    done
    echo "[queue] tunnel up" | tee -a "$LOG/queue.log"
}

stage() { # stage <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    wait_tunnel
    echo "[queue] stage $name start $(date -u +%H:%M:%S)" \
        | tee -a "$LOG/queue.log"
    timeout "$tmo" "$@" >>"$LOG/queue.log" 2>&1
    local rc=$?
    echo "[queue] stage $name done rc=$rc $(date -u +%H:%M:%S)" \
        | tee -a "$LOG/queue.log"
}

if [ ! -s "$LOG/b256_diag.json" ]; then
    stage b256 2400 python scripts/diagnose_b256.py
    # diagnose prints its JSON line last; pull it out of the queue log and
    # reject a timeout-truncated line (ADVICE r4 #5: a mid-print kill can
    # leave partial JSON that passes the -s check)
    grep -E '^\{"device"' "$LOG/queue.log" | tail -1 > "$LOG/b256_diag.json"
    python -c "import json,sys; json.load(open('$LOG/b256_diag.json'))" \
        2>/dev/null || rm -f "$LOG/b256_diag.json"
fi

stage retrain_center 16200 bash scripts/retrain_center.sh
stage edge_ablation_seeds 16200 bash scripts/edge_ablation_seeds.sh

touch "$LOG/queue_done"
echo "[queue] all stages attempted" | tee -a "$LOG/queue.log"
