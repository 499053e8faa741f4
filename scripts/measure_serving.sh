#!/bin/bash
# Post-regeneration serving measurements on the real chip, one JSON line
# per point into logs/serving_points.jsonl:
#   1. the default headline (auto-discovers the gated artifacts)
#   2. a batch sweep of the fast-input (in/2) north-star student shape,
#      including batches past the default sweep ceiling (the in/2 step
#      moves ~4x fewer activation bytes, so bigger batches may fit)
set -u
cd "$(dirname "$0")/.."
LOG=${1:-logs}
OUT="$LOG/serving_points.jsonl"

echo "== default headline" >> "$LOG/measure.log"
python bench.py 2>>"$LOG/measure.log" | tail -1 >> "$OUT"

CKPT_ARG=""
if [ -d "$LOG/distill/ns_chz6_in2_rm2/checkpoints" ]; then
    CKPT_ARG="--ckpt $LOG/distill/ns_chz6_in2_rm2/checkpoints"
fi
for B in 0 384 512; do
    echo "== in2 student, batch $B" >> "$LOG/measure.log"
    python bench.py --setting baseline --chz 6 --growth 1.0 \
        --input-downscale 2 --seg-downscale 4 --edge-downscale 4 \
        --batch-frames "$B" --no-student --no-train-cost $CKPT_ARG \
        2>>"$LOG/measure.log" | tail -1 >> "$OUT"
done

echo "== measure complete"
