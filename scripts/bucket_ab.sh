#!/bin/bash
# Same-window A/B of the finer SAMPLING_BUCKETS pad set on the real TPU
# (BASELINE.md "Native host beam search + finer pad buckets": the simulated
# win is 1.23x less padded coarse N^2 / 1.33x less lattice N^3; this measures
# the realized wall-clock delta so the default can be decided on evidence).
#
# The tunneled chip is shared — only same-window A/Bs are comparable, so the
# two arms run back-to-back, interleaved, best-of-reps per arm.
#
# Usage: bash scripts/bucket_ab.sh [NUM] [BATCH] [REPS]
set -u
NUM=${1:-2048}
BATCH=${2:-256}
REPS=${3:-3}
cd "$(dirname "$0")/.."
echo "bucket A/B: $NUM molecules, batch $BATCH, $REPS interleaved reps"
for i in $(seq 1 "$REPS"); do
  echo "--- rep $i: default buckets"
  timeout 1500 python bench.py "$BATCH" --stage pipeline --num "$NUM"
  echo "--- rep $i: fine buckets"
  timeout 1500 python bench.py "$BATCH" --stage pipeline --num "$NUM" --fine-buckets
done
