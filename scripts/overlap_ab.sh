#!/bin/bash
# Same-window A/B of the stage-1/2 overlap (GenerationPipeline.run overlap:
# _BlurFeeder streams coarse chunks into LatticeSampler.sample_streamed so
# refine-search rounds interleave with the remaining coarse chunks' device
# programs — VERDICT r4 #1). Arms: HIERDIFF_PIPE_OVERLAP=0 (serial staging,
# the reference's shape, readme.md:40-66) vs =1 (streamed).
#
# The tunneled chip is shared — only same-window A/Bs are comparable, so the
# two arms run back-to-back, interleaved.
#
# Usage: bash scripts/overlap_ab.sh [NUM] [BATCH] [REPS] [EXTRA...]
set -u
NUM=${1:-1024}
BATCH=${2:-256}
REPS=${3:-3}
shift 3 2>/dev/null || shift $#
cd "$(dirname "$0")/.."
echo "overlap A/B: $NUM molecules, batch $BATCH, $REPS interleaved reps, extra: $*"
for i in $(seq 1 "$REPS"); do
  echo "--- rep $i: overlap OFF (serial staging)"
  HIERDIFF_PIPE_OVERLAP=0 timeout 2000 python bench.py "$BATCH" --stage pipeline --num "$NUM" --refine --reps 1 "$@"
  echo "--- rep $i: overlap ON (streamed)"
  HIERDIFF_PIPE_OVERLAP=1 timeout 2000 python bench.py "$BATCH" --stage pipeline --num "$NUM" --refine --reps 1 "$@"
done
