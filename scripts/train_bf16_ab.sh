#!/bin/bash
# bf16 TRAINING convergence A/B (ROADMAP round-4 #2): train the coarse stage
# twice with identical seeds/data — f32 vs coarse.compute_dtype=bfloat16 —
# then compare val-loss curves (runs/*/metrics.csv) and sampled-distribution
# quality (scripts/sample_quality.py MMD). The inference-side bf16
# distribution equivalence does not automatically transfer to gradients;
# this is the direct test.
set -x
cd /root/repo
STEPS=${STEPS:-4000}
python -m hierdiff_tpu.train.cli coarse \
  train.workdir=runs/coarse_ab_f32 train.max_steps=$STEPS train.batch_size=32 \
  train.eval_every=250 train.checkpoint_every=2000 \
  "train.buckets=(8,16,24,32,48)" train.num_train_trees=4096 2>&1 | tail -5
python -m hierdiff_tpu.train.cli coarse \
  train.workdir=runs/coarse_ab_bf16 train.max_steps=$STEPS train.batch_size=32 \
  train.eval_every=250 train.checkpoint_every=2000 \
  "train.buckets=(8,16,24,32,48)" train.num_train_trees=4096 \
  coarse.compute_dtype=bfloat16 2>&1 | tail -5
echo "=== val curves ==="
grep val runs/coarse_ab_f32/metrics.csv | tail -20
grep val runs/coarse_ab_bf16/metrics.csv | tail -20
python scripts/sample_quality.py --workdir runs/coarse_ab_f32 --num 256
python scripts/sample_quality.py --workdir runs/coarse_ab_bf16 --num 256
