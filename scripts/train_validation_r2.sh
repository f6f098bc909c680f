#!/bin/bash
# Round-2 training-stack validation: train all three stages on synthetic
# GEOM-like data (1 chip), then check sample quality (f32 + bf16) and run
# the trained end-to-end generate CLI. Numbers land in BASELINE.md.
set -x
cd /root/repo
python -m hierdiff_tpu.train.cli coarse \
  train.workdir=runs/coarse_r2 train.max_steps=1500 train.batch_size=32 \
  train.eval_every=500 train.checkpoint_every=500 "train.buckets=(8,16,24,32,48)" \
  train.num_train_trees=4096 2>&1 | tail -20
python -m hierdiff_tpu.train.cli denoise \
  train.workdir=runs/denoise_r2 train.max_steps=800 train.batch_size=32 \
  train.eval_every=400 train.checkpoint_every=400 "train.buckets=(8,16,24,32,48)" 2>&1 | tail -15
python -m hierdiff_tpu.train.cli refine \
  train.workdir=runs/refine_r2 train.max_steps=500 train.batch_size=16 \
  train.eval_every=250 train.checkpoint_every=250 "train.buckets=(8,16,24,32,48)" 2>&1 | tail -15
python scripts/sample_quality.py --workdir runs/coarse_r2 --num 256
python scripts/sample_quality.py --workdir runs/coarse_r2 --num 256 --bf16
python -m hierdiff_tpu.sampling.cli generate --workdir runs/coarse_r2 \
  --denoise-workdir runs/denoise_r2 --refine-workdir runs/refine_r2 \
  --num 16 --beam 5 --max-nodes 24 --out /tmp/generated_r2.pkl
