"""Compare trained-coarse-model samples against training-feature statistics.

SURVEY §7's validation item (c): "histogram match of sampled h-features
after rounding". Prints per-channel mean/std of sampled blur features vs the
training pool, plus the MMD(rbf) of each channel.

    python scripts/sample_quality.py --workdir runs/coarse --num 256
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root
import argparse

import jax
import jax.numpy as jnp
import numpy as np

from hierdiff_tpu.data.assets import load_geom_histogram
from hierdiff_tpu.data.synthetic import SyntheticTreeGenerator
from hierdiff_tpu.eval.metrics import mmd_rbf
from hierdiff_tpu.ops.distributions import DistributionNodes
from hierdiff_tpu.sampling.cli import build_coarse_from_cfg, load_checkpoint_params
from hierdiff_tpu.sampling.coarse import make_masks_for_counts, sample_coarse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True)
    p.add_argument("--num", type=int, default=256)
    p.add_argument("--max-nodes", type=int, default=48)
    p.add_argument("--bf16", action="store_true",
                   help="sample with bf16 matmul operands (quality check of "
                        "coarse.compute_dtype on trained weights)")
    p.add_argument("--steps", type=int, default=0,
                   help="strided reverse-chain steps (0 = full timesteps)")
    args = p.parse_args()

    params, cfg, step = load_checkpoint_params(args.workdir)
    model = build_coarse_from_cfg(cfg, compute_dtype="bfloat16" if args.bf16 else None)
    tag = (" [bf16]" if args.bf16 else "") + (f" [steps={args.steps}]" if args.steps else "")
    print(f"checkpoint step {step}{tag}")

    dist = DistributionNodes(load_geom_histogram())
    rng_np = np.random.default_rng(0)
    counts = np.minimum(dist.sample_np(rng_np, args.num), args.max_nodes)
    nm, em = make_masks_for_counts(counts)
    x, h = sample_coarse(model, params, jax.random.PRNGKey(0),
                         jnp.asarray(nm), jnp.asarray(em),
                         steps=args.steps or None)
    h = np.asarray(h)
    sampled = np.concatenate([h[i, :c] for i, c in enumerate(counts)])
    sampled = np.concatenate([np.round(sampled[:, :5]), sampled[:, 5:]], axis=1)

    pool = SyntheticTreeGenerator(seed=0).sample_trees(512)
    train_feats = np.concatenate([t.feats for t in pool])

    names = ["hbd", "fp0", "fp1", "fp2", "size", "fp4", "tpsa", "asa"]
    print(f"{'chan':>6} {'train mu':>9} {'sample mu':>9} {'train sd':>9} {'sample sd':>9} {'mmd':>8}")
    for c in range(8):
        t, s = train_feats[:, c], sampled[:, c]
        print(f"{names[c]:>6} {t.mean():9.3f} {s.mean():9.3f} {t.std():9.3f} {s.std():9.3f} "
              f"{mmd_rbf(t[:2000], s[:2000]):8.4f}")


if __name__ == "__main__":
    main()
