"""Bucketed dense collation for padded fragment-tree batches.

Shape discipline for jit: fragment counts are padded to a small set of
static buckets so every (batch, bucket) shape compiles exactly once (cf.
SURVEY §5 "long-context": the scaling axis is batch + bounded N<=~96). The
emitted dict matches the semantics of the reference's ``PadCollate``
(endiffusion/dataset/blur_utils.py:110-155): node features, positions, node
mask, and a fully-connected no-self-loop edge mask.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence

import numpy as np

DEFAULT_BUCKETS = (8, 16, 24, 32, 48, 64, 96)

# Finer inference-side bucket set for large sampling sweeps: dense-EGNN cost
# is quadratic in the pad, and under the GEOM node-count histogram the
# default set wastes E[N_pad^2]/E[N^2] = 1.50x vs 1.22x for this one — a
# 1.23x padded-work reduction (18.7% less), bit-exact (padding is masked; see
# tests/test_collate.py padded-vs-unpadded pins) at the cost of 3 extra
# (batch, bucket) compiles, amortized by the persistent compilation cache.
# This set sits at the knee: multiples-of-4 (24 buckets) only reach 1.20x
# for 14 more 1000-step-scan compiles (each 20s-9min cold).
SAMPLING_BUCKETS = (8, 12, 16, 20, 24, 32, 40, 48, 64, 96)


def bucket_for(n: int, buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"tree with {n} nodes exceeds the largest bucket {buckets[-1]}")


def collate_coarse(trees: Iterable, max_n: int | None = None) -> Dict[str, np.ndarray]:
    """Dense batch for the coarse diffusion stage.

    trees: objects with .feats (n,F), .pos (n,3). Pads to ``max_n`` (or the
    bucket of the batch max).
    """
    trees = list(trees)
    ns = [t.feats.shape[0] for t in trees]
    n = max_n if max_n is not None else bucket_for(max(ns))
    b = len(trees)
    f = trees[0].feats.shape[1]
    feats = np.zeros((b, n, f), np.float32)
    pos = np.zeros((b, n, 3), np.float32)
    node_mask = np.zeros((b, n, 1), np.float32)
    edge_mask = np.zeros((b, n, n), np.float32)
    for i, t in enumerate(trees):
        k = t.feats.shape[0]
        feats[i, :k] = t.feats
        pos[i, :k] = t.pos
        node_mask[i, :k] = 1.0
        edge_mask[i, :k, :k] = 1.0 - np.eye(k)
    return {
        "node_feature": feats,
        "positions": pos,
        "atom_mask": node_mask,
        "edge_mask": edge_mask,
    }


def bucket_batches(trees: List, batch_size: int, buckets: Sequence[int] = DEFAULT_BUCKETS,
                   drop_remainder: bool = False) -> List[Dict[str, np.ndarray]]:
    """Group trees by bucket, emit dense batches of static shapes."""
    by_bucket: Dict[int, List] = {}
    for t in trees:
        by_bucket.setdefault(bucket_for(t.feats.shape[0], buckets), []).append(t)
    out = []
    for bkt, group in sorted(by_bucket.items()):
        for i in range(0, len(group), batch_size):
            chunk = group[i : i + batch_size]
            if drop_remainder and len(chunk) < batch_size:
                continue
            out.append(collate_coarse(chunk, max_n=bkt))
    return out
