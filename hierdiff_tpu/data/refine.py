"""Training batches for the refine stage (masked-node type prediction).

Host equivalent of data_utils/dataset_refine.py: mask one random node per
tree (token 780, zeroed features), emit dense tensors; the BFS depth program
is computed on device by the model.
"""

from __future__ import annotations

import random
from typing import Dict, Iterable, List, Optional

import numpy as np

from hierdiff_tpu.data.assets import load_size_dict
from hierdiff_tpu.data.collate import bucket_for
from hierdiff_tpu.models.refine import MASK_TOKEN


def size_support_indices(size: int, vocab_size: int = 780) -> List[int]:
    """Allowed vocab indices for a heavy-atom count, with the reference's
    +-1/+-2 fallback for unseen sizes (ar_sampling_nosize.py:115-122)."""
    sd = load_size_dict()
    if size in sd and sd[size]:
        return sd[size]
    best: List[int] = []
    for perm in (-1, 1, -2, 2):
        cand = sd.get(size + perm, [])
        if len(cand) > len(best):
            best = cand
    return best or list(range(vocab_size))


def make_refine_batch(trees: Iterable, rng: random.Random, max_n: Optional[int] = None,
                      vocab_size: int = 780) -> Dict[str, np.ndarray]:
    trees = list(trees)
    ns = [t.adj.shape[0] for t in trees]
    n = max_n if max_n is not None else bucket_for(max(ns))
    b = len(trees)
    f = trees[0].feats.shape[1]
    out = {
        "feats": np.zeros((b, n, f), np.float32),
        "vocab": np.zeros((b, n), np.int32),
        "size": np.zeros((b, n), np.int32),
        "pos": np.zeros((b, n, 3), np.float32),
        "adj": np.zeros((b, n, n), np.float32),
        "node_mask": np.zeros((b, n, 1), np.float32),
        "predict_idx": np.zeros((b,), np.int32),
        "label": np.zeros((b,), np.int32),
        "val": np.zeros((b,), np.float32),
        "size_support": np.zeros((b, vocab_size), np.float32),
    }
    for i, t in enumerate(trees):
        k = t.adj.shape[0]
        chosen = rng.randint(0, k - 1)
        out["feats"][i, :k] = t.feats
        out["feats"][i, chosen] = 0.0
        out["vocab"][i, :k] = t.wids
        out["vocab"][i, chosen] = MASK_TOKEN
        out["size"][i, :k] = t.sizes
        out["pos"][i, :k] = t.pos
        out["adj"][i, :k, :k] = t.adj
        out["node_mask"][i, :k] = 1.0
        out["predict_idx"][i] = chosen
        out["label"][i] = t.wids[chosen]
        out["val"][i] = t.adj[chosen].sum()
        support = size_support_indices(int(t.sizes[chosen]), vocab_size)
        out["size_support"][i, support] = 1.0
        # the true label must be scorable even if outside its size bucket
        out["size_support"][i, t.wids[chosen]] = 1.0
    return out
