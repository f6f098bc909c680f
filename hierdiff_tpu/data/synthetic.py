"""Synthetic GEOM-like fragment trees for smoke training and benchmarks.

Generates random junction trees whose statistics mirror the real pipeline:
node counts from the GEOM histogram, fragment features drawn from the actual
vocabulary fingerprint table (so the `array_dict` feature buckets are
realizable), and 3D fragment centers laid out along the tree with
chemically plausible inter-fragment distances.

The real data path (RDKit tree_decomp over GEOM conformers) lives in
``hierdiff_tpu.chem``; this module exists so every training / sampling /
benchmark component runs end-to-end without the 300GB GEOM download.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from hierdiff_tpu.data.assets import load_histogram, load_vocab_fps, load_vocab_smiles


@dataclass
class SyntheticTree:
    """A blurred junction tree: features, positions, adjacency, vocab ids."""

    feats: np.ndarray       # (n, 8) prop features [hbd, fp0..4, tpsa, asa]
    pos: np.ndarray         # (n, 3) fragment centers
    adj: np.ndarray         # (n, n) 0/1 symmetric tree adjacency
    wids: np.ndarray        # (n,) vocab indices
    sizes: np.ndarray       # (n,) heavy-atom counts


class SyntheticTreeGenerator:
    def __init__(self, seed: int = 0, mode: str = "prop", dataset: str = "geom",
                 planted: bool = False, planted_k: int = 32):
        """``planted=True`` plants a deterministic, learnable feature->type
        signal: every tree uses ONE vocab id drawn from ``planted_k``
        unique-fingerprint entries, so (a) the denoise node head can recover
        the type from the new node's visible fp (bijective on the subset)
        and (b) the refine head can recover a masked node's type from its
        neighbors' ids. Separates "head is wired correctly" (accuracy must
        climb far above chance) from "labels are noise" — the default
        uniform-wid data caps node accuracy only via fp-row collisions
        (750/780 prop fps are unique, so its ceiling is ~96%, not 10%).
        """
        self.rng = np.random.default_rng(seed)
        hist = load_histogram(dataset)
        self.counts = np.array(sorted(hist.keys()))
        p = np.array([hist[int(c)] for c in self.counts], dtype=np.float64)
        self.count_probs = p / p.sum()
        self.smiles = load_vocab_smiles()
        fps = load_vocab_fps(mode)
        self.fp_table = np.stack([fps[s] for s in self.smiles])  # (V, 5)
        self.mode = mode
        self.planted = planted
        if planted:
            from collections import Counter
            rows = [tuple(r) for r in self.fp_table]
            counts_by_row = Counter(rows)
            uniq = [i for i, r in enumerate(rows) if counts_by_row[r] == 1]
            if not uniq:
                raise ValueError(
                    "planted mode needs at least one unique fingerprint row "
                    f"(mode={mode!r} table has none)")
            if len(uniq) < planted_k:
                # e.g. 'elem' has only 15 unique rows of 780; deliver what
                # exists rather than silently weakening the guarantee
                import warnings
                warnings.warn(
                    f"planted_k={planted_k} requested but only {len(uniq)} "
                    f"unique fingerprint rows exist in mode={mode!r}; "
                    f"using {len(uniq)}")
            self.planted_wids = np.array(uniq[:planted_k], np.int64)

    def sample_count(self) -> int:
        return int(self.rng.choice(self.counts, p=self.count_probs))

    def sample_tree(self, n: Optional[int] = None) -> SyntheticTree:
        if n is None:
            n = self.sample_count()
        rng = self.rng
        # random tree: attach node i to a uniform previous node
        adj = np.zeros((n, n), np.float64)
        pos = np.zeros((n, 3))
        parents = np.zeros(n, np.int64)
        for i in range(1, n):
            p = int(rng.integers(0, i))
            parents[i] = p
            adj[i, p] = adj[p, i] = 1.0
            direction = rng.normal(size=3)
            direction /= np.linalg.norm(direction) + 1e-9
            dist = 2.4 + rng.random() * 2.2  # fragment-center spacing ~2.4-4.6 A
            pos[i] = pos[p] + direction * dist
        pos -= pos.mean(axis=0, keepdims=True)

        if self.planted:
            wids = np.full(n, rng.choice(self.planted_wids), np.int64)
        else:
            wids = rng.integers(0, len(self.smiles), size=n)
        fp = self.fp_table[wids]                       # (n, 5) prop | (n, 3) elem
        if self.mode == "elem":
            # elem coarse features are the bare 3-column element-count fp
            # (blur_utils.py:86-87); heavy atoms = sum of element counts
            feats = fp
            sizes = fp.sum(axis=1).astype(np.int64)
        else:
            hbd = rng.poisson(0.8, size=n).clip(0, 6).astype(np.float64)
            tpsa = rng.gamma(2.0, 1.0, size=n)             # /10-scaled TPSA-like
            asa = 2.0 + rng.gamma(2.0, 1.5, size=n)        # /10-scaled ASA-like
            feats = np.concatenate([hbd[:, None], fp, tpsa[:, None], asa[:, None]], axis=1)
            sizes = fp[:, 3].astype(np.int64)              # col 3 = heavy-atom count
        return SyntheticTree(feats=feats.astype(np.float32), pos=pos.astype(np.float32),
                             adj=adj, wids=wids, sizes=sizes)

    def sample_trees(self, k: int, n: Optional[int] = None) -> List[SyntheticTree]:
        return [self.sample_tree(n) for _ in range(k)]
