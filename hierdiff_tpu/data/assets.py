"""Bundled data artifacts: fragment vocabulary, fingerprints, priors.

These mirror the reference's ``dataset/`` artifacts (vocab.txt,
vocab_blur_fps_updated.csv, atom_embed.csv, size_dict.pkl,
atom_embed_dict.pkl) and the GEOM node-count histogram
(endiffusion/conf/analyze/GEOM.yaml), converted to JSON/CSV by
``scripts/convert_reference_assets.py``.
"""

from __future__ import annotations

import json
from functools import lru_cache
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np

ASSET_DIR = Path(__file__).resolve().parent.parent / "assets"


@lru_cache(maxsize=None)
def load_vocab_smiles() -> Tuple[str, ...]:
    """779 fragment SMILES strings."""
    with open(ASSET_DIR / "vocab.txt") as f:
        return tuple(line.strip() for line in f if line.strip())


@lru_cache(maxsize=None)
def load_vocab_fps(mode: str = "prop") -> Dict[str, np.ndarray]:
    """Per-fragment fingerprint rows: smiles -> float vector.

    mode='prop': 5 property columns (col 3 = heavy-atom count, col 4
    continuous); mode='elem': 3-column element bag.
    """
    fname = "vocab_prop_fps.csv" if mode == "prop" else "vocab_elem_fps.csv"
    out: Dict[str, np.ndarray] = {}
    with open(ASSET_DIR / fname) as f:
        header = f.readline()
        for line in f:
            parts = line.rstrip("\n").split(",")
            out[parts[0]] = np.array([float(v) for v in parts[1:]], dtype=np.float64)
    return out


@lru_cache(maxsize=None)
def load_size_dict() -> Dict[int, List[int]]:
    """heavy-atom count -> allowed vocab indices (refine head support)."""
    with open(ASSET_DIR / "size_dict.json") as f:
        raw = json.load(f)
    return {int(k): v for k, v in raw.items()}


@lru_cache(maxsize=None)
def load_array_dict() -> Tuple[List[np.ndarray], List[List[int]]]:
    """(bucket feature arrays, allowed vocab indices per bucket) — the
    softmax-support restriction of the edge-denoise node head."""
    with open(ASSET_DIR / "array_dict.json") as f:
        raw = json.load(f)
    arrays = [np.asarray(a, dtype=np.float64) for a in raw["arrays"]]
    return arrays, raw["indices"]


@lru_cache(maxsize=None)
def load_geom_histogram() -> Dict[int, int]:
    """GEOM-Drugs fragment-count histogram (node-count prior)."""
    with open(ASSET_DIR / "geom_histogram.json") as f:
        raw = json.load(f)
    return {int(k): int(v) for k, v in raw.items()}


@lru_cache(maxsize=None)
def load_histogram(name: str = "geom") -> Dict[int, int]:
    """Named fragment-count histogram: 'geom' | 'crossdock' | 'qm9'."""
    with open(ASSET_DIR / f"{name}_histogram.json") as f:
        raw = json.load(f)
    return {int(k): int(v) for k, v in raw.items()}
