"""Batch iterators for the three training stages.

Data sources: the synthetic GEOM-like generator (always available) or a
directory of preprocessed tree files produced by ``hierdiff_tpu.chem``'s
preprocessing CLI (same .npz schema as SyntheticTree fields). Batches use a
single static bucket per iterator step chosen from the tree sizes, so jit
caches stay warm (one compile per touched bucket).
"""

from __future__ import annotations

import random
from pathlib import Path
from typing import Dict, Iterator, List, Optional

import numpy as np

from hierdiff_tpu.config import Config
from hierdiff_tpu.data.collate import bucket_for, collate_coarse
from hierdiff_tpu.data.denoise import make_denoise_batch
from hierdiff_tpu.data.refine import make_refine_batch
from hierdiff_tpu.data.synthetic import SyntheticTree, SyntheticTreeGenerator


def load_tree_pool(cfg: Config, seed: int = 0) -> List[SyntheticTree]:
    """Synthetic pool, or .npz tree files from a preprocessing run."""
    src = cfg.train.data
    if src == "synthetic":
        gen = SyntheticTreeGenerator(seed=seed, mode=cfg.coarse.node_coarse_type,
                                     dataset=cfg.coarse.dataset)
        return gen.sample_trees(cfg.train.num_train_trees)
    names = None
    if cfg.train.data_split:
        import json
        names = set(json.loads(Path(cfg.train.data_split).read_text()))
    pool = []
    for p in sorted(Path(src).glob("*.npz")):
        if names is not None and p.name not in names:
            continue
        z = np.load(p)
        pool.append(SyntheticTree(feats=z["feats"], pos=z["pos"], adj=z["adj"],
                                  wids=z["wids"], sizes=z["sizes"]))
    if not pool:
        raise FileNotFoundError(f"no .npz trees under {src}")
    return pool


def _group_by_bucket(pool, buckets):
    groups: Dict[int, List] = {}
    dropped = 0
    for t in pool:
        if t.feats.shape[0] > max(buckets):
            dropped += 1
            continue
        groups.setdefault(bucket_for(t.feats.shape[0], buckets), []).append(t)
    if dropped:
        print(f"[data] dropped {dropped} trees larger than bucket {max(buckets)}")
    return groups


def _sample_bucket_batch(groups, rng: random.Random, batch_size: int):
    # sample a bucket proportional to its population, then a batch within it
    keys = list(groups.keys())
    weights = [len(groups[k]) for k in keys]
    bkt = rng.choices(keys, weights=weights)[0]
    trees = rng.choices(groups[bkt], k=batch_size)
    return bkt, trees


def synthetic_pockets(rng: np.random.Generator, positions: np.ndarray,
                      node_mask: np.ndarray, k: int = 16) -> Dict[str, np.ndarray]:
    """Random CA shells around each molecule: residue tokens 1..20 at
    pocket-like distances (4-8 A from a random molecule node). Stands in for
    crossdock pocket data so the pocket family trains without the dataset
    (same tensor schema as chem.pocket.collate_pockets)."""
    b, n = positions.shape[:2]
    counts = node_mask[..., 0].sum(axis=1).astype(np.int64)
    feat = rng.integers(1, 21, (b, k)).astype(np.int32)
    anchor_idx = rng.integers(0, np.maximum(counts, 1))[:, None]           # (B,1)
    anchors = np.take_along_axis(positions, anchor_idx[..., None], axis=1)  # (B,1,3)
    direction = rng.standard_normal((b, k, 3))
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True) + 1e-9
    radius = 4.0 + 4.0 * rng.random((b, k, 1))
    pos = (anchors + direction * radius).astype(np.float32)
    nm = np.ones((b, k, 1), np.float32)
    em = np.broadcast_to((1.0 - np.eye(k))[None], (b, k, k)).astype(np.float32)
    return {"protein_feat": feat, "protein_pos": pos,
            "protein_feat_mask": nm, "protein_edge_mask": em}


def coarse_iter(cfg: Config, pool, seed: int = 0) -> Iterator[Dict[str, np.ndarray]]:
    rng = random.Random(seed)
    np_rng = np.random.default_rng(seed)
    groups = _group_by_bucket(pool, cfg.train.buckets)
    while True:
        bkt, trees = _sample_bucket_batch(groups, rng, cfg.train.batch_size)
        batch = collate_coarse(trees, max_n=bkt)
        if cfg.coarse.pocket and "protein_pos" not in batch:
            batch.update(synthetic_pockets(np_rng, batch["positions"],
                                           batch["atom_mask"]))
        yield batch


def denoise_iter(cfg: Config, pool, seed: int = 0) -> Iterator[Dict[str, np.ndarray]]:
    rng = random.Random(seed)
    groups = _group_by_bucket(pool, cfg.train.buckets)
    use_array = not cfg.denoise.full_softmax
    while True:
        bkt, trees = _sample_bucket_batch(groups, rng, cfg.train.batch_size)
        yield make_denoise_batch(trees, rng, max_n=bkt, use_array_dict=use_array)


def refine_iter(cfg: Config, pool, seed: int = 0) -> Iterator[Dict[str, np.ndarray]]:
    rng = random.Random(seed)
    groups = _group_by_bucket(pool, cfg.train.buckets)
    while True:
        bkt, trees = _sample_bucket_batch(groups, rng, cfg.train.batch_size)
        yield make_refine_batch(trees, rng, max_n=bkt, vocab_size=cfg.refine.vocab_size)


def finite(it: Iterator, n: int) -> Iterator:
    for _ in range(n):
        yield next(it)


def prefetch_to_device(it: Iterator[Dict[str, np.ndarray]], size: int = 2,
                       sharding=None) -> Iterator[Dict]:
    """Double-buffered async host->device pipeline: a background thread runs
    the host collation AND the H2D transfer of the next ``size`` batches
    while the current jitted step executes — the TPU never waits on the
    Python data path (the reference used 16 DataLoader workers for the same
    reason, endiffusion/conf/dataset/geom_blur.yaml:16).

    ``sharding``: optional NamedSharding placing each batch directly in its
    data-parallel layout (then the train step's shard_batch is a no-op).
    """
    import queue
    import threading

    import jax
    import jax.numpy as jnp

    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()

    def put(v):
        if sharding is not None:
            return jax.device_put(v, sharding)
        return jnp.asarray(v)

    def worker():
        try:
            for batch in it:
                q.put({k: put(v) for k, v in batch.items()})
        finally:
            q.put(_END)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        b = q.get()
        if b is _END:
            return
        yield b
