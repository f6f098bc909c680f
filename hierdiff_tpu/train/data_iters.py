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


def coarse_iter(cfg: Config, pool, seed: int = 0) -> Iterator[Dict[str, np.ndarray]]:
    rng = random.Random(seed)
    groups = _group_by_bucket(pool, cfg.train.buckets)
    while True:
        bkt, trees = _sample_bucket_batch(groups, rng, cfg.train.batch_size)
        yield collate_coarse(trees, max_n=bkt)


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
