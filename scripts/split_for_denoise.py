"""Filter preprocessed trees to the fine-stage training split.

Equivalent of the reference's standalone split tool
(/root/reference/dataset/split_for_denoise.py): a tree qualifies iff a DFS
from the root discovers every node — i.e. the junction tree is connected, so
the AR growth order (data/orders.py) covers it. Disconnected trees (bad
decompositions / multi-fragment mols) would silently truncate the denoise
targets.

Input: a directory of .npz trees (the chem/preprocess.py schema:
feats/pos/adj/wids/sizes). Output: a JSON list of the qualifying file names
(relative to the directory), consumed via ``train.data`` + this split file.

  python scripts/split_for_denoise.py --data-dir data/trees \
      --out data/denoise_split.json [--workers 12]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import argparse
import json
from multiprocessing import Pool
from pathlib import Path

import numpy as np


def check_file(path: str):
    """(qualifies, name): every tree node reachable by DFS from node 0."""
    from hierdiff_tpu.data.orders import get_dfs_order

    z = np.load(path)
    adj = z["adj"]
    n = adj.shape[0]
    graph = [list(np.nonzero(adj[i])[0]) for i in range(n)]
    order = get_dfs_order(graph, 0)["order"]
    return len(order) == n, Path(path).name


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", required=True)
    p.add_argument("--out", default="denoise_split.json")
    p.add_argument("--workers", type=int, default=12)
    args = p.parse_args()

    files = sorted(str(f) for f in Path(args.data_dir).glob("*.npz"))
    if not files:
        raise FileNotFoundError(f"no .npz trees under {args.data_dir}")
    if args.workers > 1:
        with Pool(args.workers) as pool:
            results = pool.map(check_file, files)
    else:
        results = [check_file(f) for f in files]

    keep = [name for ok, name in results if ok]
    Path(args.out).write_text(json.dumps(keep, indent=0))
    print(f"{len(keep)}/{len(files)} trees connected -> {args.out}")


if __name__ == "__main__":
    main()
