"""Host-only PQ beam-search benchmark: Python vs native (treekit).

Measures the beam search in isolation against synthetic precomputed
lattices at GEOM-histogram sizes — no device involved — reproducing the
BASELINE.md "Native host beam search" numbers. Prints one JSON line per
configuration.

  python scripts/host_search_bench.py [--num 2000] [--reject 0 0.2]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import argparse
import json
import random
import time

import numpy as np


def make_lattices(n_mol: int, k: int = 5, n_wids: int = 60, seed: int = 0):
    from hierdiff_tpu.data.assets import load_geom_histogram
    from hierdiff_tpu.sampling.lattice import MoleculeLattice

    h = load_geom_histogram()
    ns = np.array(sorted(h))
    ps = np.array([h[n] for n in ns], float)
    ps /= ps.sum()
    rng = np.random.default_rng(seed)
    sizes = rng.choice(ns, size=n_mol, p=ps).astype(int)
    lattices = {}
    for i, n in enumerate(sizes):
        lp = -rng.random((n, k)).astype(np.float32)
        lp.sort(axis=1)
        lp = lp[:, ::-1].copy()
        lattices[i] = MoleculeLattice(
            focal=np.maximum(0, np.arange(n) - 1).astype(np.int32),
            target=np.arange(n).astype(np.int32),
            attach=np.arange(n) > 0,
            top_wid=rng.integers(0, n_wids, (n, k)).astype(np.int64),
            top_logp=lp)
    return lattices, sizes


def make_gate(reject: float):
    """bench.py's synthetic gate (single source of the hash semantics)."""
    from bench import _synthetic_gate

    gate = _synthetic_gate(reject)
    return gate, gate.verdict


def run_python(lattices, sizes, beam, gate):
    from hierdiff_tpu.sampling.beam import PQBeamSearch, TreeState
    from hierdiff_tpu.sampling.lattice import LatticeExpander

    states = [TreeState(feats=np.zeros((int(n), 8), np.float32),
                        pos=np.zeros((int(n), 3), np.float32),
                        adj=np.zeros((int(n), int(n)), np.float32),
                        wids=np.full(int(n), -1, np.int64), index=i)
              for i, n in enumerate(sizes)]
    search = PQBeamSearch(LatticeExpander(lattices), beam_size=beam,
                          can_assemble=gate, rng=random.Random(2022))
    t0 = time.perf_counter()
    res = search.run(states)
    return time.perf_counter() - t0, sum(r is not None for r in res)


def run_native(lattices, sizes, beam, verdict):
    from hierdiff_tpu import runtime

    t0 = time.perf_counter()
    _, ok, _ = runtime.beam_search_lattice_native(
        lattices, sizes, beam, random.Random(2022), verdict=verdict)
    return time.perf_counter() - t0, int(ok.sum())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num", type=int, default=2000)
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--reject", type=float, nargs="*", default=[0.0, 0.2])
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    from hierdiff_tpu import runtime
    if not runtime.treekit_available():
        print(json.dumps({"error": "native treekit unavailable"}))
        return

    lattices, sizes = make_lattices(args.num)
    for reject in args.reject:
        # best-of-reps per CLAUDE.md: the shared host swings under
        # contention; the fastest rep is the uncontended cost
        t_py, t_nat = [], []
        for _ in range(args.reps):
            gate, verdict = (None, None) if reject <= 0 else make_gate(reject)
            tp, ok_py = run_python(lattices, sizes, args.beam, gate)
            if reject > 0:      # fresh gate so both arms start cold
                gate, verdict = make_gate(reject)
            tn, ok_nat = run_native(lattices, sizes, args.beam, verdict)
            assert ok_py == ok_nat, (ok_py, ok_nat)
            t_py.append(tp)
            t_nat.append(tn)
        print(json.dumps({
            "molecules": args.num, "beam": args.beam, "reject": reject,
            "reps": args.reps,
            "python_s": round(min(t_py), 3), "native_s": round(min(t_nat), 4),
            "speedup": round(min(t_py) / min(t_nat), 1),
            "assembled": ok_nat}), flush=True)


if __name__ == "__main__":
    main()
