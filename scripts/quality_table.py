"""Release-candidate quality table (VERDICT r4 #3): one 10k-molecule
generation from converged checkpoints, scored by the COMPLETE eval panel +
MFF-RMSD lift under the fake-RDKit harness.

Real RDKit/GEOM are absent from this environment (no pip network), so this
is the strongest quality evidence producible offline: the full reference
pipeline — coarse EDM sampling, beam-5 AR assembly with the check_tree
refine hook, real rejecting assembly gates, geometry-scored reconstruction
(`reconstruct.py:101-106`) — scored by the complete evaluation_method panel
(`eval/evaluation_method.py:45-217`) and the MFF lift (`eval/MFF_RMSD.py:131`)
over deterministic fake chemistry whose STRUCTURAL behavior (parsing,
valence, rings, canonical equality) is real (tests/fake_rdkit.py). It
doubles as the 10k eval-panel scale dry-run (VERDICT r4 weak #6): panel wall
time and peak memory are pinned in the output.

    python scripts/quality_table.py --coarse runs/coarse_long \
        --denoise runs/denoise_rc --refine runs/refine_rc \
        --num 10000 [--out runs/quality_10k.json] [--lift-sample 256]
"""

import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/hierdiff_tpu_xla"))

import argparse
import json
import pickle
import resource


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--coarse", required=True, help="coarse training workdir")
    p.add_argument("--denoise", required=True)
    p.add_argument("--refine", required=True)
    p.add_argument("--num", type=int, default=10000)
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--seed", type=int, default=2022)
    p.add_argument("--out", default="runs/quality_10k.json")
    p.add_argument("--pkl", default="runs/quality_10k.pkl",
                   help="generated payload (trees + molecules) cache; reused "
                        "if present so the panel can be re-run alone")
    p.add_argument("--lift-sample", type=int, default=256,
                   help="molecules to run the (per-molecule, host-heavy) "
                        "MFF-RMSD lift on")
    p.add_argument("--workers", type=int, default=0)
    args = p.parse_args()

    import fake_rdkit
    fake_rdkit.install()

    table = {"config": {"num": args.num, "beam": args.beam,
                        "seed": args.seed, "coarse": args.coarse,
                        "denoise": args.denoise, "refine": args.refine}}

    if Path(args.pkl).exists():
        print(f"reusing {args.pkl}")
        with open(args.pkl, "rb") as f:
            payload = pickle.load(f)
    else:
        from hierdiff_tpu.sampling import cli as scli

        t0 = time.perf_counter()
        gen_args = argparse.Namespace(
            workdir=args.coarse, denoise_workdir=args.denoise,
            refine_workdir=args.refine, num=args.num, beam=args.beam,
            max_nodes=0, workers=args.workers, seed=args.seed, pallas=False,
            bf16=True, fine_bf16=False, sample_steps=0, data_parallel=False,
            fine_buckets=False, default_buckets=False, out=args.pkl)
        scli.cmd_generate(gen_args)
        table["t_generate_s"] = round(time.perf_counter() - t0, 1)
        with open(args.pkl, "rb") as f:
            payload = pickle.load(f)

    trees = payload["trees"]
    mols_entries = payload["molecules"] or []
    stats = payload.get("stats") or {}
    mols = [m for m, _amap, _smi in mols_entries]
    smis = [smi for _m, _amap, smi in mols_entries]

    # --- reference acceptance stats (reconstruct.py:101-106)
    n_trees = sum(t is not None for t in trees)
    table["assembly_rate"] = round(n_trees / max(len(trees), 1), 4)
    table["validity"] = round(len(mols) / max(n_trees, 1), 4)
    table["uniqueness"] = round(len(set(smis)) / max(len(smis), 1), 4)
    from fake_rdkit import Chem  # noqa: F401  (harness is installed)
    import rdkit.Chem as C
    table["avg_atoms"] = round(float(
        sum(m.GetNumAtoms() for m in mols) / max(len(mols), 1)), 2)
    table.update({k: v for k, v in stats.items() if isinstance(v, (int, float))})

    # --- full evaluation panel (eval/evaluation_method.py:45-217)
    from hierdiff_tpu.eval.cli import evaluate

    t0 = time.perf_counter()
    table["panel"] = evaluate(mols)
    table["t_panel_s"] = round(time.perf_counter() - t0, 1)
    table["panel_peak_rss_mb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1)

    # --- per-channel blur distribution match (sample_quality.py semantics):
    # sampled coarse features vs the synthetic training pool
    import numpy as np

    from hierdiff_tpu.data.synthetic import SyntheticTreeGenerator
    from hierdiff_tpu.eval.metrics import mmd_rbf

    feats = [np.asarray(t["feats"]) for t in trees if t is not None]
    if feats:
        sampled = np.concatenate(feats)
        sampled = np.concatenate(
            [np.round(sampled[:, :5]), sampled[:, 5:]], axis=1)
        pool = SyntheticTreeGenerator(seed=0).sample_trees(512)
        train = np.concatenate([t.feats for t in pool])
        names = ["hbd", "fp0", "fp1", "fp2", "size", "fp4", "tpsa", "asa"]
        rng = np.random.default_rng(0)
        sub = sampled[rng.choice(len(sampled), min(4096, len(sampled)),
                                 replace=False)]
        table["blur_channels"] = {
            nm: {"train_mu": round(float(train[:, i].mean()), 3),
                 "sample_mu": round(float(sampled[:, i].mean()), 3),
                 "train_sd": round(float(train[:, i].std()), 3),
                 "sample_sd": round(float(sampled[:, i].std()), 3),
                 "mmd": round(float(mmd_rbf(sub[:, i:i + 1],
                                            train[:, i:i + 1])), 4)}
            for i, nm in enumerate(names)}

    # --- scaffold/fragment frequency vs the vocab (node_freq)
    from hierdiff_tpu.chem.mol_tree import Vocab
    from hierdiff_tpu.eval.metrics import node_freq

    vocab = Vocab()
    freq, _counts = node_freq(mols[: 2000], vocab)
    table["node_freq_top5"] = [
        {"smiles": vocab.get_smiles(i), "freq": round(float(freq[i]), 4)}
        for i in np.argsort(freq)[::-1][:5]]

    # --- MFF-RMSD lift on a subsample (eval/MFF_RMSD.py:131)
    from hierdiff_tpu.chem.mff_rmsd import set_rmsd

    t0 = time.perf_counter()
    rmsds, lifted, failed = [], 0, 0
    tree_by_idx = [t for t in trees if t is not None]
    for (m, amap, _smi), t in list(zip(mols_entries, tree_by_idx))[: args.lift_sample]:
        try:
            r = set_rmsd(m, amap, t)
            if r is not None:
                rmsds.append(float(r))
                lifted += 1
            else:
                failed += 1
        except Exception:
            failed += 1
    table["mff_lift"] = {
        "attempted": min(args.lift_sample, len(mols_entries)),
        "lifted": lifted, "failed": failed,
        "rmsd_mean": round(float(np.mean(rmsds)), 3) if rmsds else None,
        "rmsd_median": round(float(np.median(rmsds)), 3) if rmsds else None,
        "t_s": round(time.perf_counter() - t0, 1)}

    print(json.dumps(table, indent=2))
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(table, f, indent=2)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
