"""Staged CLI workflow: coarse -> assemble -> reconstruct as separate
commands over pickle hand-offs — the reference's actual stage layout
(sampler.py -> ar_sampling_nosize.py -> reconstruct.py, readme.md:40-66),
vs the one-shot `generate`.
"""

import pickle
from pathlib import Path

import numpy as np
import pytest

CONFIGS = Path(__file__).parent.parent / "configs"


@pytest.fixture(scope="module")
def staged(tmp_path_factory):
    """Train tiny coarse+denoise workdirs through the real train CLI, then
    run `coarse` and `assemble` once; tests assert on the artifacts."""
    from hierdiff_tpu.sampling import cli as scli
    from hierdiff_tpu.train import cli as tcli

    root = tmp_path_factory.mktemp("staged")
    cwd = root / "coarse"
    tcli.main(["coarse", "--config", str(CONFIGS / "coarse_geom.yaml"),
               f"train.workdir={cwd}", "train.max_steps=2",
               "train.checkpoint_every=2", "train.eval_every=1000",
               "train.log_every=2", "coarse.hidden_nf=32", "coarse.n_layers=1",
               "coarse.timesteps=8",
               "train.batch_size=8", "train.num_train_trees=16",
               "train.buckets=(8,)"])
    dwd = root / "denoise"
    tcli.main(["denoise", "--config", str(CONFIGS / "denoise_geom.yaml"),
               f"train.workdir={dwd}", "train.max_steps=2",
               "train.checkpoint_every=2", "train.eval_every=1000",
               "train.log_every=2", "denoise.hidden_nf=32",
               "denoise.n_layers_full=1", "denoise.n_layers_focal=1",
               "train.batch_size=8", "train.num_train_trees=16",
               "train.buckets=(8,)"])

    blur_pkl = root / "blur.pkl"
    scli.main(["coarse", "--workdir", str(cwd), "--num", "2",
               "--batch-size", "2", "--max-nodes", "5", "--no-bf16",
               "--out", str(blur_pkl)])
    trees_pkl = root / "trees.pkl"
    scli.main(["assemble", "--coarse-pkl", str(blur_pkl),
               "--denoise-workdir", str(dwd), "--beam", "2",
               "--no-data-parallel", "--out", str(trees_pkl)])
    return blur_pkl, trees_pkl


def test_staged_coarse_assemble(staged):
    blur_pkl, trees_pkl = staged
    blur = pickle.load(open(blur_pkl, "rb"))[0]
    assert len(blur) == 2
    payload = pickle.load(open(trees_pkl, "rb"))
    trees = payload["trees"]
    assert len(trees) == 2
    ok = [t for t in trees if t is not None]
    assert ok, "no trees assembled"
    for t in ok:
        n = len(t["wids"])
        assert (np.asarray(t["wids"]) >= 0).all()
        assert t["adj"].shape == (n, n) and t["pos"].shape == (n, 3)


def test_reconstruct_requires_rdkit(tmp_path):
    from hierdiff_tpu.chem import RDKitUnavailable
    from hierdiff_tpu.sampling import cli as scli

    trees_pkl = tmp_path / "trees.pkl"
    trees_pkl.write_bytes(pickle.dumps({"trees": []}))
    with pytest.raises(RDKitUnavailable):
        scli.main(["reconstruct", "--trees-pkl", str(trees_pkl),
                   "--out", str(tmp_path / "mols.pkl")])


def test_reconstruct_under_fake_rdkit(staged, tmp_path):
    """The standalone reconstruct command executes end-to-end under the
    fake-RDKit conformance harness (stats + pickle written)."""
    import fake_rdkit

    from hierdiff_tpu.sampling import cli as scli

    _, trees_pkl = staged
    fake_rdkit.install()
    try:
        out = tmp_path / "mols.pkl"
        scli.main(["reconstruct", "--trees-pkl", str(trees_pkl),
                   "--workers", "0", "--out", str(out)])
        payload = pickle.load(open(out, "rb"))
        assert set(payload["stats"]) >= {"valid", "unique", "avg_atoms"}
        assert "molecules" in payload
    finally:
        fake_rdkit.uninstall()
