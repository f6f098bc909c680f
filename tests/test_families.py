"""Model-family configs: QM9 (elem), crossdock (pocket), GEOM (prop).

Each family YAML in configs/ must build a model, take a training step on the
matching synthetic data, and (coarse families) draw a sample — the end-to-end
smoke the reference runs per dataset config (endiffusion/conf/launch.yaml,
conf dataset/model pairs).
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hierdiff_tpu.config import load_config
from hierdiff_tpu.data.synthetic import SyntheticTreeGenerator
from hierdiff_tpu.train.cli import build_coarse
from hierdiff_tpu.train.data_iters import coarse_iter, load_tree_pool

CONFIGS = Path(__file__).parent.parent / "configs"

TINY = ["coarse.hidden_nf=32", "coarse.n_layers=2", "coarse.timesteps=10",
        "train.batch_size=4", "train.num_train_trees=16",
        "train.buckets=(8,)"]


def _one_step_and_sample(cfg):
    model, loss_fn = build_coarse(cfg)
    pool = [t for t in load_tree_pool(cfg, seed=0) if t.feats.shape[0] <= 8]
    assert pool, "synthetic pool produced no bucket-8 trees"
    assert pool[0].feats.shape[1] == cfg.coarse.in_node_nf
    it = coarse_iter(cfg, pool, seed=0)
    batch = {k: jnp.asarray(v) for k, v in next(it).items()}
    params = model.init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1),
                        train=True)
    loss, _ = loss_fn(params, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))

    from hierdiff_tpu.sampling.coarse import make_masks_for_counts, sample_coarse
    nm, em = make_masks_for_counts(np.array([4, 6]), 8)
    x, h = sample_coarse(model, params, jax.random.PRNGKey(3),
                         jnp.asarray(nm), jnp.asarray(em))
    assert x.shape == (2, 8, 3) and h.shape[-1] == cfg.coarse.in_node_nf
    assert np.isfinite(np.asarray(x)).all() and np.isfinite(np.asarray(h)).all()


def test_qm9_elem_family():
    cfg = load_config(CONFIGS / "coarse_qm9.yaml", TINY)
    assert cfg.coarse.node_coarse_type == "elem"
    assert (cfg.coarse.in_node_nf, cfg.coarse.int_nf, cfg.coarse.cont_nf) == (3, 3, 0)
    _one_step_and_sample(cfg)


def test_geom_prop_family():
    cfg = load_config(CONFIGS / "coarse_geom.yaml", TINY)
    assert (cfg.coarse.in_node_nf, cfg.coarse.int_nf, cfg.coarse.cont_nf) == (8, 5, 3)
    _one_step_and_sample(cfg)


def test_elem_synthetic_pool_statistics():
    gen = SyntheticTreeGenerator(seed=0, mode="elem", dataset="qm9")
    trees = gen.sample_trees(8)
    for t in trees:
        assert t.feats.shape[1] == 3
        # element-count fps are nonnegative integers; sizes = their row sums
        assert (t.feats >= 0).all()
        np.testing.assert_array_equal(t.sizes, t.feats.sum(axis=1).astype(np.int64))


def test_crossdock_pocket_family():
    """Pocket family: embedded residue tokens, frozen pocket coords."""
    cfg = load_config(CONFIGS / "coarse_crossdock.yaml", TINY)
    assert cfg.coarse.pocket
    model, loss_fn = build_coarse(cfg)
    b, n_mol, n_pocket = 2, 6, 4
    rng = np.random.default_rng(0)
    batch = {
        "positions": jnp.asarray(rng.standard_normal((b, n_mol, 3)).astype(np.float32)),
        "node_feature": jnp.asarray(rng.standard_normal((b, n_mol, 8)).astype(np.float32)),
        "atom_mask": jnp.ones((b, n_mol, 1), jnp.float32),
        "edge_mask": jnp.asarray((np.ones((n_mol, n_mol)) - np.eye(n_mol))[None].repeat(b, 0).astype(np.float32)),
        "protein_pos": jnp.asarray(rng.standard_normal((b, n_pocket, 3)).astype(np.float32)),
        "protein_feat": jnp.asarray(rng.integers(1, 21, (b, n_pocket))),
        "protein_feat_mask": jnp.ones((b, n_pocket, 1), jnp.float32),
        "protein_edge_mask": jnp.asarray((np.ones((n_pocket, n_pocket)) - np.eye(n_pocket))[None].repeat(b, 0).astype(np.float32)),
    }
    params = model.init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1),
                        train=True)
    loss, _ = loss_fn(params, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))


def test_split_for_denoise_filter(tmp_path):
    """Connected trees pass, disconnected are filtered, and the split file
    restricts load_tree_pool (reference dataset/split_for_denoise.py)."""
    import json
    import sys
    sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
    from split_for_denoise import check_file

    def save(name, adj):
        n = adj.shape[0]
        np.savez_compressed(
            tmp_path / name, adj=adj,
            feats=np.zeros((n, 8), np.float32), pos=np.zeros((n, 3), np.float32),
            wids=np.zeros(n, np.int64), sizes=np.ones(n, np.int64))

    chain = np.zeros((4, 4)); chain[0, 1] = chain[1, 0] = 1
    chain[1, 2] = chain[2, 1] = 1; chain[2, 3] = chain[3, 2] = 1
    save("good.npz", chain)
    broken = np.zeros((4, 4)); broken[0, 1] = broken[1, 0] = 1  # 2,3 orphaned
    save("bad.npz", broken)

    ok_good, _ = check_file(str(tmp_path / "good.npz"))
    ok_bad, _ = check_file(str(tmp_path / "bad.npz"))
    assert ok_good and not ok_bad

    split = tmp_path / "split.json"
    split.write_text(json.dumps(["good.npz"]))
    cfg = load_config(None, [f"train.data={tmp_path}",
                             f"train.data_split={split}"])
    pool = load_tree_pool(cfg)
    assert len(pool) == 1 and pool[0].feats.shape[0] == 4


def test_crossdock_pocket_cli_end_to_end(tmp_path):
    """Train the pocket family 3 steps through the real CLI (synthetic
    pockets attached by coarse_iter), then sample pocket-conditioned through
    cmd_coarse --pocket-pdb on a synthetic PDB."""
    import pickle

    from hierdiff_tpu.sampling import cli as scli
    from hierdiff_tpu.train import cli as tcli

    wd = tmp_path / "pocket_run"
    tcli.main(["coarse", "--config", str(CONFIGS / "coarse_crossdock.yaml"),
               f"train.workdir={wd}", "train.max_steps=3",
               "train.checkpoint_every=3", "train.eval_every=1000",
               "train.log_every=3", "coarse.hidden_nf=32", "coarse.n_layers=1",
               "coarse.timesteps=8", "train.batch_size=8",
               "train.num_train_trees=16", "train.buckets=(8,)"])

    pdb = tmp_path / "site.pdb"
    rows = []
    rng = np.random.default_rng(0)
    res = ["ALA", "GLY", "LYS", "TRP"]
    for i in range(4):
        x, y, z = rng.normal(scale=3.0, size=3)
        rows.append(f"ATOM  {i+1:5d}  CA  {res[i]} A{i+1:4d}    "
                    f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00           C")
    pdb.write_text("\n".join(rows) + "\n")

    out = tmp_path / "blur.pkl"
    scli.main(["coarse", "--workdir", str(wd), "--num", "4",
               "--batch-size", "4", "--max-nodes", "8",
               "--pocket-pdb", str(pdb), "--pocket-center", "0,0,0",
               "--pocket-radius", "12", "--out", str(out)])
    results = pickle.load(open(out, "rb"))[0]
    assert len(results) == 4
    for r in results:
        assert np.isfinite(r["x"]).all() and np.isfinite(r["h"]).all()
        assert r["h"].shape[1] == 8
