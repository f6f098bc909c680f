"""Chemistry-layer tests: geometry (pure numpy), vocab, gating, eval MMD."""

import numpy as np
import pytest

from hierdiff_tpu.chem import HAS_RDKIT, RDKitUnavailable
from hierdiff_tpu.chem.geometry import (apply_rigid, flexible_transform_3d,
                                        kabsch_rmsd, rigid_transform_3d)
from hierdiff_tpu.chem.mol_tree import Vocab
from hierdiff_tpu.eval.metrics import mmd_rbf


def random_rotation(seed):
    a = np.random.RandomState(seed).randn(3, 3)
    q, r = np.linalg.qr(a)
    q = q @ np.diag(np.sign(np.diag(r)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q


def test_kabsch_rmsd_zero_for_rigid_motion():
    x = np.random.RandomState(0).randn(10, 3)
    R = random_rotation(1)
    y = x @ R.T + np.array([1.0, -2.0, 0.5])
    assert kabsch_rmsd(x, y, translate=True) < 1e-8


def test_kabsch_rmsd_positive_for_noise():
    x = np.random.RandomState(0).randn(10, 3)
    y = x + np.random.RandomState(1).randn(10, 3) * 0.5
    assert kabsch_rmsd(x, y) > 0.1


def test_rigid_transform_recovers_motion():
    x = np.random.RandomState(2).randn(8, 3)
    R_true = random_rotation(3)
    t_true = np.array([0.3, 1.2, -0.7])
    y = x @ R_true.T + t_true
    R, t = rigid_transform_3d(x, y)
    np.testing.assert_allclose(apply_rigid(x, R, t), y, atol=1e-8)


def test_flexible_transform():
    x = np.random.RandomState(4).randn(6, 3)
    R_true = random_rotation(5)
    y = x @ R_true
    rot, (ca, cb) = flexible_transform_3d(x, y)
    np.testing.assert_allclose((x - ca) @ rot + cb, y, atol=1e-8)


def test_vocab_without_rdkit():
    v = Vocab()
    assert v.size() == 780
    smi = v.get_smiles(0)
    assert v.get_index(smi) == 0
    assert v.get_fp(smi).shape == (5,)
    # heavy-atom sizes from fingerprint column 3
    assert v.mol_sizes[0] == int(round(v.fps[0][3]))
    idx6 = v.get_size(6)
    assert all(v.mol_sizes[i] == 6 for i in idx6)


@pytest.mark.skipif(HAS_RDKIT, reason="only relevant without rdkit")
def test_rdkit_gating_raises_cleanly():
    from hierdiff_tpu.chem.chemutils import get_mol
    with pytest.raises(RDKitUnavailable):
        get_mol("CCO")


def test_mmd_rbf():
    x = np.random.RandomState(0).randn(200)
    y = np.random.RandomState(1).randn(200)
    z = np.random.RandomState(2).randn(200) + 3.0
    assert mmd_rbf(x, y) < 0.05
    assert mmd_rbf(x, z) > 0.5


def test_bfs_order_from_edges():
    from hierdiff_tpu.chem.mff_rmsd import bfs_order_from_edges
    adj = np.zeros((5, 5))
    for a, b in [(0, 2), (2, 1), (2, 3), (3, 4)]:
        adj[a, b] = adj[b, a] = 1
    order = bfs_order_from_edges(np.nonzero(adj), 5)
    assert order[0] == 0 and set(order) == set(range(5))
    # parent appears before child
    assert order.index(2) < order.index(1)
    assert order.index(3) < order.index(4)


def test_pocket_parser():
    from hierdiff_tpu.chem.pocket import pocket_from_text, collate_pockets

    pdb = "\n".join([
        "ATOM      1  N   ALA A   1      10.000  10.000  10.000  1.00  0.00           N",
        "ATOM      2  CA  ALA A   1      11.000  10.000  10.000  1.00  0.00           C",
        "ATOM      3  CA  GLY A   2      50.000  50.000  50.000  1.00  0.00           C",
        "ATOM      4  CB  TRP A   3      12.000  10.500  10.000  1.00  0.00           C",
        "ATOM      5  CA  TRP A   3      12.500  11.000  10.000  1.00  0.00           C",
    ])
    ligand = np.array([[10.5, 10.0, 10.0]])
    p = pocket_from_text(pdb, ligand, radius=6.0)
    # ALA (atoms within 6A) and TRP in; GLY (40A away) out
    assert p.residue_type == ["ALA", "TRP"]
    assert p.coord.shape == (2, 3)
    toks = p.residue_tokens()
    assert toks[0] == 1 and toks[1] == 18  # ALA=0+1, TRP=17+1

    batch = collate_pockets([p, pocket_from_text(pdb, np.array([[50.0, 50, 50]]))])
    assert batch["protein_feat"].shape[0] == 2
    assert batch["protein_feat_mask"][0].sum() == 2


def test_assembly_gate_memoizes(monkeypatch):
    """make_assembly_gate caches per (wid, sorted neighbor wids) and passes
    untyped/neighborless nodes without touching RDKit."""
    import numpy as np

    import hierdiff_tpu.chem.assemble_gate as ag
    import hierdiff_tpu.chem.chemutils as cu
    from hierdiff_tpu.chem.mol_tree import Vocab
    from hierdiff_tpu.sampling.beam import TreeState

    calls = []

    def fake_can_assemble(node, node_y=None):
        calls.append((node.smiles, tuple(n.smiles for n in node.neighbors)))
        return True

    monkeypatch.setattr(ag, "require_rdkit", lambda *a, **k: None)
    monkeypatch.setattr(cu, "can_assemble", fake_can_assemble)
    gate = ag.make_assembly_gate(Vocab())

    n = 4
    adj = np.zeros((n, n)); adj[0, 1] = adj[1, 0] = 1; adj[1, 2] = adj[2, 1] = 1
    state = TreeState(feats=np.zeros((n, 8), np.float32),
                      pos=np.zeros((n, 3), np.float32), adj=adj,
                      wids=np.array([5, 7, -1, -1], np.int64))

    assert gate(state, 2)          # untyped -> trivially True, no RDKit call
    assert gate(state, 3)          # isolated -> True
    assert not calls
    assert gate(state, 0)          # wid 5, neighbors (7,)
    assert len(calls) == 1
    assert gate(state, 0)          # memo hit
    assert len(calls) == 1
    assert gate(state, 1)          # wid 7, neighbors (5,) -> distinct key
    assert len(calls) == 2
    # same fragment/neighbor multiset on a DIFFERENT state -> memo hit
    state2 = TreeState(state.feats.copy(), state.pos.copy(), adj.copy(),
                       np.array([5, 7, -1, -1], np.int64), index=9)
    assert gate(state2, 0)
    assert len(calls) == 2
