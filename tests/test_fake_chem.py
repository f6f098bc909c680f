"""Conformance tests for the RDKit-gated chemistry layer via fake_rdkit.

RDKit is uninstallable here; these tests execute every ``require_rdkit``
code path (VERDICT r2 item #1) against the deterministic stub in
tests/fake_rdkit.py: tree decomposition, MolTree-from-mol, attachment
enumeration, the geometry-scored reconstruction (incl. backtracking and the
'max9' sentinel), the process-pool batch reconstruction, the assembly gate
inside beam search, the pipeline's reconstruct=True branch, the MFF-RMSD
conformer lift, the eval panel, and preprocessing (.npz / GEOM pickles /
SDF). Reference behaviors matched are cited per test.
"""

import json
import os
import pickle
import random
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
import fake_rdkit

TEST_SMILES = [
    "CC(=O)NC1=CC=C(O)C=C1",
    "C1=CC=CC=C1CCNC(=O)C1CCCCC1",
    "OC1=CC=C(CN2CCOCC2)C=C1",
    "CC1=CC(=O)NC(C)=C1",
    "NC(=O)C1CCCN1CC1=CC=CS1",
    "ClC1=CC=C(C=C1)C(=O)NCCO",
]


REAL_BACKEND = os.environ.get("HIERDIFF_CHEM_BACKEND") == "real"


@pytest.fixture(scope="module")
def fake():
    """The chemistry backend for the conformance suite.

    Default: install the deterministic fake-RDKit stub. With
    ``HIERDIFF_CHEM_BACKEND=real`` (scripts/verify_chem.py) the suite runs
    against REAL RDKit instead — the first machine with RDKit certifies the
    whole chemistry layer in one command; tests marked ``fake_only`` (they
    poke stub internals) are skipped there by tests/conftest.py."""
    if REAL_BACKEND:
        import importlib.util
        if importlib.util.find_spec("rdkit") is None:
            pytest.skip("HIERDIFF_CHEM_BACKEND=real but rdkit is not installed")
        yield None
        return
    fake_rdkit.install()
    yield fake_rdkit
    fake_rdkit.uninstall()


@pytest.fixture(scope="module")
def chem_world(fake):
    """Embedded test mols + a fake-canon-consistent mini vocabulary."""
    from rdkit import Chem
    from rdkit.Chem import AllChem

    from hierdiff_tpu.chem.chemutils import (get_clique_mol, get_mol,
                                             get_smiles, tree_decomp)
    from hierdiff_tpu.chem.mol_tree import MolTree, Vocab

    mols = []
    for s in TEST_SMILES:
        m = get_mol(s)
        assert m is not None
        AllChem.EmbedMolecule(m)
        mols.append(m)
    frag = sorted({get_smiles(get_clique_mol(m, c))
                   for m in mols for c in tree_decomp(m)[0]})
    fp_table = {s: np.array([1.0, 2.0, 0.5,
                             float(Chem.MolFromSmiles(s).GetNumAtoms()), 0.3])
                for s in frag}
    vocab = Vocab(frag, fp_table, mode="prop")
    trees = [MolTree(m, vocab=vocab) for m in mols]
    return {"mols": mols, "vocab": vocab, "trees": trees, "frag": frag}


# --- SMILES engine sanity (the stub itself must be trustworthy) -----------


def test_real_vocab_parses_and_roundtrips(fake):
    """All 780 real vocabulary fragments parse and canonicalize stably."""
    from rdkit import Chem

    from hierdiff_tpu.data.assets import load_vocab_smiles

    for s in load_vocab_smiles():
        m = Chem.MolFromSmiles(s)
        assert m is not None, s
        can = Chem.MolToSmiles(m, kekuleSmiles=True)
        m2 = Chem.MolFromSmiles(can)
        assert m2 is not None, (s, can)
        assert Chem.MolToSmiles(m2, kekuleSmiles=True) == can, s


def test_fake_canon_injective_over_real_vocab(fake):
    """The fake canonicalizer maps the 780 REAL-RDKit canonical vocabulary
    fragments (hierdiff_tpu/assets vocab — the reference's dataset/vocab.txt,
    produced by get_smiles at /root/reference/data_utils/chemutils.py:24-25,
    i.e. genuine RDKit kekule-canonical output) to 780 DISTINCT strings.

    This is the load-bearing property of the harness: a collision would
    silently corrupt every Vocab.get_index/wid assignment the whole fine
    stage trains on (two different fragments sharing one wid)."""
    from rdkit import Chem

    from hierdiff_tpu.data.assets import load_vocab_smiles

    smiles = list(load_vocab_smiles())
    assert len(smiles) == 780 and len(set(smiles)) == 780
    canon = {}
    for s in smiles:
        m = Chem.MolFromSmiles(s)
        assert m is not None, s
        c = Chem.MolToSmiles(m, kekuleSmiles=True)
        assert c not in canon, f"fake-canon collision: {canon[c]!r} vs {s!r} -> {c!r}"
        canon[c] = s
    assert len(canon) == 780


def test_fake_canon_vocab_divergence_is_pure_atom_order(fake):
    """Anchor to real-RDKit ground truth: vocab entries are real-RDKit
    kekule-canonical strings, so they double as a golden set for the fake
    canonicalizer. Where fake-canon(s) != s, the divergence must be pure
    ATOM-ORDER choice — same molecular graph: equal (symbol, charge) atom
    multiset, equal bond-order multiset, and mutual substructure match at
    equal atom count (graph isomorphism under the fake's monomorphism
    matcher). The exact-string agreement subset is pinned so the
    canonicalizer cannot silently drift; full string equality for the rest
    would require reimplementing RDKit's Morgan canonical ranking, which is
    out of scope for the harness (ordering does not affect any consumer —
    Vocab lookups only need injectivity + stability, pinned above)."""
    from rdkit import Chem

    from hierdiff_tpu.data.assets import load_vocab_smiles

    def invariants(m):
        atoms = sorted((a.GetSymbol(), a.GetFormalCharge()) for a in m.GetAtoms())
        bonds = sorted(
            (min(m.GetAtomWithIdx(b.GetBeginAtomIdx()).GetSymbol(),
                 m.GetAtomWithIdx(b.GetEndAtomIdx()).GetSymbol()),
             max(m.GetAtomWithIdx(b.GetBeginAtomIdx()).GetSymbol(),
                 m.GetAtomWithIdx(b.GetEndAtomIdx()).GetSymbol()),
             float(b.GetBondTypeAsDouble())) for b in m.GetBonds())
        return atoms, bonds

    agree = 0
    for s in load_vocab_smiles():
        m = Chem.MolFromSmiles(s)
        c = Chem.MolToSmiles(m, kekuleSmiles=True)
        if c == s:
            agree += 1
            continue
        m2 = Chem.MolFromSmiles(c)
        assert m2 is not None, (s, c)
        assert m.GetNumAtoms() == m2.GetNumAtoms(), (s, c)
        assert invariants(m) == invariants(m2), (s, c)
        assert m.HasSubstructMatch(m2) and m2.HasSubstructMatch(m), (s, c)
    # pinned agreement subset: a canonicalizer change that moves this number
    # must be deliberate (update the pin with the reason in the commit)
    assert agree == 68, agree


@pytest.mark.fake_only
def test_canonicalization_permutation_invariant(fake):
    from rdkit import Chem

    from hierdiff_tpu.data.assets import load_vocab_smiles

    rng = np.random.default_rng(0)
    smiles = list(load_vocab_smiles())
    for s in [smiles[i] for i in rng.choice(len(smiles), 60, replace=False)]:
        m = Chem.MolFromSmiles(s)
        n = m.GetNumAtoms()
        if n < 2:
            continue
        perm = rng.permutation(n)
        inv = np.argsort(perm)
        rw = Chem.RWMol(Chem.MolFromSmiles(""))
        for i in perm:
            a = m.GetAtomWithIdx(int(i))
            na = Chem.Atom(a.GetSymbol())
            na.SetFormalCharge(a.GetFormalCharge())
            if a._explicit_hs is not None:
                na.SetNumExplicitHs(a._explicit_hs)
            rw.AddAtom(na)
        for b in m.GetBonds():
            rw.AddBond(int(inv[b.GetBeginAtomIdx()]),
                       int(inv[b.GetEndAtomIdx()]), b.GetBondType())
        assert Chem.MolToSmiles(m) == Chem.MolToSmiles(rw), s


def test_valence_rejection(fake):
    """Over-valent mols fail sanitization (pentavalent C, trivalent O)."""
    from rdkit import Chem

    assert Chem.MolFromSmiles("C(C)(C)(C)(C)C") is None
    assert Chem.MolFromSmiles("O(C)(C)C") is None
    assert Chem.MolFromSmiles("C(C)(C)(C)C") is not None


# --- chemutils: decomposition + enumeration (chemutils.py:76-338) ---------


def test_tree_decomp_invariants(chem_world):
    from hierdiff_tpu.chem.chemutils import tree_decomp

    for m in chem_world["mols"]:
        cliques, edges = tree_decomp(m)
        covered = set()
        for c in cliques:
            covered.update(c)
        assert covered == set(range(m.GetNumAtoms()))
        # spanning tree over the clique graph (single component here)
        assert len(edges) == len(cliques) - 1
        for c in cliques:
            assert len(c) in (1, 2) or len(c) >= 3  # bonds / rings / singletons


def test_moltree_from_mol(chem_world):
    """Root = clique containing atom 0 swapped to index 0; per-clique hbd.
    (reference: endiffusion/dataset/mol_tree.py:112-230)"""
    for m, t in zip(chem_world["mols"], chem_world["trees"]):
        assert 0 in t.nodes[0].clique
        assert t.adj_matrix.shape == (len(t.nodes), len(t.nodes))
        np.testing.assert_array_equal(t.adj_matrix, t.adj_matrix.T)
        for n in t.nodes:
            assert n.wid == chem_world["vocab"].get_index(n.smiles)
            assert np.asarray(n.pos).shape == (3,)
            assert n.hbd >= 0
        # hbd: paracetamol-like mol has N-H and O-H donors somewhere
    hbds = [n.hbd for n in chem_world["trees"][0].nodes]
    assert sum(hbds) >= 2


def test_enum_assemble_contains_true_attachment(chem_world):
    """The enumeration must produce the real local attachment among its
    candidates (chemutils.py:293-338)."""
    from rdkit import Chem

    from hierdiff_tpu.chem.chemutils import enum_assemble

    tree = chem_world["trees"][0]
    mol = chem_world["mols"][0]
    root = tree.nodes[0]
    neighbors = sorted([n for n in root.neighbors if n.mol.GetNumAtoms() > 1],
                       key=lambda x: x.mol.GetNumAtoms(), reverse=True)
    neighbors = [n for n in root.neighbors if n.mol.GetNumAtoms() == 1] + neighbors
    cands = enum_assemble(root, neighbors)
    assert len(cands) >= 1

    atoms = sorted(set(root.clique) | {a for n in neighbors for a in n.clique})
    want = Chem.MolFragmentToSmiles(mol, atoms, kekuleSmiles=True)
    want = Chem.MolToSmiles(Chem.MolFromSmiles(want))

    def strip(smi):
        m = Chem.MolFromSmiles(smi)
        for a in m.GetAtoms():
            a.SetAtomMapNum(0)
        return Chem.MolToSmiles(m)

    assert want in {strip(s) for s, _, _ in cands}


def test_can_assemble_positive_and_negative(chem_world):
    from hierdiff_tpu.chem.chemutils import can_assemble
    from hierdiff_tpu.chem.mol_tree import MolTreeNode

    vocab = chem_world["vocab"]
    t = chem_world["trees"][0]
    node = MolTreeNode(t.nodes[0].smiles, None, vocab=vocab)
    node.neighbors = [MolTreeNode(t.nodes[1].smiles, None, vocab=vocab)]
    assert can_assemble(node)

    # an O center (valence 2, both used by the bond fragment's H-free form)
    # cannot host 3 extra C-C bond neighbors
    center = MolTreeNode("O", None)
    center.neighbors = [MolTreeNode("CC", None) for _ in range(3)]
    assert not can_assemble(center)


def test_mol_equal_and_decode_stereo(fake):
    from hierdiff_tpu.chem.chemutils import decode_stereo, get_mol, mol_equal

    m1 = get_mol("CC(=O)NC1=CC=C(O)C=C1")
    m2 = get_mol("CC(=O)NC1=CC=C(O)C=C1")
    assert mol_equal(m1, m2)
    assert not mol_equal(m1, get_mol("CCO"))
    out = decode_stereo("CC(=O)NC1=CC=C(O)C=C1")
    assert len(out) == 1


# --- reconstruction (jtnn_vae.py:200-372, reconstruct.py:54-106) ----------


def test_reconstruct_success_and_determinism(chem_world):
    from rdkit import Chem

    from hierdiff_tpu.chem.reconstruct import TreeReconstructor

    rec = TreeReconstructor(chem_world["vocab"])
    tree = chem_world["trees"][0]
    out1 = rec.reconstruct(tree)
    out2 = rec.reconstruct(tree)
    assert isinstance(out1, tuple)
    mol, amap, smi_mol = out1
    assert Chem.MolToSmiles(smi_mol) == Chem.MolToSmiles(out2[2])
    assert mol.GetNumAtoms() >= max(len(n.clique) for n in tree.nodes)
    assert Chem.MolFromSmiles(Chem.MolToSmiles(smi_mol)) is not None
    # the amap covers every tree node (1-indexed by nid)
    assert len(amap) == len(tree.nodes) + 1


@pytest.mark.fake_only
def test_reconstruct_max9_on_embed_failure(chem_world, fake):
    """All-zero candidate scores -> 'max9' (jtnn_vae.py:311-330)."""
    from hierdiff_tpu.chem.reconstruct import TreeReconstructor

    rec = TreeReconstructor(chem_world["vocab"])
    fake.FAIL_EMBED = True
    try:
        assert rec.reconstruct(chem_world["trees"][0]) == "max9"
    finally:
        fake.FAIL_EMBED = False


def test_reconstruct_batch_pool_matches_serial(chem_world):
    """Process-pool reconstruction (fork inherits the stub) == serial; stats
    mirror the reference's printed validity/uniqueness/avg-atoms
    (reconstruct.py:101-104)."""
    from rdkit import Chem

    from hierdiff_tpu.chem.reconstruct import reconstruct_batch

    trees = chem_world["trees"]
    res_s, stats_s = reconstruct_batch(trees, chem_world["vocab"], n_workers=0)
    res_p, stats_p = reconstruct_batch(trees, chem_world["vocab"], n_workers=2)
    assert stats_s == stats_p
    assert stats_s["valid"] == 1.0
    assert 0.0 < stats_s["unique"] <= 1.0
    assert stats_s["avg_atoms"] > 3
    for (m1, _, s1), (m2, _, s2) in zip(res_s, res_p):
        assert Chem.MolToSmiles(s1) == Chem.MolToSmiles(s2)


@pytest.mark.fake_only
def test_reconstruct_batch_max9_excluded_from_attempted(chem_world, fake):
    from hierdiff_tpu.chem.reconstruct import reconstruct_batch

    fake.FAIL_EMBED = True
    try:
        res, stats = reconstruct_batch(chem_world["trees"][:2],
                                       chem_world["vocab"], n_workers=0)
    finally:
        fake.FAIL_EMBED = False
    assert res == []
    # max9 trees don't count as attempts (reconstruct.py:95-100)
    assert stats["valid"] == 0.0


def test_reconstruct_memoize_identical_and_hits(chem_world):
    """Opt-in memoization (ROADMAP #6): under a deterministic embedding
    backend the memoized reconstructor is bit-identical to the reference-
    exact path, and the enum/geometry caches actually hit on repeated
    fragments (within-tree backtracking + across trees)."""
    from rdkit import Chem

    from hierdiff_tpu.chem.reconstruct import TreeReconstructor

    plain = TreeReconstructor(chem_world["vocab"])
    memo = TreeReconstructor(chem_world["vocab"], memoize=True)
    for tree in chem_world["trees"]:
        o1, o2 = plain.reconstruct(tree), memo.reconstruct(tree)
        if isinstance(o1, tuple):
            assert isinstance(o2, tuple)
            assert Chem.MolToSmiles(o1[2]) == Chem.MolToSmiles(o2[2])
        else:
            assert o1 == o2
    # run the set again: every enum/geometry query must now hit the caches
    m0 = dict(memo.memo_stats)
    for tree in chem_world["trees"]:
        memo.reconstruct(tree)
    assert memo.memo_stats["enum_misses"] == m0["enum_misses"]
    assert memo.memo_stats["geom_misses"] == m0["geom_misses"]
    assert memo.memo_stats["enum_hits"] > m0["enum_hits"]
    assert memo.memo_stats["geom_hits"] > m0["geom_hits"]


def test_reconstruct_batch_memoize_matches(chem_world):
    from rdkit import Chem

    from hierdiff_tpu.chem.reconstruct import reconstruct_batch

    trees = chem_world["trees"]
    res_a, stats_a = reconstruct_batch(trees, chem_world["vocab"], n_workers=0)
    res_b, stats_b = reconstruct_batch(trees, chem_world["vocab"], n_workers=0,
                                       memoize=True)
    assert stats_a == stats_b
    for (_, _, s1), (_, _, s2) in zip(res_a, res_b):
        assert Chem.MolToSmiles(s1) == Chem.MolToSmiles(s2)


def test_get_similar_and_search_mcs(chem_world):
    from hierdiff_tpu.chem.reconstruct import get_similar, search_mcs
    from rdkit import Chem

    vocab = chem_world["vocab"]
    ring = next(s for s in chem_world["frag"]
                if Chem.MolFromSmiles(s).GetNumAtoms() >= 5)
    sim = get_similar(ring, vocab)
    assert all(vocab.mol_sizes[vocab.get_index(s)]
               == Chem.MolFromSmiles(ring).GetNumAtoms() for s in sim)
    idx = search_mcs(Chem.MolFromSmiles(ring), list(chem_world["frag"]))
    assert isinstance(idx, list)


def test_vocab_slots(chem_world):
    slots = chem_world["vocab"].get_slots(0)
    for sym, charge, hs in slots:
        assert isinstance(sym, str) and isinstance(charge, int) and hs >= 0


# --- assembly gate + pipeline reconstruct=True (the full stage 3) ---------


def test_assembly_gate_memoizes(chem_world):
    from hierdiff_tpu.chem.assemble_gate import make_assembly_gate
    from hierdiff_tpu.sampling.beam import TreeState

    vocab = chem_world["vocab"]
    gate = make_assembly_gate(vocab)
    n = 3
    adj = np.eye(n)
    adj[0, 1] = adj[1, 0] = 1
    state = TreeState(np.zeros((n, 8), np.float32),
                      np.zeros((n, 3), np.float32), adj,
                      np.array([0, 1, -1]))
    assert gate(state, 2)  # untyped passes trivially
    v1 = gate(state, 0)
    before = gate.cache_info().hits
    v2 = gate(state, 0)
    assert v1 == v2 and gate.cache_info().hits == before + 1


def test_pipeline_reconstruct_branch(chem_world, fake):
    """GenerationPipeline.run(reconstruct=True) end-to-end under the stub:
    coarse -> lattice beam search with the per-candidate + final assembly
    gates -> process-free reconstruction with stats.
    (reference chain: sampler.py -> ar_sampling_nosize.py -> reconstruct.py)
    """
    from hierdiff_tpu.chem.assemble_gate import make_assembly_gate
    from hierdiff_tpu.chem.mol_tree import Vocab
    from hierdiff_tpu.models.diffusion import CoarseDiffusion
    from hierdiff_tpu.models.edge_denoise import EdgeDenoise
    from hierdiff_tpu.sampling.pipeline import GenerationPipeline
    from hierdiff_tpu.data.synthetic import SyntheticTreeGenerator
    from hierdiff_tpu.data.denoise import make_denoise_batch

    vocab = Vocab()  # the REAL 780-fragment vocabulary, parsed by the stub
    coarse = CoarseDiffusion(hidden_nf=32, n_layers=1, timesteps=8)
    nm = jnp.ones((1, 4, 1))
    em = jnp.asarray((1 - np.eye(4))[None])
    batch = {"positions": jnp.zeros((1, 4, 3)),
             "node_feature": jnp.zeros((1, 4, 8)),
             "atom_mask": nm, "edge_mask": em}
    cparams = coarse.init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1),
                          train=True)

    denoise = EdgeDenoise(hidden_nf=32, n_layers_full=2, n_layers_focal=2)
    gen = SyntheticTreeGenerator(seed=0)
    dummy = {k: jnp.asarray(v) for k, v in
             make_denoise_batch(gen.sample_trees(2, n=5), random.Random(0),
                                max_n=8).items()}
    dparams = denoise.init(jax.random.PRNGKey(0), dummy)

    gate = make_assembly_gate(vocab)
    pipe = GenerationPipeline(coarse, cparams, denoise, dparams,
                              histogram={4: 1, 5: 1}, beam_size=3,
                              vocab=vocab, can_assemble=gate)
    result = pipe.run(jax.random.PRNGKey(7), 3, reconstruct=True)
    assert len(result.trees) == 3
    assembled = [t for t in result.trees if t is not None]
    assert result.stats is not None and "valid" in result.stats
    assert result.molecules is not None
    # every surviving tree passed the per-node gate; reconstruction ran
    assert len(result.molecules) <= len(assembled)
    if gate.cache_info is not None:
        assert gate.cache_info().currsize > 0  # the gate actually fired

    # streamed variant: same stages, stage-3 overlapped via a process pool
    # (map_async per macro-chunk); stats carry the same panel
    streamed = pipe.run_streamed(jax.random.PRNGKey(7), 3, chunk_size=2,
                                 n_workers=2, memoize=True)
    assert len(streamed.trees) == 3
    assert streamed.molecules is not None
    assert "valid" in streamed.stats and "t_device" in streamed.stats


# --- MFF-RMSD lift (eval/MFF_RMSD.py:62-187) ------------------------------


def test_set_rmsd_lift(chem_world):
    from hierdiff_tpu.chem.mff_rmsd import set_rmsd
    from hierdiff_tpu.chem.reconstruct import TreeReconstructor

    tree = chem_world["trees"][0]
    rec = TreeReconstructor(chem_world["vocab"])
    mol, amap, _ = rec.reconstruct(tree)
    lifted = set_rmsd(mol, amap[1: len(tree.nodes) + 1], tree)
    assert lifted is not None
    assert lifted.GetNumConformers() == 1
    pos = lifted.GetConformer().GetPositions()
    assert np.isfinite(pos).all()


def test_base_and_tree_rmsd(chem_world):
    from rdkit.Chem import AllChem

    from hierdiff_tpu.chem.chemutils import get_mol
    from hierdiff_tpu.chem.mff_rmsd import base_rmsd, mol_rmsd, tree_center_rmsd

    m = get_mol(TEST_SMILES[0])
    AllChem.EmbedMolecule(m)
    out = base_rmsd(m, chem_world["vocab"])
    assert out is not None and out["tree"] >= 0 and out["mol"] > 0
    assert mol_rmsd(m, m) == pytest.approx(0.0, abs=1e-9)
    assert tree_center_rmsd(m, m, chem_world["vocab"]) == pytest.approx(0.0, abs=1e-6)


# --- eval panel (eval/evaluation_method.py:40-217) ------------------------


def test_eval_panel(chem_world, tmp_path):
    from rdkit import Chem

    import hierdiff_tpu.eval.metrics as M

    mols = [Chem.MolFromSmiles(s) for s in TEST_SMILES]
    assert M.filter_rate(mols) == 1.0
    # charged mol fails the neutral filter (evaluation_method.py:56-59)
    charged = Chem.MolFromSmiles("C1CC[NH2+]CC1")
    assert not M.mol_passes_filters(charged)

    # SMARTS screens via set_filter_tables
    mcf = tmp_path / "mcf.csv"
    mcf.write_text("smarts\nNC=O\n")
    M.set_filter_tables(str(mcf))
    amide = Chem.MolFromSmiles("CC(=O)NC1=CC=C(O)C=C1")
    assert not M.mol_passes_filters(amide)  # has an N-C=O substructure
    M._FILTERS = None

    assert (M.cal_mw(mols) > 50).all()
    assert np.isfinite(M.cal_logp(mols)).all()
    assert (M.cal_num_rotatable_bonds(mols) >= 0).all()
    assert M.scaffold_entropy(mols) > 0
    sim, arg = M.max_sim_fp(mols[:3], mols[3:])
    assert ((0 <= sim) & (sim <= 1)).all()

    from rdkit.Chem import AllChem
    embedded = Chem.MolFromSmiles(TEST_SMILES[0])
    AllChem.EmbedMolecule(embedded)
    assert M.conformer_rmsd(embedded, num=4) > 0

    assert ((1 <= M.cal_sas(mols)) & (M.cal_sas(mols) <= 10)).all()
    assert ((0 <= M.cal_qed(mols)) & (M.cal_qed(mols) <= 1)).all()
    sizes, counts = M.cal_rings(mols)
    assert (counts >= 1).all()
    assert ((0 < M.hetero_atom_ratio(mols)) & (M.hetero_atom_ratio(mols) < 1)).all()
    assert ((0 <= M.ro5(mols)) & (M.ro5(mols) <= 5)).all()

    freq, fp_mean = M.node_freq(chem_world["mols"], chem_world["vocab"])
    assert freq.sum() == sum(len(t.nodes) for t in chem_world["trees"])
    assert fp_mean.shape == (5,)


# --- preprocessing (chem/preprocess.py; mol_tree.py:308-378) --------------


def test_featurize_and_npz(chem_world, tmp_path):
    from hierdiff_tpu.chem.preprocess import featurize_tree, mol_to_npz

    vocab = chem_world["vocab"]
    tree = chem_world["trees"][0]
    feats, pos, adj, wids, sizes = featurize_tree(tree, vocab)
    n = len(tree.nodes)
    assert feats.shape == (n, 8) and pos.shape == (n, 3)
    assert adj.shape == (n, n) and wids.shape == (n,) and sizes.shape == (n,)
    # layout: [hbd, fp0..fp4, tpsa/10, asa/10] (blur_utils.py:80-86)
    np.testing.assert_allclose(feats[:, 0], [nd.hbd for nd in tree.nodes])
    assert (feats[:, 6] >= 0).all() and (feats[:, 7] > 0).all()
    assert mol_to_npz(chem_world["mols"][0], vocab, tmp_path / "t.npz")
    data = np.load(tmp_path / "t.npz")
    assert set(data.files) == {"feats", "pos", "adj", "wids", "sizes"}


def test_process_geom_and_sdf(chem_world, tmp_path, monkeypatch):
    from rdkit import Chem

    import hierdiff_tpu.chem.preprocess as PP

    monkeypatch.setattr(PP, "Vocab", lambda: chem_world["vocab"])

    geom = tmp_path / "geom"
    geom.mkdir()
    for i, m in enumerate(chem_world["mols"][:3]):
        with open(geom / f"m{i}.pkl", "wb") as f:
            pickle.dump({"conformers": [{"rd_mol": m}]}, f)
    PP.process_geom(str(geom), str(tmp_path / "trees"))
    assert len(list((tmp_path / "trees").iterdir())) == 3

    sdf = tmp_path / "mols.sdf"
    with open(sdf, "w") as f:
        for m in chem_world["mols"][:3]:
            f.write(Chem.MolToMolBlock(m))
            f.write("$$$$\n")
    PP.main(["--sdf", str(sdf), "--out", str(tmp_path / "trees_sdf")])
    assert len(list((tmp_path / "trees_sdf").iterdir())) == 3


def test_eval_cli(chem_world, tmp_path):
    """The eval-panel CLI end-to-end over a generated-style payload."""
    from rdkit import Chem

    from hierdiff_tpu.eval.cli import main as eval_main

    mols = [Chem.MolFromSmiles(s) for s in TEST_SMILES]
    payload = {"molecules": [(m, [{}], m) for m in mols]}
    gen = tmp_path / "generated.pkl"
    with open(gen, "wb") as f:
        pickle.dump(payload, f)
    out = tmp_path / "metrics.json"
    eval_main([str(gen), "--ref", str(gen), "--out", str(out)])
    metrics = json.loads(out.read_text())
    assert metrics["n_molecules"] == len(TEST_SMILES)
    assert metrics["filter_pass_rate"] == 1.0
    assert 0 <= metrics["qed_mean"] <= 1
    assert "max_fp_similarity_mean" in metrics


@pytest.mark.slow
def test_eval_panel_scales_to_1k(chem_world, fake):
    """Eval-panel scale dry-run (VERDICT r3 next #9): the full panel +
    pairwise Morgan max-similarity over >=1.2k molecules completes with
    BOUNDED time and memory — max_sim_fp and mmd_rbf are chunked, so the
    first real 10k eval cannot hit an O(N^2)-memory surprise
    (reference pairwise paths: eval/evaluation_method.py:91-217)."""
    import resource
    import time

    from rdkit import Chem

    import hierdiff_tpu.eval.metrics as M
    from hierdiff_tpu.data.assets import load_vocab_smiles
    from hierdiff_tpu.eval.cli import evaluate

    smiles = list(load_vocab_smiles())
    rng = np.random.default_rng(0)
    mols = [Chem.MolFromSmiles(smiles[i])
            for i in rng.integers(0, len(smiles), 1200)]
    refs = [Chem.MolFromSmiles(smiles[i])
            for i in rng.integers(0, len(smiles), 1200)]
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    t0 = time.perf_counter()
    out = evaluate(mols, ref_mols=refs)
    # the panel dedups by canonical SMILES first (evaluation_method.py:33-38)
    n_uniq = len({Chem.MolToSmiles(m) for m in mols})
    assert out["n_molecules"] == n_uniq > 500
    assert "max_fp_similarity_mean" in out
    assert 0.0 <= out["max_fp_similarity_mean"] <= 1.0
    # most ref fragments have an identical counterpart -> max similarity ~1
    assert out["max_fp_similarity_mean"] > 0.8

    # the raw O(N^2) pairwise paths at full 1.2k x 1.2k (no dedup)
    sim_best, sim_arg = M.max_sim_fp(mols, refs, assume_clean=True)
    assert sim_best.shape == (1200,) and sim_best.min() >= 0.0
    dt = time.perf_counter() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    # time/memory pins (shared 1-core host: generous but O(N^2)-breaking)
    assert dt < 600, f"panel took {dt:.0f}s at 1.2k molecules"
    grew = (rss1 - rss0) / 1024  # MB (ru_maxrss is KB on linux)
    assert grew < 1500, f"panel peak RSS grew {grew:.0f} MB"

    # forced multi-block chunking == one-block result
    fb, fa = M.max_sim_fp(mols[:300], refs[:400], assume_clean=True, step=57)
    ob, oa = M.max_sim_fp(mols[:300], refs[:400], assume_clean=True)
    np.testing.assert_allclose(fb, ob, rtol=0)
    np.testing.assert_array_equal(fa, oa)

    # chunked mmd_rbf == dense definition on a small case, both block sizes
    x = rng.standard_normal((300, 4))
    y = rng.standard_normal((400, 4))
    d2xx = ((x[:, None] - x[None]) ** 2).sum(-1)
    d2yy = ((y[:, None] - y[None]) ** 2).sum(-1)
    d2xy = ((x[:, None] - y[None]) ** 2).sum(-1)
    want = (np.exp(-1.0 * d2xx).mean() + np.exp(-1.0 * d2yy).mean()
            - 2 * np.exp(-1.0 * d2xy).mean())
    np.testing.assert_allclose(M.mmd_rbf(x, y), want, rtol=1e-10)
    np.testing.assert_allclose(M.mmd_rbf(x, y, step=41), want, rtol=1e-10)
