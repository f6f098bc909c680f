"""JT-VAE neural stack tests (models/jtnn.py).

The encoder's scan-form tree-GRU is validated against a direct torch
re-execution of the reference's message recursion (jtnn_enc.py:28-72 with
nnutils.GRU) on random trees — every directed edge message and the root
vector must match. Decoder/MPN get shape/finiteness/gradient/permutation
checks plus a learnability smoke.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hierdiff_tpu.models.jtnn import (JTNNDecoder, JTNNEncoder, MPN, JTMPN,
                                      build_trace, collate_traces)


def random_tree_adj(n, rng):
    adj = np.zeros((n, n), np.float32)
    for i in range(1, n):
        p = rng.integers(0, i)
        adj[i, p] = adj[p, i] = 1.0
    return adj


@pytest.fixture(scope="module")
def enc_setup():
    rng = np.random.default_rng(0)
    b, n, v, h = 3, 7, 50, 16
    adjs = [random_tree_adj(n, rng) for _ in range(b)]
    wids = rng.integers(0, v, size=(b, n))
    model = JTNNEncoder(vocab_size=v, hidden_size=h)
    nm = np.ones((b, n, 1), np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(wids),
                        jnp.asarray(np.stack(adjs)), jnp.asarray(nm))
    return model, params, adjs, wids, nm


def _torch_reference_messages(params, adj, wids, hidden):
    """Re-execute the reference's per-edge GRU recursion (jtnn_enc.py:28-72,
    nnutils.py:25-40) with numpy on one tree; returns h dict + root vec."""
    p = params["params"]
    emb = np.asarray(p["embedding"]["embedding"])
    gru = p["gru"]
    Wz_k, Wz_b = np.asarray(gru["W_z"]["kernel"]), np.asarray(gru["W_z"]["bias"])
    Wr_k = np.asarray(gru["W_r"]["kernel"])
    Ur_k, Ur_b = np.asarray(gru["U_r"]["kernel"]), np.asarray(gru["U_r"]["bias"])
    Wh_k, Wh_b = np.asarray(gru["W_h"]["kernel"]), np.asarray(gru["W_h"]["bias"])
    W_k, W_b = np.asarray(p["W"]["kernel"]), np.asarray(p["W"]["bias"])
    sig = lambda x: 1.0 / (1.0 + np.exp(-x))
    n = adj.shape[0]
    nei = [list(np.nonzero(adj[i])[0]) for i in range(n)]

    h = {}

    def msg(x, y):  # message x -> y
        if (x, y) in h:
            return h[(x, y)]
        xs = emb[wids[x]]
        hs = [msg(z, x) for z in nei[x] if z != y]
        sum_h = np.sum(hs, axis=0) if hs else np.zeros(hidden)
        z = sig(np.concatenate([xs, sum_h]) @ Wz_k + Wz_b)
        gated = [sig(xs @ Wr_k + hi @ Ur_k + Ur_b) * hi for hi in hs]
        sum_g = np.sum(gated, axis=0) if gated else np.zeros(hidden)
        pre = np.tanh(np.concatenate([xs, sum_g]) @ Wh_k + Wh_b)
        h[(x, y)] = (1.0 - z) * sum_h + z * pre
        return h[(x, y)]

    for x in range(n):
        for y in nei[x]:
            msg(x, y)
    root_in = np.sum([h[(y, 0)] for y in nei[0]], axis=0)
    root_vec = np.maximum(
        np.concatenate([emb[wids[0]], root_in]) @ W_k + W_b, 0.0)
    return h, root_vec


def test_encoder_matches_reference_recursion(enc_setup):
    model, params, adjs, wids, nm = enc_setup
    up, down, root_vecs = model.apply(params, jnp.asarray(wids),
                                      jnp.asarray(np.stack(adjs)),
                                      jnp.asarray(nm))
    up, down, root_vecs = map(np.asarray, (up, down, root_vecs))
    for bi, adj in enumerate(adjs):
        h_ref, root_ref = _torch_reference_messages(params, adj, wids[bi],
                                                    model.hidden_size)
        # parents from BFS at root 0
        from collections import deque
        parent = {0: -1}
        q = deque([0])
        while q:
            x = q.popleft()
            for y in np.nonzero(adj[x])[0]:
                if int(y) not in parent:
                    parent[int(y)] = x
                    q.append(int(y))
        for y, x in parent.items():
            if x < 0:
                continue
            np.testing.assert_allclose(up[bi, y], h_ref[(y, x)], atol=1e-5)
            np.testing.assert_allclose(down[bi, y], h_ref[(x, y)], atol=1e-5)
        np.testing.assert_allclose(root_vecs[bi], root_ref, atol=1e-5)


def test_encoder_padding_independence(enc_setup):
    model, params, adjs, wids, _ = enc_setup
    b, n = wids.shape
    pad = 4
    adj_p = np.zeros((b, n + pad, n + pad), np.float32)
    adj_p[:, :n, :n] = np.stack(adjs)
    wids_p = np.concatenate([wids, np.zeros((b, pad), wids.dtype)], axis=1)
    nm_p = np.zeros((b, n + pad, 1), np.float32)
    nm_p[:, :n] = 1.0
    up, down, rv = model.apply(params, jnp.asarray(wids),
                               jnp.asarray(np.stack(adjs)), jnp.ones((b, n, 1)))
    up_p, down_p, rv_p = model.apply(params, jnp.asarray(wids_p),
                                     jnp.asarray(adj_p), jnp.asarray(nm_p))
    np.testing.assert_allclose(np.asarray(rv), np.asarray(rv_p), atol=1e-5)
    np.testing.assert_allclose(np.asarray(up), np.asarray(up_p)[:, :n], atol=1e-5)
    np.testing.assert_allclose(np.asarray(down), np.asarray(down_p)[:, :n], atol=1e-5)


def test_decoder_forward_and_learnability():
    rng = np.random.default_rng(1)
    b, n, v, h, latent = 4, 6, 30, 16, 8
    adjs = [random_tree_adj(n, rng) for _ in range(b)]
    wids = jnp.asarray(rng.integers(0, v, size=(b, n)))
    nm = jnp.ones((b, n, 1))
    trace = {k: jnp.asarray(val) for k, val in collate_traces(adjs, n).items()}
    mol_vec = jnp.asarray(rng.standard_normal((b, latent)).astype(np.float32))
    model = JTNNDecoder(vocab_size=v, hidden_size=h, latent_size=latent)
    params = model.init(jax.random.PRNGKey(0), wids, nm, trace, mol_vec)
    out = model.apply(params, wids, nm, trace, mol_vec)
    assert np.isfinite(float(out["loss"]))
    assert 0.0 <= float(out["pred_acc"]) <= 1.0
    assert 0.0 <= float(out["stop_acc"]) <= 1.0
    # each tree edge is traced twice: total stop rows = 2(n-1)+1 per tree
    assert float(np.asarray(trace["active"]).sum()) == b * 2 * (n - 1)

    import optax
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        (l, out), g = jax.value_and_grad(
            lambda p: (lambda o: (o["loss"], o))(model.apply(p, wids, nm, trace, mol_vec)),
            has_aux=True)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, out

    for _ in range(120):
        params, opt, out = step(params, opt)
    # teacher forcing on a fixed tiny batch must be memorizable
    assert float(out["pred_acc"]) > 0.9
    assert float(out["stop_acc"]) > 0.9


def test_build_trace_structure():
    adj = random_tree_adj(5, np.random.default_rng(2))
    tr = build_trace(adj)
    assert len(tr) == 2 * 4
    fwd = [(x, y) for x, y, d in tr if d == 1]
    bwd = [(x, y) for x, y, d in tr if d == 0]
    assert sorted((min(e), max(e)) for e in fwd) == sorted((min(e), max(e)) for e in bwd)


def test_mpn_on_fake_mols():
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    import fake_rdkit
    fake_rdkit.install()
    try:
        from hierdiff_tpu.models.jtnn import mol2graph_dense

        smiles = ["CC(=O)NC1=CC=C(O)C=C1", "C1CCCCC1", "CCO"]
        graph = {k: jnp.asarray(v) for k, v in mol2graph_dense(smiles).items()}
        model = MPN(hidden_size=16, depth=3)
        params = model.init(jax.random.PRNGKey(0), graph)
        vecs = model.apply(params, graph)
        assert vecs.shape == (3, 16)
        assert np.isfinite(np.asarray(vecs)).all()

        # atom-permutation invariance of the molecule vector
        from rdkit import Chem
        m = Chem.MolFromSmiles(smiles[0])
        n = m.GetNumAtoms()
        perm = np.random.default_rng(0).permutation(n)
        inv = np.argsort(perm)
        rw = Chem.RWMol(Chem.MolFromSmiles(""))
        for i in perm:
            a = m.GetAtomWithIdx(int(i))
            na = Chem.Atom(a.GetSymbol())
            na.SetFormalCharge(a.GetFormalCharge())
            rw.AddAtom(na)
        for bd in m.GetBonds():
            rw.AddBond(int(inv[bd.GetBeginAtomIdx()]), int(inv[bd.GetEndAtomIdx()]),
                       bd.GetBondType())
        g2 = {k: jnp.asarray(v) for k, v in mol2graph_dense([m, rw]).items()}
        v2 = np.asarray(model.apply(params, g2))
        np.testing.assert_allclose(v2[0], v2[1], atol=1e-5)

        # JTMPN consumes an optional tree seed
        jt = JTMPN(hidden_size=16, depth=3)
        jparams = jt.init(jax.random.PRNGKey(1), graph)
        a = graph["fatoms"].shape[1]
        seed = jnp.zeros((3, a, a, 16))
        base = np.asarray(jt.apply(jparams, graph, seed))
        seeded = np.asarray(jt.apply(
            jparams, graph, seed.at[:, 0, 1, :].set(1.0)))
        assert np.isfinite(base).all()
        assert np.abs(base - seeded).max() > 1e-6  # the seed reaches the output
    finally:
        fake_rdkit.uninstall()
