"""Fine-stage tests: graph ops, edge-denoise training/AR step, refine model."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hierdiff_tpu.data.denoise import make_denoise_batch
from hierdiff_tpu.data.orders import (bfs_layers_toward, dfs_bidirection,
                                      get_dfs_order, make_search_adjacencies)
from hierdiff_tpu.data.refine import make_refine_batch
from hierdiff_tpu.data.synthetic import SyntheticTreeGenerator
from hierdiff_tpu.models.edge_denoise import EdgeDenoise
from hierdiff_tpu.models.refine import NodeRefine
from hierdiff_tpu.ops.gcl import DenseEGCL
from hierdiff_tpu.ops.graph import bfs_depths, circle_mask, depth_layer_mask


# --- host order builders -------------------------------------------------


def chain_adj(n):
    adj = np.zeros((n, n))
    for i in range(n - 1):
        adj[i, i + 1] = adj[i + 1, i] = 1
    return adj


def test_dfs_order_chain():
    res = get_dfs_order([[1], [0, 2], [1]], 0)
    assert [o[0] for o in res["order"]] == [0, 1, 2]


def test_dfs_bidirection_root_step():
    adj = chain_adj(4)
    und, search, last = dfs_bidirection(adj, sampling=0)
    assert search == 0 and last == -1 and len(und) == 4


def test_search_adjacency_masks():
    adj = chain_adj(4)
    und, search, last = dfs_bidirection(adj, sampling=2)  # discover 0,1; search=2
    org, pad = make_search_adjacencies(adj, und, search, last)
    assert org[0, 1] == 1 and org[1, 0] == 1
    assert org[1, 2] == 0  # search node zeroed
    assert pad[last, search] == 1 and pad[search, last] == 1


def test_bfs_layers_toward_chain():
    adj = chain_adj(4)
    layers = bfs_layers_toward(adj, end=3)
    # deepest first: [(0,1)], [(1,2)], [(2,3)] — far -> near
    assert layers == [[(0, 1)], [(1, 2)], [(2, 3)]]


# --- device graph ops ----------------------------------------------------


def test_bfs_depths_matches_host():
    adj = np.zeros((1, 5, 5), np.float32)
    for i, j in [(0, 1), (1, 2), (1, 3), (3, 4)]:
        adj[0, i, j] = adj[0, j, i] = 1
    start = np.zeros((1, 5), np.float32)
    start[0, 2] = 1
    depth = np.asarray(bfs_depths(jnp.asarray(adj), jnp.asarray(start)))
    assert list(depth[0]) == [2, 1, 0, 2, 3]


def test_bfs_depths_empty_start():
    adj = jnp.asarray(chain_adj(4)[None].astype(np.float32))
    depth = bfs_depths(adj, jnp.zeros((1, 4)))
    assert np.all(np.asarray(depth) == -1)


def test_depth_layer_mask_directed():
    adj = jnp.asarray(chain_adj(3)[None].astype(np.float32))
    start = jnp.asarray(np.array([[0, 0, 1]], np.float32))
    depth = bfs_depths(adj, start)
    m1 = np.asarray(depth_layer_mask(adj, depth, jnp.int32(1)))
    assert m1[0, 1, 2] == 1 and m1[0, 2, 1] == 0  # far(1)->near(2) only
    m2 = np.asarray(depth_layer_mask(adj, depth, jnp.int32(2)))
    assert m2[0, 0, 1] == 1 and m2.sum() == 1


def test_gated_gcl_noop_on_empty_layer():
    model = DenseEGCL(hidden_nf=16, edges_in_d=1, gated=True)
    h = jnp.ones((2, 4, 16))
    x = jnp.ones((2, 4, 3))
    mask = jnp.zeros((2, 4, 4, 1))
    radial = jnp.zeros((2, 4, 4, 1))
    params = model.init(jax.random.PRNGKey(0), h, x, mask, edge_attr=radial)
    h2, x2 = model.apply(params, h, x, mask, edge_attr=radial)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h))
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x))


# --- edge denoise --------------------------------------------------------


@pytest.fixture(scope="module")
def gen():
    return SyntheticTreeGenerator(seed=0)


@pytest.fixture(scope="module")
def denoise_setup(gen):
    rng = random.Random(0)
    trees = gen.sample_trees(4, n=7)
    batch = {k: jnp.asarray(v) for k, v in make_denoise_batch(trees, rng, max_n=8).items()}
    model = EdgeDenoise(hidden_nf=32, n_layers_full=2, n_layers_focal=2)
    params = model.init(jax.random.PRNGKey(0), batch)
    return model, params, batch, trees


def test_denoise_forward_finite(denoise_setup):
    model, params, batch, _ = denoise_setup
    out = model.apply(params, batch)
    for k in ("total_loss", "focal_loss", "edge_loss", "node_loss"):
        assert np.isfinite(float(out[k])), k
    for k in ("focal_accuracy", "edge_accuracy", "node_accuracy"):
        assert 0.0 <= float(out[k]) <= 1.0, k


def test_denoise_grads_flow(denoise_setup):
    model, params, batch, _ = denoise_setup

    def loss(p):
        return model.apply(p, batch)["total_loss"]

    g = jax.grad(loss)(params)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_denoise_jit_compiles(denoise_setup):
    model, params, batch, _ = denoise_setup
    f = jax.jit(lambda p, b: model.apply(p, b)["total_loss"])
    v1 = float(f(params, batch))
    v2 = float(f(params, batch))
    assert np.isfinite(v1) and v1 == v2


def test_ar_step_root_and_attach(gen):
    """Drive two AR steps: root-type prediction, then an attachment."""
    model = EdgeDenoise(hidden_nf=32, n_layers_full=2, n_layers_focal=2)
    n, b = 6, 2
    trees = gen.sample_trees(b, n=n)
    feats = jnp.asarray(np.stack([t.feats for t in trees]))
    pos = jnp.asarray(np.stack([t.pos for t in trees]))
    node_mask = jnp.ones((b, n, 1))
    vocab_idx = jnp.full((b, n), 780, jnp.int32)
    discovered = jnp.zeros((b, n), jnp.int32)
    adj = jnp.zeros((b, n, n))

    dummy = {k: jnp.asarray(v) for k, v in make_denoise_batch(trees, random.Random(0), max_n=n).items()}
    params = model.init(jax.random.PRNGKey(0), dummy)

    step = jax.jit(lambda *a: model.apply(params, *a, method=EdgeDenoise.ar_step))

    # step 1: nothing discovered -> root step
    out = step(feats, discovered, vocab_idx, pos, adj, node_mask)
    assert np.all(np.asarray(out["focal"]) == -1)
    assert np.all(np.asarray(out["target"]) == 0)
    assert not np.any(np.asarray(out["did_attach"]))
    top_logp = np.asarray(out["top_logp"])
    top_wid = np.asarray(out["top_wid"])
    assert top_logp.shape == (b, 16) and top_wid.shape == (b, 16)
    assert np.all(np.diff(top_logp, axis=1) <= 1e-6)  # sorted descending
    assert np.all(top_logp <= 0) and np.all(top_wid >= 0) and np.all(top_wid < 780)

    # host marks the root discovered via the (0,0) marker
    adj = adj.at[:, 0, 0].set(1.0)
    discovered = discovered.at[:, 0].set(1)
    out2 = step(feats, discovered, vocab_idx, pos, adj, node_mask)
    assert np.all(np.asarray(out2["focal"]) == 0)       # only node 0 discovered
    assert np.all(np.asarray(out2["did_attach"]))
    tgt = np.asarray(out2["target"])
    assert np.all(tgt != 0)


# --- refine ---------------------------------------------------------------


def test_refine_forward_and_grads(gen):
    rng = random.Random(0)
    trees = gen.sample_trees(3, n=6)
    batch = {k: jnp.asarray(v) for k, v in make_refine_batch(trees, rng, max_n=8).items()}
    model = NodeRefine(hidden_size=32, n_layers=1)
    params = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(params, batch)
    assert np.isfinite(float(out["loss"]))
    assert 0.0 <= float(out["accuracy"]) <= 1.0

    g = jax.grad(lambda p: model.apply(p, batch)["loss"])(params)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_refine_check_logp(gen):
    trees = gen.sample_trees(2, n=5)
    rng = random.Random(1)
    batch = {k: jnp.asarray(v) for k, v in make_refine_batch(trees, rng, max_n=5).items()}
    model = NodeRefine(hidden_size=32, n_layers=1)
    params = model.init(jax.random.PRNGKey(0), batch)
    logp = model.apply(params, batch["feats"], batch["vocab"], batch["size"],
                       batch["pos"], batch["adj"], batch["node_mask"],
                       batch["predict_idx"], batch["val"], method=NodeRefine.check_logp)
    assert logp.shape == (2, 780)
    np.testing.assert_allclose(np.exp(np.asarray(logp)).sum(axis=1), 1.0, rtol=1e-4)


# --- AR beam search -------------------------------------------------------


def test_ar_sampler_end_to_end(gen):
    """Full beam-search assembly of synthetic blur sets (untrained model)."""
    from hierdiff_tpu.sampling.ar import ARSampler
    from hierdiff_tpu.data.denoise import make_denoise_batch

    model = EdgeDenoise(hidden_nf=32, n_layers_full=2, n_layers_focal=2)
    trees = gen.sample_trees(2, n=5)
    dummy = {k: jnp.asarray(v) for k, v in make_denoise_batch(trees, random.Random(0), max_n=8).items()}
    params = model.init(jax.random.PRNGKey(0), dummy)

    sampler = ARSampler(model, params, beam_size=3)
    blur = [{"x": t.pos, "h": t.feats} for t in gen.sample_trees(3, n=5)]
    results = sampler.sample(blur)
    assert len(results) == 3
    for r in results:
        assert r is not None, "beam search failed to complete a tree"
        assert np.all(r.wids >= 0) and np.all(r.wids < 780)
        # assembled adjacency is a connected tree over 5 nodes: 4 sym edges
        adj = r.adj.copy()
        np.fill_diagonal(adj, 0)
        assert adj.sum() == 2 * (r.n - 1), adj.sum()
        # connectivity via BFS
        seen = {0}
        frontier = [0]
        while frontier:
            cur = frontier.pop()
            for j in range(r.n):
                if adj[cur, j] and j not in seen:
                    seen.add(j)
                    frontier.append(j)
        assert len(seen) == r.n


def test_denoise_padding_independence(gen):
    """Same trees padded to different buckets give identical losses."""
    rng_a, rng_b = random.Random(7), random.Random(7)
    trees = gen.sample_trees(3, n=6)
    from hierdiff_tpu.data.denoise import make_denoise_batch
    b8 = {k: jnp.asarray(v) for k, v in
          make_denoise_batch(trees, rng_a, max_n=8, allow_native=False).items()}
    b16 = {k: jnp.asarray(v) for k, v in
           make_denoise_batch(trees, rng_b, max_n=16, allow_native=False).items()}
    model = EdgeDenoise(hidden_nf=32, n_layers_full=2, n_layers_focal=2)
    params = model.init(jax.random.PRNGKey(0), b8)
    o8 = model.apply(params, b8)
    o16 = model.apply(params, b16)
    for k in ("total_loss", "focal_loss", "edge_loss", "node_loss"):
        np.testing.assert_allclose(float(o8[k]), float(o16[k]), rtol=2e-3), k


def test_vocab_conditioning_mode(gen):
    """vocab_conditioning=True consumes real fragment ids (different loss)."""
    rng = random.Random(0)
    trees = gen.sample_trees(3, n=6)
    batch = {k: jnp.asarray(v) for k, v in make_denoise_batch(trees, rng, max_n=8).items()}
    m0 = EdgeDenoise(hidden_nf=32, n_layers_full=1, n_layers_focal=1)
    m1 = EdgeDenoise(hidden_nf=32, n_layers_full=1, n_layers_focal=1,
                     vocab_conditioning=True)
    params = m0.init(jax.random.PRNGKey(0), batch)
    l0 = float(m0.apply(params, batch)["total_loss"])
    l1 = float(m1.apply(params, batch)["total_loss"])
    assert np.isfinite(l0) and np.isfinite(l1) and abs(l0 - l1) > 1e-6


def test_refine_fleet_scoring_parity(gen):
    """The per-state device scorer (_score_states: on-device masked-node
    expansion + restricted softmax) matches the per-job host path
    (_score_nodes + _logps_from_logits) node-for-node — same logps (to f32
    softmax noise) and same top-1 proposals."""
    from hierdiff_tpu.data.refine import make_refine_batch
    from hierdiff_tpu.sampling.refine_hook import RefineHook
    from hierdiff_tpu.sampling.ar import TreeState
    from hierdiff_tpu.models.refine import NodeRefine
    from hierdiff_tpu.data.assets import load_vocab_fps, load_vocab_smiles
    from hierdiff_tpu.data.collate import bucket_for
    from hierdiff_tpu.sampling.lattice import _next_pow2

    model = NodeRefine(hidden_size=32, n_layers=1)
    trees = gen.sample_trees(3, n=6) + gen.sample_trees(1, n=4)
    batch = {k: jnp.asarray(v) for k, v in
             make_refine_batch(trees[:2], random.Random(0), max_n=8).items()}
    params = model.init(jax.random.PRNGKey(0), batch)
    vocab_sizes = np.array([int(round(load_vocab_fps()[s][3]))
                            for s in load_vocab_smiles()])
    hook = RefineHook(model, params, vocab_sizes)

    states = []
    rng = np.random.default_rng(7)
    for t in trees:
        adj = t.adj.astype(np.float32).copy()
        wids = t.wids.astype(np.int64).copy()
        # partially-assigned fleet member: some nodes still blur (-1)
        if len(states) == 1:
            wids[-2:] = -1
        states.append(TreeState(t.feats.astype(np.float32),
                                t.pos.astype(np.float32), adj, wids))

    nb = bucket_for(max(s.n for s in states))
    sp = _next_pow2(len(states))
    base = hook._pack_states(states, nb, sp)
    logp_m, top_m = hook._score_states(base, [s.wids for s in states], nb, sp)

    for row, s in enumerate(states):
        assigned = np.nonzero(s.wids >= 0)[0]
        want_lp, want_top = hook._node_logps(s, s.wids, assigned)
        got_lp = logp_m[row][assigned]
        got_top = top_m[row][assigned]
        np.testing.assert_allclose(got_lp, want_lp, rtol=2e-4, atol=2e-4)
        assert np.array_equal(got_top, want_top)


def test_refine_check_batch_single_pass_parity(gen):
    """check_batch's one-shot (state x candidate) scoring pass equals the
    sequential swap-attempt rounds: every candidate applies its swap to the
    state's ORIGINAL wids, so batching all attempts into one device call
    must produce identical accepted swaps, dlogps and changed flags."""
    from hierdiff_tpu.data.refine import make_refine_batch
    from hierdiff_tpu.sampling.refine_hook import RefineHook
    from hierdiff_tpu.sampling.ar import TreeState
    from hierdiff_tpu.models.refine import NodeRefine
    from hierdiff_tpu.data.assets import load_vocab_fps, load_vocab_smiles
    from hierdiff_tpu.data.collate import bucket_for
    from hierdiff_tpu.sampling.lattice import _next_pow2

    model = NodeRefine(hidden_size=32, n_layers=1)
    trees = gen.sample_trees(4, n=8)
    batch = {k: jnp.asarray(v) for k, v in
             make_refine_batch(trees[:2], random.Random(0), max_n=8).items()}
    params = model.init(jax.random.PRNGKey(0), batch)
    vocab_sizes = np.array([int(round(load_vocab_fps()[s][3]))
                            for s in load_vocab_smiles()])

    def golden_check_batch(hook, states):
        """Round-3 sequential swap-attempt rounds (pre-batching semantics)."""
        results = [(s, 0.0, False) for s in states]
        act = [si for si, s in enumerate(states)
               if np.sum(s.wids >= 0) * hook.check_frac > 1]
        if not act:
            return results
        nb = bucket_for(max(states[si].n for si in act))
        sp = _next_pow2(len(act))
        base = hook._pack_states([states[si] for si in act], nb, sp)
        logp_m, top_m = hook._score_states(
            base, [states[si].wids for si in act], nb, sp)
        pending = []
        for row, si in enumerate(act):
            s = states[si]
            assigned = np.nonzero(s.wids >= 0)[0]
            wids = s.wids.copy()
            logps = logp_m[row][assigned]
            top = top_m[row][assigned]
            total = logps.sum()
            order = np.argsort(logps)
            n_check = int(len(assigned) * hook.check_frac)
            cand = [(int(i), int(top[i])) for i in order[:n_check]
                    if i < len(assigned) * 0.5 and top[i] != wids[assigned[i]]]
            if cand:
                pending.append([row, si, assigned, wids, total, cand])
        while pending:
            wids_rows = [states[si].wids for si in act]
            swaps = []
            for ent in pending:
                row, si, assigned, wids, total, cand = ent
                pos, new_wid = cand[0]
                new_wids = wids.copy()
                new_wids[int(assigned[pos])] = new_wid
                wids_rows[row] = new_wids
                swaps.append(new_wids)
            logp_m, _ = hook._score_states(base, wids_rows, nb, sp)
            nxt = []
            for ent, new_wids in zip(pending, swaps):
                row, si, assigned, wids, total, cand = ent
                pos, new_wid = cand.pop(0)
                node = int(assigned[pos])
                new_total = logp_m[row][assigned].sum()
                ok = new_total > total
                if ok:
                    perturbed = states[si].clone()
                    perturbed.wids = new_wids
                    if hook.can_assemble is not None and not hook.can_assemble(perturbed, node):
                        ok = False
                    else:
                        results[si] = (perturbed, float(total - new_total), True)
                if not ok and cand:
                    nxt.append([row, si, assigned, wids, total, cand])
            pending = nxt
        return results

    def mk_states():
        out = []
        for t in trees:
            adj = t.adj.astype(np.float32).copy()
            out.append(TreeState(t.feats.astype(np.float32),
                                 t.pos.astype(np.float32), adj,
                                 t.wids.astype(np.int64).copy()))
        return out

    # a pure (state, node) gate exercises the walk-past-rejected path the
    # same way in both implementations (call ORDER differs between them, so
    # the gate must be stateless)
    for gate in (None, lambda s, node: (int(s.wids[node]) + node) % 2 == 0):
        hook = RefineHook(model, params, vocab_sizes, check_frac=0.9,
                          can_assemble=gate)
        got = hook.check_batch(mk_states())
        hook2 = RefineHook(model, params, vocab_sizes, check_frac=0.9,
                           can_assemble=gate)
        want = golden_check_batch(hook2, mk_states())
        assert len(got) == len(want)
        changed_any = False
        for (gs, gd, gc), (ws, wd, wc) in zip(got, want):
            assert gc == wc
            changed_any = changed_any or gc
            np.testing.assert_allclose(gd, wd, rtol=1e-4, atol=1e-5)
            assert np.array_equal(gs.wids, ws.wids)
        if gate is None:
            assert changed_any  # untrained model at check_frac=0.9 must swap


def test_refine_hook_and_finalize(gen):
    """RefineHook: batched check_state + finalize repair semantics."""
    from hierdiff_tpu.data.refine import make_refine_batch
    from hierdiff_tpu.sampling.refine_hook import RefineHook
    from hierdiff_tpu.sampling.ar import TreeState
    from hierdiff_tpu.models.refine import NodeRefine
    from hierdiff_tpu.data.assets import load_vocab_fps, load_vocab_smiles

    model = NodeRefine(hidden_size=32, n_layers=1)
    trees = gen.sample_trees(2, n=6)
    batch = {k: jnp.asarray(v) for k, v in make_refine_batch(trees, random.Random(0), max_n=8).items()}
    params = model.init(jax.random.PRNGKey(0), batch)
    vocab_sizes = np.array([int(round(load_vocab_fps()[s][3])) for s in load_vocab_smiles()])
    hook = RefineHook(model, params, vocab_sizes, check_frac=0.5)

    t = trees[0]
    adj = t.adj.astype(np.float32).copy()
    adj[0, 0] = 1.0
    state = TreeState(t.feats.astype(np.float32), t.pos.astype(np.float32),
                      adj, t.wids.astype(np.int64))
    new_state, dlogp, changed = hook.check_state(state)
    assert isinstance(changed, bool)
    assert np.isfinite(dlogp)
    # hook as a fleet callable keeps list shape
    out = hook([state, state.clone()])
    assert len(out) == 2

    # finalize: no can_assemble gate -> identity
    assert hook.finalize(state) is state

    # finalize with a gate that breaks one node, fixable by any swap
    calls = {"n": 0}
    def gate(s, node):
        calls["n"] += 1
        # node 0 with its original wid is "broken"; anything else fine
        return not (node == 0 and s.wids[0] == t.wids[0])
    hook2 = RefineHook(model, params, vocab_sizes, can_assemble=gate)
    fixed = hook2.finalize(state, check_num=30)
    if fixed is not None:
        assert fixed.wids[0] != t.wids[0]
    # a mostly-broken tree is rejected
    hook3 = RefineHook(model, params, vocab_sizes, can_assemble=lambda s, n_: False)
    assert hook3.finalize(state) is None


def test_dynamic_depth_lattice_parity():
    """dynamic_depth=True (while_loop bounded by actual max depth) equals the
    static N-step scan bit-for-bit under gated=True — out-of-range depth
    iterations are exact no-ops (recv gate 0)."""
    gen = SyntheticTreeGenerator(seed=5)
    trees = gen.sample_trees(4, n=10)
    b, nb = len(trees), 16
    feats = np.zeros((b, nb, 8), np.float32)
    pos = np.zeros((b, nb, 3), np.float32)
    nmask = np.zeros((b, nb, 1), np.float32)
    for i, t in enumerate(trees):
        n = t.feats.shape[0]
        feats[i, :n], pos[i, :n], nmask[i, :n] = t.feats, t.pos, 1.0

    static = EdgeDenoise(hidden_nf=32, n_layers_full=1, n_layers_focal=1)
    dynamic = static.clone(dynamic_depth=True)
    rng = random.Random(0)
    dummy = {k: jnp.asarray(v) for k, v in
             make_denoise_batch(gen.sample_trees(2, n=6), rng, max_n=8).items()}
    params = jax.jit(static.init)(jax.random.PRNGKey(0), dummy)

    args = (jnp.asarray(feats), jnp.asarray(pos), jnp.asarray(nmask))
    out_s = static.apply(params, *args, method=EdgeDenoise.ar_lattice)
    out_d = dynamic.apply(params, *args, method=EdgeDenoise.ar_lattice)
    for k in out_s:
        np.testing.assert_allclose(np.asarray(out_s[k]), np.asarray(out_d[k]),
                                   rtol=0, atol=1e-6, err_msg=k)


def test_refine_dynamic_depth_parity():
    """NodeRefine dynamic_depth equals the static phase scans bit-for-bit
    (gated=True): including the reversed phase whose active iterations sit
    at the END of the concat order."""
    from hierdiff_tpu.data.refine import make_refine_batch
    from hierdiff_tpu.models.refine import NodeRefine

    gen = SyntheticTreeGenerator(seed=7)
    rng = random.Random(0)
    batch = {k: jnp.asarray(v) for k, v in
             make_refine_batch(gen.sample_trees(4, n=10), rng, max_n=12).items()}
    static = NodeRefine(hidden_size=32, n_layers=2)
    dynamic = static.clone(dynamic_depth=True)
    params = jax.jit(static.init)(jax.random.PRNGKey(0), batch)
    out_s = static.apply(params, batch)
    out_d = dynamic.apply(params, batch)
    for k in out_s:
        np.testing.assert_allclose(np.asarray(out_s[k]), np.asarray(out_d[k]),
                                   rtol=0, atol=1e-6, err_msg=k)


def test_fine_bf16_compute_dtype(denoise_setup, gen):
    """compute_dtype='bfloat16' (inference option) runs the dense GCL
    pipelines in bf16 with f32 accumulation: same params, outputs close to
    f32, and the lattice trajectory's type choices mostly agree (same lever
    as the coarse stage's bf16 path, BASELINE.md)."""
    model, params, batch, _ = denoise_setup
    bf16 = model.clone(compute_dtype="bfloat16")
    out32 = model.apply(params, batch)
    out16 = bf16.apply(params, batch)
    # losses track within bf16 noise (the heads/state stay f32)
    assert float(out16["total_loss"]) == pytest.approx(
        float(out32["total_loss"]), rel=0.05)

    trees = gen.sample_trees(2, n=6)
    feats = jnp.asarray(np.stack([t.feats for t in trees]))
    pos = jnp.asarray(np.stack([t.pos for t in trees]))
    nmask = jnp.ones((2, 6, 1))
    lat32 = model.apply(params, feats, pos, nmask, method=EdgeDenoise.ar_lattice)
    lat16 = bf16.apply(params, feats, pos, nmask, method=EdgeDenoise.ar_lattice)
    # identical trajectory structure; top-1 types agree at nearly every step
    np.testing.assert_array_equal(np.asarray(lat32["target"]), np.asarray(lat16["target"]))
    top32 = np.asarray(lat32["top_wid"])[..., 0]
    top16 = np.asarray(lat16["top_wid"])[..., 0]
    assert (top32 == top16).mean() >= 0.8


def test_refine_hook_bucket_pad_invariance(gen):
    """Fleet scoring must not depend on the pad bucket: n=10 states scored
    at bucket 12 (SAMPLING_BUCKETS) equal bucket 16 (DEFAULT_BUCKETS)
    node-for-node — masked padding contributes exact zeros."""
    import random as _random

    from hierdiff_tpu.data.assets import load_vocab_fps, load_vocab_smiles
    from hierdiff_tpu.data.refine import make_refine_batch
    from hierdiff_tpu.models.refine import NodeRefine
    from hierdiff_tpu.sampling.ar import TreeState
    from hierdiff_tpu.sampling.lattice import _next_pow2
    from hierdiff_tpu.sampling.refine_hook import RefineHook

    model = NodeRefine(hidden_size=32, n_layers=1)
    trees = gen.sample_trees(3, n=10)
    batch = {k: jnp.asarray(v) for k, v in
             make_refine_batch(trees[:2], _random.Random(0), max_n=12).items()}
    params = model.init(jax.random.PRNGKey(0), batch)
    vocab_sizes = np.array([int(round(load_vocab_fps()[s][3]))
                            for s in load_vocab_smiles()])
    states = [TreeState(t.feats.astype(np.float32), t.pos.astype(np.float32),
                        t.adj.astype(np.float32), t.wids.astype(np.int64))
              for t in trees]
    sp = _next_pow2(len(states))
    out = {}
    for nb in (12, 16):
        hook = RefineHook(model, params, vocab_sizes, buckets=(nb,))
        base = hook._pack_states(states, nb, sp)
        out[nb] = hook._score_states(base, [s.wids for s in states], nb, sp)
    for row, s in enumerate(states):
        a = np.nonzero(s.wids >= 0)[0]
        np.testing.assert_allclose(out[12][0][row][a], out[16][0][row][a],
                                   rtol=1e-5, atol=1e-5)
        assert np.array_equal(out[12][1][row][a], out[16][1][row][a])


def test_refine_pipelined_matches_sequential_groups(gen, monkeypatch):
    """The pipelined refine-on orchestrator (_sample_refine_pipelined) is
    bit-exact vs running each molecule group's search SEQUENTIALLY with the
    same per-group rng seeds — pipelining changes only which fused dispatch
    is in flight, never the execution order within a group."""
    import random as _random

    # pin the PYTHON pipelined path (the native C++ search has its own
    # bit-parity pin, tests/test_runtime.py test_native_refine_search_parity)
    monkeypatch.setenv("HIERDIFF_REFINE_NATIVE", "0")

    from hierdiff_tpu.data.assets import load_vocab_fps, load_vocab_smiles
    from hierdiff_tpu.data.collate import bucket_for
    from hierdiff_tpu.sampling.beam import PQBeamSearch
    from hierdiff_tpu.sampling.lattice import LatticeExpander, LatticeSampler
    from hierdiff_tpu.sampling.refine_hook import RefineHook

    dmodel = EdgeDenoise(hidden_nf=32, n_layers_full=1, n_layers_focal=1)
    dbatch = {k: jnp.asarray(v) for k, v in
              make_denoise_batch(gen.sample_trees(2, n=6), random.Random(0),
                                 max_n=8).items()}
    dparams = jax.jit(dmodel.init)(jax.random.PRNGKey(0), dbatch)
    rmodel = NodeRefine(hidden_size=32, n_layers=1)
    rbatch = {k: jnp.asarray(v) for k, v in
              make_refine_batch(gen.sample_trees(2, n=6), random.Random(1),
                                max_n=8).items()}
    rparams = jax.jit(rmodel.init)(jax.random.PRNGKey(1), rbatch)
    vocab_sizes = np.array([int(round(load_vocab_fps()[s][3]))
                            for s in load_vocab_smiles()])

    trees = gen.sample_trees(5, n=6) + gen.sample_trees(4, n=10)
    blur = [{"x": t.pos, "h": t.feats} for t in trees]

    cap = 3
    hook = RefineHook(rmodel, rparams, vocab_sizes, check_frac=0.5)
    sampler = LatticeSampler(dmodel, dparams, beam_size=2, refine_hook=hook,
                             rng=_random.Random(7), refine_group_cap=cap)
    got = sampler.sample(blur)

    # sequential reference: same grouping + same per-group seeds, each
    # group's search run to completion before the next starts
    lattices = LatticeSampler(dmodel, dparams, beam_size=2).compute_lattices(blur)
    from hierdiff_tpu.sampling.lattice import _group_seed
    seed_base = _random.Random(7).getrandbits(64)
    by_bucket = {}
    for idx, jt in enumerate(blur):
        by_bucket.setdefault(
            bucket_for(jt["h"].shape[0], sampler.buckets), []).append(idx)
    want = [None] * len(blur)
    hook2 = RefineHook(rmodel, rparams, vocab_sizes, check_frac=0.5)
    for nb, idxs in sorted(by_bucket.items()):
        for c0 in range(0, len(idxs), cap):
            members = idxs[c0: c0 + cap]
            search = PQBeamSearch(LatticeExpander(lattices), beam_size=2,
                                  refine_hook=hook2,
                                  rng=_random.Random(_group_seed(seed_base,
                                                                 members)))
            res = search.run(LatticeSampler._init_states(blur, members))
            for i, r in zip(members, res):
                want[i] = r

    assert any(r is not None for r in want)
    for a, b in zip(got, want):
        assert (a is None) == (b is None)
        if a is None:
            continue
        np.testing.assert_array_equal(a.wids, b.wids)
        np.testing.assert_array_equal(a.adj, b.adj)
        assert a.logp == pytest.approx(b.logp, rel=1e-6)


def test_refine_merge_matches_unmerged(gen):
    """Lane merging (refine_merge>1) concatenates SAME-bucket fleets into
    one fused dispatch per round. The fused check is row-independent and a
    lane never straddles pad buckets, so results must match merge=1
    exactly — merging may only change device batching, never semantics."""
    import random as _random

    from hierdiff_tpu.data.assets import load_vocab_fps, load_vocab_smiles
    from hierdiff_tpu.sampling.lattice import LatticeSampler
    from hierdiff_tpu.sampling.refine_hook import RefineHook

    dmodel = EdgeDenoise(hidden_nf=32, n_layers_full=1, n_layers_focal=1)
    dbatch = {k: jnp.asarray(v) for k, v in
              make_denoise_batch(gen.sample_trees(2, n=6), random.Random(0),
                                 max_n=8).items()}
    dparams = jax.jit(dmodel.init)(jax.random.PRNGKey(0), dbatch)
    rmodel = NodeRefine(hidden_size=32, n_layers=1)
    rbatch = {k: jnp.asarray(v) for k, v in
              make_refine_batch(gen.sample_trees(2, n=6), random.Random(1),
                                max_n=8).items()}
    rparams = jax.jit(rmodel.init)(jax.random.PRNGKey(1), rbatch)
    vocab_sizes = np.array([int(round(load_vocab_fps()[s][3]))
                            for s in load_vocab_smiles()])

    # 16 molecules over two buckets -> 8 groups at cap 2; merge=4 bundles
    # them into same-bucket lanes (the >=4-lanes floor allows merge 2 here,
    # still exercising multi-group dispatch vs merge=1). Gated like the
    # reference (rejections drive beam backtracking, so lane merging must
    # also preserve the gated walk).
    from bench import _synthetic_gate
    gate = _synthetic_gate(0.2)

    trees = gen.sample_trees(9, n=6) + gen.sample_trees(7, n=10)
    blur = [{"x": t.pos, "h": t.feats} for t in trees]

    out = {}
    for merge in (1, 4):
        hook = RefineHook(rmodel, rparams, vocab_sizes, check_frac=0.5)
        sampler = LatticeSampler(dmodel, dparams, beam_size=2,
                                 refine_hook=hook, rng=_random.Random(7),
                                 can_assemble=gate,
                                 refine_group_cap=2, refine_merge=merge)
        out[merge] = sampler.sample(blur)

    assert any(r is not None for r in out[1])
    for a, b in zip(out[4], out[1]):
        assert (a is None) == (b is None)
        if a is None:
            continue
        np.testing.assert_array_equal(a.wids, b.wids)
        np.testing.assert_array_equal(a.adj, b.adj)
        assert a.logp == pytest.approx(b.logp, rel=1e-6)
