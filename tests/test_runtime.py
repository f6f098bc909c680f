"""Native treekit (runtime/treekit.cpp) parity vs the Python host builders.

Round-1 blind spot (VERDICT): the native packer had zero test coverage and a
divergent undiscovered-mask convention. These tests pin the contract:
``dfs_bidirection_native`` must equal ``data.orders.dfs_bidirection`` for
EVERY DFS step index, and the batch/fleet packers must produce exactly what
the Python collators produce.
"""

import numpy as np
import pytest

from hierdiff_tpu import runtime
from hierdiff_tpu.data.orders import (dfs_bidirection, get_dfs_order,
                                      adj_to_graph, make_search_adjacencies)
from hierdiff_tpu.data.synthetic import SyntheticTreeGenerator

pytestmark = pytest.mark.skipif(not runtime.treekit_available(),
                                reason="native treekit unavailable (no toolchain)")


@pytest.fixture(scope="module")
def trees():
    gen = SyntheticTreeGenerator(seed=3)
    return gen.sample_trees(4, n=6) + gen.sample_trees(3, n=9)


def test_dfs_bidirection_native_matches_python_every_step(trees):
    for t in trees:
        n_steps = len(get_dfs_order(adj_to_graph(t.adj), 0)["order"])
        assert n_steps == t.adj.shape[0]
        for k in range(n_steps):
            und_py, s_py, l_py = dfs_bidirection(t.adj, sampling=k)
            umask, s_nat, l_nat = runtime.dfs_bidirection_native(
                t.adj, seed=0, sample_idx=k)
            assert (s_nat, l_nat) == (s_py, l_py), (k, s_nat, s_py, l_nat, l_py)
            np.testing.assert_array_equal(
                np.sort(np.nonzero(umask)[0]), np.sort(np.asarray(und_py)),
                err_msg=f"step {k}")


def test_make_search_adj_native_matches_python(trees):
    for t in trees:
        for k in range(1, t.adj.shape[0]):
            und, s, l = dfs_bidirection(t.adj, sampling=k)
            org_py, pad_py = make_search_adjacencies(t.adj, und, s, l)
            umask, s_nat, l_nat = runtime.dfs_bidirection_native(
                t.adj, seed=0, sample_idx=k)
            org_nat, pad_nat = runtime.make_search_adj_native(
                t.adj, umask, s_nat, l_nat)
            np.testing.assert_array_equal(org_nat, org_py.astype(np.float32))
            np.testing.assert_array_equal(pad_nat, pad_py.astype(np.float32))


def test_pack_denoise_batch_fields_self_consistent(trees):
    """Every field of the native batch must equal the Python collator's
    output reconstructed from the native batch's own DFS choice."""
    max_n = 9
    out = runtime.pack_denoise_batch_native(trees, max_n=max_n, seed=1234)
    for i, t in enumerate(trees):
        n = t.adj.shape[0]
        s = int(out["predict_idx"][i])
        l = int(out["last_ind"][i])
        und = np.nonzero(out["undiscovered"][i, :n])[0].tolist()
        assert s in und, "batch undiscovered channel must include the search node"
        org, pad = make_search_adjacencies(t.adj, und, s, l)
        np.testing.assert_array_equal(out["search_adj"][i, :n, :n],
                                      org.astype(np.float32))
        discover = (org.sum(1) > 0)
        val_miss = (t.adj - org).sum(1) != 0
        np.testing.assert_array_equal(out["discovered"][i, :n],
                                      discover.astype(np.int32))
        np.testing.assert_array_equal(out["focal_label"][i, :n],
                                      (discover & val_miss).astype(np.float32))
        exp_vocab = np.where(out["undiscovered"][i, :n] > 0, 780, t.wids[:n])
        np.testing.assert_array_equal(out["vocab_idx"][i, :n], exp_vocab)
        assert out["label"][i] == t.wids[s]
        np.testing.assert_array_equal(out["feats"][i, :n], t.feats.astype(np.float32))
        np.testing.assert_array_equal(out["pos"][i, :n], t.pos.astype(np.float32))
        assert out["node_mask"][i, :n].sum() == n
        assert out["node_mask"][i, n:].sum() == 0
        np.testing.assert_array_equal(out["edge_mask"][i, :n, :n],
                                      (1 - np.eye(n)).astype(np.float32))
        # root-step invariant: no focal candidates, everything undiscovered
        if l < 0:
            assert out["search_adj"][i].sum() == 0
            assert out["undiscovered"][i, :n].sum() == n


def test_pack_ar_fleet_matches_python(trees):
    from hierdiff_tpu.sampling.beam import TreeState

    states = []
    for i, t in enumerate(trees[:3]):
        n = t.adj.shape[0]
        wids = np.full(n, -1, np.int64)
        wids[: n // 2] = t.wids[: n // 2]
        adj = np.zeros((n, n), np.float32)
        adj[0, 0] = 1.0  # root marker convention
        states.append(TreeState(t.feats.astype(np.float32),
                                t.pos.astype(np.float32), adj, wids, index=i))
    nb = 9
    feats, pos, adj, vocab, disc, nmask = runtime.pack_ar_fleet_native(states, nb)
    for i, s in enumerate(states):
        k = s.n
        np.testing.assert_array_equal(feats[i, :k], s.feats)
        np.testing.assert_array_equal(pos[i, :k], s.pos)
        np.testing.assert_array_equal(adj[i, :k, :k], s.adj)
        assigned = s.wids >= 0
        np.testing.assert_array_equal(
            vocab[i, :k], np.where(assigned, s.wids, 780).astype(np.int32))
        np.testing.assert_array_equal(disc[i, :k], assigned.astype(np.int32))
        assert nmask[i, :k].sum() == k and nmask[i, k:].sum() == 0


def _random_lattices(m, k=5, seed=3, max_n=24):
    from hierdiff_tpu.sampling.lattice import MoleculeLattice

    rng = np.random.default_rng(seed)
    sizes = np.concatenate([[1, 2], rng.integers(3, max_n, m - 2)]).astype(int)
    lattices = {}
    for i, n in enumerate(sizes):
        lp = -rng.random((n, k)).astype(np.float32)
        lp.sort(axis=1)
        lp = lp[:, ::-1].copy()
        mask = rng.random((n, k)) < 0.15   # restricted-support holes
        mask[:, 0] = False
        lp[mask] = -1e9
        lattices[i] = MoleculeLattice(
            focal=np.maximum(0, np.arange(n) - 1).astype(np.int32),
            target=np.arange(n).astype(np.int32),
            attach=np.arange(n) > 0,
            top_wid=rng.integers(0, 780, (n, k)).astype(np.int64),
            top_logp=lp)
    return lattices, sizes


@pytest.mark.skipif(not runtime.treekit_available(), reason="no native lib")
def test_native_beam_search_bit_exact_vs_python():
    """tk_beam_search_lattice == PQBeamSearch bit-for-bit: wids, logp (to
    the last IEEE bit — same double accumulation order), ok flags, AND the
    Mersenne tiebreak stream (both rngs land in the identical state)."""
    import random

    from hierdiff_tpu.sampling.beam import PQBeamSearch, TreeState
    from hierdiff_tpu.sampling.lattice import LatticeExpander

    lattices, sizes = _random_lattices(60)
    states = [TreeState(feats=np.zeros((int(n), 8), np.float32),
                        pos=np.zeros((int(n), 3), np.float32),
                        adj=np.zeros((int(n), int(n)), np.float32),
                        wids=np.full(int(n), -1, np.int64), index=i)
              for i, n in enumerate(sizes)]
    r_py = random.Random(2022)
    res_py = PQBeamSearch(LatticeExpander(lattices), beam_size=5,
                          rng=r_py).run(states)
    r_nat = random.Random(2022)
    wids, ok, logp = runtime.beam_search_lattice_native(lattices, sizes, 5, r_nat)
    for i in range(len(sizes)):
        if res_py[i] is None:
            assert not ok[i]
            continue
        assert ok[i]
        np.testing.assert_array_equal(res_py[i].wids, wids[i])
        assert res_py[i].logp == logp[i]           # exact, not approx
    assert r_py.getstate() == r_nat.getstate()


@pytest.mark.skipif(not runtime.treekit_available(), reason="no native lib")
def test_lattice_sampler_native_matches_python_path():
    """LatticeSampler with native_search on/off returns identical trees
    (wids, adj, logp) through the full sample() entry point."""
    import random

    import jax
    import jax.numpy as jnp

    from hierdiff_tpu.data.denoise import make_denoise_batch
    from hierdiff_tpu.models.edge_denoise import EdgeDenoise
    from hierdiff_tpu.sampling.lattice import LatticeSampler

    gen = SyntheticTreeGenerator(seed=0)
    model = EdgeDenoise(hidden_nf=32, n_layers_full=1, n_layers_focal=1)
    dummy = {k: jnp.asarray(v) for k, v in
             make_denoise_batch(gen.sample_trees(2, n=6),
                                random.Random(0), max_n=8).items()}
    params = model.init(jax.random.PRNGKey(0), dummy)
    blur = [{"x": t.pos, "h": t.feats} for t in gen.sample_trees(5, n=6)]
    res_nat = LatticeSampler(model, params, beam_size=3,
                             rng=random.Random(7)).sample(blur)
    res_py = LatticeSampler(model, params, beam_size=3, rng=random.Random(7),
                            native_search=False).sample(blur)
    for a, b in zip(res_nat, res_py):
        assert (a is None) == (b is None)
        if a is None:
            continue
        np.testing.assert_array_equal(a.wids, b.wids)
        np.testing.assert_array_equal(a.adj, b.adj)
        assert a.logp == b.logp
        assert a.last_edge == b.last_edge


@pytest.mark.skipif(not runtime.treekit_available(), reason="no native lib")
def test_native_beam_search_dead_end_parity():
    """A step whose candidates are ALL outside the restricted support
    dead-ends every branch: both implementations must fail that molecule
    identically (None/ok=0), keep succeeding on the others, and consume
    the same rng draws."""
    import random

    from hierdiff_tpu.sampling.beam import PQBeamSearch, TreeState
    from hierdiff_tpu.sampling.lattice import LatticeExpander

    lattices, sizes = _random_lattices(12, seed=9)
    # kill molecule 5 at its middle step
    lat = lattices[5]
    lat.top_logp[lat.top_logp.shape[0] // 2, :] = -1e9
    states = [TreeState(feats=np.zeros((int(n), 8), np.float32),
                        pos=np.zeros((int(n), 3), np.float32),
                        adj=np.zeros((int(n), int(n)), np.float32),
                        wids=np.full(int(n), -1, np.int64), index=i)
              for i, n in enumerate(sizes)]
    r_py = random.Random(11)
    res_py = PQBeamSearch(LatticeExpander(lattices), beam_size=5,
                          rng=r_py).run(states)
    r_nat = random.Random(11)
    wids, ok, logp = runtime.beam_search_lattice_native(lattices, sizes, 5, r_nat)
    assert res_py[5] is None and not ok[5]
    for i in range(len(sizes)):
        if res_py[i] is None:
            assert not ok[i]
            continue
        assert ok[i]
        np.testing.assert_array_equal(res_py[i].wids, wids[i])
        assert res_py[i].logp == logp[i]
    assert r_py.getstate() == r_nat.getstate()


@pytest.mark.skipif(not runtime.treekit_available(), reason="no native lib")
@pytest.mark.parametrize("retry", [True, False])
def test_native_gated_beam_search_bit_exact(retry):
    """The gated native search (verdict callback) == the Python search with
    the equivalent can_assemble gate: same accepted/failed molecules, same
    wids/logp to the bit, same rng stream — under 25% rejection, both
    retry_final_gate modes."""
    import random
    import zlib

    from hierdiff_tpu.sampling.beam import PQBeamSearch, TreeState
    from hierdiff_tpu.sampling.lattice import LatticeExpander

    lattices, sizes = _random_lattices(80, seed=5)

    def verdict(wid, neis):
        h = zlib.crc32(repr((int(wid), tuple(neis))).encode()) / 0xFFFFFFFF
        return h >= 0.25

    def gate(state, i):
        wid = int(state.wids[i])
        if wid < 0:
            return True
        row = np.nonzero(state.adj[i])[0]
        neis = tuple(sorted(int(state.wids[j]) for j in row
                            if j != i and int(state.wids[j]) >= 0))
        return True if not neis else verdict(wid, neis)

    states = [TreeState(feats=np.zeros((int(n), 8), np.float32),
                        pos=np.zeros((int(n), 3), np.float32),
                        adj=np.zeros((int(n), int(n)), np.float32),
                        wids=np.full(int(n), -1, np.int64), index=i)
              for i, n in enumerate(sizes)]
    r_py = random.Random(2022)
    res_py = PQBeamSearch(LatticeExpander(lattices), beam_size=5, rng=r_py,
                          can_assemble=gate,
                          retry_final_gate=retry).run(states)
    r_nat = random.Random(2022)
    wids, ok, logp = runtime.beam_search_lattice_native(
        lattices, sizes, 5, r_nat, verdict=verdict, retry_final_gate=retry)
    n_fail = sum(r is None for r in res_py)
    assert n_fail > 0, "rejection rate too low to exercise the gate"
    for i in range(len(sizes)):
        if res_py[i] is None:
            assert not ok[i]
            continue
        assert ok[i]
        np.testing.assert_array_equal(res_py[i].wids, wids[i])
        assert res_py[i].logp == logp[i]
    assert r_py.getstate() == r_nat.getstate()


@pytest.mark.skipif(not runtime.treekit_available(), reason="no native lib")
def test_native_gated_search_propagates_verdict_errors():
    """ctypes swallows callback exceptions (returning an undefined verdict)
    — the wrapper must stash and re-raise so a failing RDKit verdict is a
    traceback, not silently wrong molecules."""
    import random

    lattices, sizes = _random_lattices(6, seed=2)

    def bad_verdict(wid, neis):
        raise ValueError("rdkit exploded")

    with pytest.raises(ValueError, match="rdkit exploded"):
        runtime.beam_search_lattice_native(lattices, sizes, 5,
                                           random.Random(1),
                                           verdict=bad_verdict)


def test_stale_library_rebuilds_from_source(tmp_path):
    """The .so is a build artifact (gitignored): if treekit.cpp is newer than
    the library, first use must rebuild, so a source edit can never ship a
    stale binary through the contract tests silently."""
    import os
    import time

    src = runtime._DIR / "treekit.cpp"
    lib = runtime._LIB_PATH
    assert lib.exists()
    # Make the source look newer than the built library.
    future = time.time() + 10
    os.utime(src, (future, future))
    try:
        assert runtime._stale()
        old_mtime = lib.stat().st_mtime
        assert runtime._build()
        assert lib.stat().st_mtime > old_mtime
    finally:
        now = time.time()
        os.utime(src, (now, now))


# --- native refine-on search (tk_rsearch_*) -------------------------------


def _refine_setup(n_mols=(6, 10), beam=2, check_frac=0.5, hidden=32):
    """Tiny trained-shape models + synthetic blur sets for refine searches."""
    import random

    import jax
    import jax.numpy as jnp

    from hierdiff_tpu.data.assets import load_vocab_fps, load_vocab_smiles
    from hierdiff_tpu.data.denoise import make_denoise_batch
    from hierdiff_tpu.data.refine import make_refine_batch
    from hierdiff_tpu.models.edge_denoise import EdgeDenoise
    from hierdiff_tpu.models.refine import NodeRefine
    from hierdiff_tpu.sampling.refine_hook import RefineHook

    gen = SyntheticTreeGenerator(seed=11)
    dmodel = EdgeDenoise(hidden_nf=hidden, n_layers_full=1, n_layers_focal=1)
    dbatch = {k: jnp.asarray(v) for k, v in
              make_denoise_batch(gen.sample_trees(2, n=6), random.Random(0),
                                 max_n=8).items()}
    dparams = jax.jit(dmodel.init)(jax.random.PRNGKey(0), dbatch)
    rmodel = NodeRefine(hidden_size=hidden, n_layers=1)
    rbatch = {k: jnp.asarray(v) for k, v in
              make_refine_batch(gen.sample_trees(2, n=6), random.Random(1),
                                max_n=8).items()}
    rparams = jax.jit(rmodel.init)(jax.random.PRNGKey(1), rbatch)
    vocab_sizes = np.array([int(round(load_vocab_fps()[s][3]))
                            for s in load_vocab_smiles()])
    trees = []
    for n in n_mols:
        trees += gen.sample_trees(4, n=n)
    blur = [{"x": t.pos, "h": t.feats} for t in trees]

    def make(gate=None, hook_gate=None, rng_seed=7):
        hook = RefineHook(rmodel, rparams, vocab_sizes,
                          check_frac=check_frac, can_assemble=hook_gate)
        from hierdiff_tpu.sampling.lattice import LatticeSampler
        return LatticeSampler(dmodel, dparams, beam_size=beam,
                              refine_hook=hook, can_assemble=gate,
                              rng=random.Random(rng_seed),
                              refine_group_cap=3)

    return blur, make


def _verdict_gate(reject_frac):
    """Deterministic verdict-style gate (same shape as bench _synthetic_gate
    / chem.assemble_gate)."""
    import zlib

    def verdict(wid, neis):
        h = zlib.crc32(repr((int(wid), tuple(neis))).encode()) / 0xFFFFFFFF
        return h >= reject_frac

    def gate(state, i):
        wid = int(state.wids[i])
        if wid < 0:
            return True
        row = np.nonzero(state.adj[i])[0]
        neis = tuple(sorted(int(state.wids[j]) for j in row
                            if j != i and int(state.wids[j]) >= 0))
        if not neis:
            return True
        return verdict(wid, neis)

    gate.verdict = verdict
    return gate


@pytest.mark.skipif(not runtime.treekit_available(), reason="no native lib")
@pytest.mark.parametrize("reject", [0.0, 0.25])
def test_native_refine_search_parity(monkeypatch, reject):
    """The C++ refine-on search (tk_rsearch_* via _sample_refine_native) is
    BIT-EXACT vs the Python pipelined search for the same seed: identical
    wids (including committed refine swaps), adjacency, and logp to the last
    IEEE bit — the fleets, walk decisions, gates and the rng tiebreak stream
    all coincide."""
    blur, make = _refine_setup()
    gate = _verdict_gate(reject) if reject else None
    hook_gate = _verdict_gate(reject / 2) if reject else None

    monkeypatch.setenv("HIERDIFF_REFINE_NATIVE", "0")
    want = make(gate, hook_gate).sample(blur)
    monkeypatch.setenv("HIERDIFF_REFINE_NATIVE", "1")
    sampler = make(gate, hook_gate)
    got = sampler.sample(blur)

    assert any(r is not None for r in want)
    for a, b in zip(got, want):
        assert (a is None) == (b is None)
        if a is None:
            continue
        np.testing.assert_array_equal(a.wids, b.wids)
        np.testing.assert_array_equal(a.adj, b.adj)
        assert a.logp == b.logp                     # exact, not approx


@pytest.mark.skipif(not runtime.treekit_available(), reason="no native lib")
def test_native_refine_search_propagates_verdict_errors(monkeypatch):
    """Exceptions inside a gate verdict must surface, not corrupt the
    native search (ctypes swallows callback exceptions)."""
    blur, make = _refine_setup(n_mols=(10,))

    def verdict(wid, neis):
        raise RuntimeError("boom")

    def gate(state, i):
        return True

    gate.verdict = verdict
    monkeypatch.setenv("HIERDIFF_REFINE_NATIVE", "1")
    with pytest.raises(RuntimeError, match="boom"):
        make(gate, None).sample(blur)


class _ListFeeder:
    """Minimal sample_streamed feeder: hands pre-computed blur sets over in
    fixed chunks (no device dispatch) — isolates the streaming event loop."""

    def __init__(self, blur, chunks):
        self.total = len(blur)
        self.blur = [None] * len(blur)
        self._src = blur
        self._chunks = [list(c) for c in chunks]

    @property
    def done(self):
        return not self._chunks

    def pump(self):
        return []

    def collect_next(self):
        if not self._chunks:
            return []
        idxs = self._chunks.pop(0)
        for i in idxs:
            self.blur[i] = self._src[i]
        return [idxs]


@pytest.mark.skipif(not runtime.treekit_available(), reason="no native lib")
@pytest.mark.parametrize("reject,straddle", [(0.0, False), (0.0, True),
                                             (0.25, False)])
def test_sample_streamed_matches_sample(monkeypatch, reject, straddle):
    """The stage-1/2 overlapped driver (sample_streamed) vs sample():
    per-bucket pooling reproduces sample()'s group PARTITION for any feeder
    chunking that delivers molecules in index order (the real coarse chunk
    plan does), and _group_seed makes each group's rng a pure function of
    the group identity rather than creation order. With bucket-aligned
    feeder chunks the lattice programs also run at identical batch shapes,
    so trees are BIT-exact (wids incl. refine swaps, adjacency, logp).
    Bucket-STRADDLING chunks change a lattice program's batch shape (a
    molecule can run at batch 1 instead of 4), which moves top_logp by
    ~2e-6 (measured f32 batch-shape rounding) — decisions still coincide
    for this pinned seed/data; logp is equal only to that rounding."""
    blur, make = _refine_setup()
    gate = _verdict_gate(reject) if reject else None
    hook_gate = _verdict_gate(reject / 2) if reject else None
    monkeypatch.setenv("HIERDIFF_REFINE_NATIVE", "1")

    want = make(gate, hook_gate).sample(blur)
    sampler = make(gate, hook_gate)
    n = len(blur)
    if straddle:
        chunks = [list(range(0, 2)), list(range(2, 5)), list(range(5, n))]
    else:
        from hierdiff_tpu.data.collate import bucket_for
        by_bucket = {}
        for i, jt in enumerate(blur):
            by_bucket.setdefault(
                bucket_for(jt["h"].shape[0], sampler.buckets), []).append(i)
        chunks = [idxs for _nb, idxs in sorted(by_bucket.items())]
    got = sampler.sample_streamed(_ListFeeder(blur, chunks))

    assert any(r is not None for r in want)
    for a, b in zip(got, want):
        assert (a is None) == (b is None)
        if a is None:
            continue
        np.testing.assert_array_equal(a.wids, b.wids)
        np.testing.assert_array_equal(a.adj, b.adj)
        if straddle:
            assert a.logp == pytest.approx(b.logp, abs=1e-4)
        else:
            assert a.logp == b.logp


def test_sample_streamed_python_fallback(monkeypatch):
    """With the native path disabled, sample_streamed collects the feeder
    and delegates to the serial search — results equal sample() exactly."""
    blur, make = _refine_setup(n_mols=(6,))
    monkeypatch.setenv("HIERDIFF_REFINE_NATIVE", "0")
    want = make().sample(blur)
    got = make().sample_streamed(_ListFeeder(blur, [list(range(len(blur)))]))
    for a, b in zip(got, want):
        assert (a is None) == (b is None)
        if a is None:
            continue
        np.testing.assert_array_equal(a.wids, b.wids)
        assert a.logp == b.logp
