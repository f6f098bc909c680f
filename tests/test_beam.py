"""Beam-search semantics (sampling/beam.py) + lattice sampler (sampling/lattice.py).

The PQ tests drive the search with handcrafted expanders (no device) and pin
the reference behaviors rebuilt from generation/ar_sampling_nosize.py:
backtracking to older partials, per-candidate and final assembly gates, the
beam_size prune, and refine-hook requeue semantics. The lattice tests prove
the one-device-call path is equivalent to the round-based device path.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hierdiff_tpu.data.denoise import make_denoise_batch
from hierdiff_tpu.data.synthetic import SyntheticTreeGenerator
from hierdiff_tpu.models.edge_denoise import EdgeDenoise
from hierdiff_tpu.sampling.ar import ARSampler
from hierdiff_tpu.sampling.beam import Expansion, PQBeamSearch, TreeState
from hierdiff_tpu.sampling.lattice import LatticeSampler


# --- handcrafted-expander PQ tests -----------------------------------------


def make_state(n=3, index=0):
    return TreeState(feats=np.zeros((n, 8), np.float32),
                     pos=np.zeros((n, 3), np.float32),
                     adj=np.zeros((n, n), np.float32),
                     wids=np.full(n, -1, np.int64), index=index)


class ChainExpander:
    """Fixed topology: step t types node t, attaching t-1 -> t. Candidate
    types/logps per step are supplied as arrays."""

    def __init__(self, cand_wids, cand_logps):
        self.cand_wids = [np.asarray(c) for c in cand_wids]
        self.cand_logps = [np.asarray(c, np.float64) for c in cand_logps]
        self.n_expansions = 0

    def __call__(self, states):
        out = []
        for s in states:
            t = s.n_assigned
            self.n_expansions += 1
            out.append(Expansion(focal=t - 1, target=t, attach=t > 0,
                                 cand_wids=self.cand_wids[t],
                                 cand_logps=self.cand_logps[t]))
        return out


def test_pq_greedy_completion():
    exp = ChainExpander(
        cand_wids=[[10, 11], [20, 21], [30, 31]],
        cand_logps=[[-0.1, -2.0], [-0.2, -1.5], [-0.3, -3.0]])
    search = PQBeamSearch(exp, beam_size=2, rng=random.Random(0))
    (res,) = search.run([make_state(3)])
    assert res is not None and list(res.wids) == [10, 20, 30]
    # chain adjacency with cleared root marker
    assert res.adj[0, 1] == 1 and res.adj[1, 2] == 1 and res.adj[0, 0] == 0
    assert res.logp == pytest.approx(0.6, abs=1e-6)


def test_pq_backtracks_to_older_partial():
    """The greedy branch dies at the last step; the search must back-track
    to the cheaper sibling pushed two rounds earlier
    (ar_sampling_nosize.py:284-296)."""
    exp = ChainExpander(
        cand_wids=[[10, 11], [20, 21], [30, 31]],
        cand_logps=[[-0.1, -0.5], [-0.2, -0.4], [-0.3, -0.6]])

    def gate(state, node):
        # any completed assignment that started from wid 10 is unassemblable
        if state.wids[0] == 10 and state.n_assigned == 3:
            return False
        return True

    search = PQBeamSearch(exp, beam_size=2, can_assemble=gate,
                          rng=random.Random(0))
    (res,) = search.run([make_state(3)])
    assert res is not None
    assert res.wids[0] == 11  # backtracked to the step-0 sibling


def test_pq_final_gate_retry_and_reference_mode():
    """A completed tree failing the all-nodes gate: reference mode gives up,
    retry mode keeps searching (ar_sampling_nosize.py:396-403)."""
    def make():
        return ChainExpander(
            cand_wids=[[10, 11], [20, 21]],
            cand_logps=[[-0.1, -0.5], [-0.2, -0.4]])

    def gate(state, node):
        # the per-candidate gate checks the FOCAL node (0 here) and passes;
        # only the final all-nodes sweep reaches node 1 and rejects the
        # greedy root type
        if node != 1:
            return True
        return state.wids[0] != 10

    search = PQBeamSearch(make(), beam_size=2, can_assemble=gate,
                          retry_final_gate=True, rng=random.Random(0))
    (res,) = search.run([make_state(2)])
    assert res is not None and res.wids[0] == 11

    search = PQBeamSearch(make(), beam_size=2, can_assemble=gate,
                          retry_final_gate=False, rng=random.Random(0))
    (res,) = search.run([make_state(2)])
    assert res is None           # reference behavior: molecule yields nothing


def test_pq_beam_prune_keeps_top_k():
    """Only beam_size children are pushed per expansion (remove_queue_dup)."""
    exp = ChainExpander(
        cand_wids=[[1, 2, 3, 4, 5], [7, 8, 9, 10, 11]],
        cand_logps=[[-0.1, -0.2, -0.3, -0.4, -0.5]] * 2)
    search = PQBeamSearch(exp, beam_size=2, rng=random.Random(0))
    (res,) = search.run([make_state(2)])
    assert res is not None
    # every expansion pushes at most beam_size of its 5 candidates
    assert search._push_count <= 1 + 2 * exp.n_expansions


def test_pq_budget_exhaustion_returns_none():
    exp = ChainExpander(cand_wids=[[1], [2]], cand_logps=[[-0.1], [-0.2]])
    gate = lambda s, n: not s.done or False   # final gate always fails
    search = PQBeamSearch(exp, beam_size=1, can_assemble=lambda s, n: not s.done,
                          retry_final_gate=True, max_expansions_factor=2,
                          rng=random.Random(0))
    (res,) = search.run([make_state(2)])
    assert res is None


class RequeueHook:
    """Fake refine hook: perturbs each state exactly once (marker wid)."""

    def __init__(self):
        self.calls = 0

    def check_batch(self, states):
        out = []
        for s in states:
            self.calls += 1
            if s.n_assigned == 1 and s.wids[0] == 10:
                p = s.clone()
                p.wids[0] = 99
                out.append((p, -0.05, True))
            else:
                out.append((s, 0.0, False))
        return out


def test_pq_refine_requeues_without_expansion():
    """Refined trees are re-queued and NOT expanded that round
    (ar_sampling_nosize.py:138-143)."""
    exp = ChainExpander(cand_wids=[[10], [20]], cand_logps=[[-0.1], [-0.2]])
    hook = RequeueHook()
    search = PQBeamSearch(exp, beam_size=1, refine_hook=hook, rng=random.Random(0))
    (res,) = search.run([make_state(2)])
    assert res is not None
    assert res.wids[0] == 99     # the perturbation survived to the result
    assert hook.calls >= 2       # re-queued state was checked again


def test_pq_multi_molecule_independence():
    exp = ChainExpander(cand_wids=[[10, 11], [20, 21]],
                        cand_logps=[[-0.1, -0.5], [-0.2, -0.4]])
    states = [make_state(2, index=0), make_state(2, index=1)]
    search = PQBeamSearch(exp, beam_size=2, rng=random.Random(0))
    res = search.run(states)
    assert all(r is not None for r in res)
    assert [r.index for r in res] == [0, 1]


# --- lattice sampler ---------------------------------------------------------


@pytest.fixture(scope="module")
def fine_model():
    gen = SyntheticTreeGenerator(seed=0)
    model = EdgeDenoise(hidden_nf=32, n_layers_full=2, n_layers_focal=2)
    trees = gen.sample_trees(2, n=5)
    dummy = {k: jnp.asarray(v) for k, v in
             make_denoise_batch(trees, random.Random(0), max_n=8).items()}
    params = model.init(jax.random.PRNGKey(0), dummy)
    return gen, model, params


def test_ar_lattice_trajectory_shape(fine_model):
    gen, model, params = fine_model
    b, n = 2, 5
    trees = gen.sample_trees(b, n=n)
    feats = jnp.asarray(np.stack([t.feats for t in trees]))
    pos = jnp.asarray(np.stack([t.pos for t in trees]))
    nmask = jnp.ones((b, n, 1))
    out = jax.jit(lambda f, p, m: model.apply(params, f, p, m,
                                              method=EdgeDenoise.ar_lattice))(feats, pos, nmask)
    out = {k: np.asarray(v) for k, v in out.items()}
    assert out["focal"].shape == (b, n)
    assert out["top_wid"].shape == (b, n, 16)
    # step 0 is the root-typing step
    assert np.all(out["focal"][:, 0] == -1)
    assert np.all(out["target"][:, 0] == 0)
    assert not np.any(out["did_attach"][:, 0])
    # steps 1..n-1 all attach and each step types a NEW node
    assert np.all(out["did_attach"][:, 1:])
    for i in range(b):
        assert len(set(out["target"][i])) == n, "each node typed exactly once"
    # logps sorted descending and proper
    assert np.all(np.diff(out["top_logp"], axis=-1) <= 1e-6)
    assert np.all(out["top_logp"] <= 0)


def test_lattice_matches_round_based_sampler(fine_model):
    """One-device-call lattice path == per-round device path, same search."""
    gen, model, params = fine_model
    blur = [{"x": t.pos, "h": t.feats} for t in gen.sample_trees(3, n=5)]
    res_round = ARSampler(model, params, beam_size=3,
                          rng=random.Random(2022)).sample(blur)
    res_lat = LatticeSampler(model, params, beam_size=3,
                             rng=random.Random(2022)).sample(blur)
    for a, b in zip(res_round, res_lat):
        assert a is not None and b is not None
        np.testing.assert_array_equal(a.wids, b.wids)
        np.testing.assert_array_equal(a.adj, b.adj)
        assert a.logp == pytest.approx(b.logp, rel=1e-5)


def test_lattice_allowed_fn_restricts_support(fine_model):
    """allowed_fn limits every node's type choices (ar_sampling.py:62-118)."""
    gen, model, params = fine_model
    blur = [{"x": t.pos, "h": t.feats} for t in gen.sample_trees(2, n=5)]
    allowed = [5, 17, 101]

    sampler = LatticeSampler(model, params, beam_size=3,
                             allowed_fn=lambda feats: [allowed] * feats.shape[0])
    res = sampler.sample(blur)
    for r in res:
        assert r is not None
        assert set(r.wids.tolist()) <= set(allowed)


def test_lattice_mixed_sizes_and_buckets(fine_model):
    gen, model, params = fine_model
    blur = ([{"x": t.pos, "h": t.feats} for t in gen.sample_trees(2, n=5)]
            + [{"x": t.pos, "h": t.feats} for t in gen.sample_trees(1, n=11)])
    res = LatticeSampler(model, params, beam_size=2).sample(blur)
    assert [r.n for r in res] == [5, 5, 11]
    for r in res:
        adj = r.adj.copy()
        np.fill_diagonal(adj, 0)
        assert adj.sum() == 2 * (r.n - 1)


def test_pow2_chunks_decomposition():
    """Greedy pow2 split must cover n exactly with cap-sized chunks first,
    then descending pow2 pieces (bounded jit-cache diversity)."""
    from hierdiff_tpu.sampling.lattice import pow2_chunks
    for n in [1, 3, 4, 7, 64, 511, 512, 513, 952, 1000, 1024, 2500]:
        for cap in [64, 512, 1024]:
            pieces = list(pow2_chunks(n, cap, min_chunk=4))
            assert sum(pieces) == n
            # every piece except possibly the last is a pow2 <= cap
            for p in pieces[:-1]:
                assert p <= cap and (p & (p - 1)) == 0
            assert pieces == sorted(pieces, reverse=True)


def test_lattice_chunk_cap_invariance(fine_model):
    """Chunking must not change results: max_chunk=4 (forcing multiple
    chunks + pow2 pad) == one big chunk, tree for tree."""
    gen, model, params = fine_model
    blur = [{"x": t.pos, "h": t.feats} for t in gen.sample_trees(10, n=5)]
    res_one = LatticeSampler(model, params, beam_size=2).sample(blur)
    res_chunked = LatticeSampler(model, params, beam_size=2,
                                 max_chunk=4).sample(blur)
    for a, b in zip(res_one, res_chunked):
        assert a is not None and b is not None
        np.testing.assert_array_equal(a.wids, b.wids)
        np.testing.assert_array_equal(a.adj, b.adj)


def test_sampling_buckets_waste_and_monotonicity():
    """SAMPLING_BUCKETS must cover every DEFAULT_BUCKETS size and realize
    the documented padded-N^2 saving (<=1.25x) under the shipped GEOM
    histogram (data/collate.py rationale)."""
    from hierdiff_tpu.data.assets import load_geom_histogram
    from hierdiff_tpu.data.collate import (DEFAULT_BUCKETS, SAMPLING_BUCKETS,
                                           bucket_for)

    assert SAMPLING_BUCKETS == tuple(sorted(SAMPLING_BUCKETS))
    assert SAMPLING_BUCKETS[-1] == DEFAULT_BUCKETS[-1]
    hist = load_geom_histogram()
    ns = np.array(sorted(hist))
    ps = np.array([hist[n] for n in ns], float)
    ps /= ps.sum()
    true = (ps * ns.astype(float) ** 2).sum()
    for buckets, cap in [(DEFAULT_BUCKETS, None), (SAMPLING_BUCKETS, 1.25)]:
        pads = np.array([bucket_for(int(n), buckets) for n in ns], float)
        assert (pads >= ns).all()
        if cap is not None:
            assert (ps * pads**2).sum() / true <= cap


def test_pipeline_sampling_buckets_end_to_end(fine_model):
    """GenerationPipeline with the finer SAMPLING_BUCKETS pad set: every
    tree assembles, blur stays finite, sizes respect the histogram cap.
    (Bucket choice re-partitions the coarse rng stream, so results are
    distribution-equivalent — not sample-identical — to DEFAULT_BUCKETS;
    within-bucket padding invariance is pinned elsewhere.)"""
    from hierdiff_tpu.data.assets import load_geom_histogram
    from hierdiff_tpu.data.collate import SAMPLING_BUCKETS, bucket_for
    from hierdiff_tpu.models.diffusion import CoarseDiffusion
    from hierdiff_tpu.sampling.coarse import make_masks_for_counts
    from hierdiff_tpu.sampling.pipeline import GenerationPipeline

    gen, denoise, dparams = fine_model
    coarse = CoarseDiffusion(in_node_nf=8, timesteps=4, hidden_nf=32,
                             n_layers=1)
    nm, em = make_masks_for_counts(np.array([5, 7]), 8)
    cb = {"positions": jnp.zeros((2, 8, 3)), "node_feature": jnp.zeros((2, 8, 8)),
          "atom_mask": jnp.asarray(nm), "edge_mask": jnp.asarray(em)}
    cparams = jax.jit(lambda r, b, r2: coarse.init(r, b, r2, train=True))(
        jax.random.PRNGKey(0), cb, jax.random.PRNGKey(1))
    pipe = GenerationPipeline(coarse, cparams, denoise, dparams,
                              histogram=load_geom_histogram(), beam_size=2,
                              sample_buckets=SAMPLING_BUCKETS, max_n_cap=20)
    res = pipe.run(jax.random.PRNGKey(3), 12, reconstruct=False, batch_size=4)
    assert sum(t is not None for t in res.trees) == 12
    for b in res.blur:
        assert np.isfinite(b["x"]).all() and np.isfinite(b["h"]).all()
        assert 1 <= b["x"].shape[0] <= 20
        assert bucket_for(b["x"].shape[0], SAMPLING_BUCKETS) <= 20


def test_pipeline_aligns_refine_hook_buckets(fine_model):
    """A RefineHook built with defaulted buckets (DEFAULT_BUCKETS) must be
    re-pointed at the pipeline's resolved sample_buckets: the native refine
    search's eligibility check and the lane-merge bit-exactness precondition
    both require hook.buckets == sampler.buckets (advisor round-4 finding —
    bench.py's headline silently failed the eligibility check)."""
    import types

    from hierdiff_tpu.data.assets import load_geom_histogram
    from hierdiff_tpu.data.collate import DEFAULT_BUCKETS, SAMPLING_BUCKETS
    from hierdiff_tpu.models.diffusion import CoarseDiffusion
    from hierdiff_tpu.sampling.coarse import make_masks_for_counts
    from hierdiff_tpu.sampling.pipeline import GenerationPipeline

    gen, denoise, dparams = fine_model
    coarse = CoarseDiffusion(in_node_nf=8, timesteps=4, hidden_nf=32,
                             n_layers=1)
    nm, em = make_masks_for_counts(np.array([5, 7]), 8)
    cb = {"positions": jnp.zeros((2, 8, 3)), "node_feature": jnp.zeros((2, 8, 8)),
          "atom_mask": jnp.asarray(nm), "edge_mask": jnp.asarray(em)}
    cparams = jax.jit(lambda r, b, r2: coarse.init(r, b, r2, train=True))(
        jax.random.PRNGKey(0), cb, jax.random.PRNGKey(1))
    hook = types.SimpleNamespace(buckets=DEFAULT_BUCKETS)  # defaulted hook
    pipe = GenerationPipeline(coarse, cparams, denoise, dparams,
                              histogram=load_geom_histogram(), beam_size=2,
                              refine_hook=hook)
    assert tuple(hook.buckets) == tuple(SAMPLING_BUCKETS)
    # the native-search eligibility condition (lattice.py) now holds
    assert tuple(pipe.sampler.refine_hook.buckets) == tuple(pipe.sampler.buckets)


def test_pipeline_overlap_blur_bit_identical(fine_model):
    """run(overlap=True) streams stage-1 chunks into stage 2, but the chunk
    plan and per-chunk rng fold are shared with sample_blur — the COARSE
    samples must be bit-identical to the serial path; trees all assemble in
    both modes (fine-stage grouping is re-partitioned, so trees are
    distribution-equivalent, not pinned equal here)."""
    from hierdiff_tpu.data.assets import load_geom_histogram
    from hierdiff_tpu.models.diffusion import CoarseDiffusion
    from hierdiff_tpu.sampling.coarse import make_masks_for_counts
    from hierdiff_tpu.sampling.pipeline import GenerationPipeline

    gen, denoise, dparams = fine_model
    coarse = CoarseDiffusion(in_node_nf=8, timesteps=4, hidden_nf=32,
                             n_layers=1)
    nm, em = make_masks_for_counts(np.array([5, 7]), 8)
    cb = {"positions": jnp.zeros((2, 8, 3)), "node_feature": jnp.zeros((2, 8, 8)),
          "atom_mask": jnp.asarray(nm), "edge_mask": jnp.asarray(em)}
    cparams = jax.jit(lambda r, b, r2: coarse.init(r, b, r2, train=True))(
        jax.random.PRNGKey(0), cb, jax.random.PRNGKey(1))
    pipe = GenerationPipeline(coarse, cparams, denoise, dparams,
                              histogram=load_geom_histogram(), beam_size=2,
                              max_n_cap=16)
    r_serial = pipe.run(jax.random.PRNGKey(5), 10, reconstruct=False,
                        batch_size=4, overlap=False)
    r_overlap = pipe.run(jax.random.PRNGKey(5), 10, reconstruct=False,
                         batch_size=4, overlap=True)
    for a, b in zip(r_serial.blur, r_overlap.blur):
        np.testing.assert_array_equal(a["x"], b["x"])
        np.testing.assert_array_equal(a["h"], b["h"])
    assert sum(t is not None for t in r_serial.trees) == 10
    assert sum(t is not None for t in r_overlap.trees) == 10


def test_segmented_coarse_matches_monolithic(fine_model):
    """CoarseChunkProgram (init -> seg-scan xK -> final as SEPARATE device
    programs, the stage-1/2 overlap dispatch unit) is bit-identical to the
    one-scan sample_coarse: same rng split, same per-step fold by s, same
    step math — only program boundaries differ. Checked at seg lengths that
    split evenly, raggedly, and degenerate to one segment; and end-to-end:
    the pipeline with HIERDIFF_COARSE_SEG set produces bit-identical blur
    (serial AND streamed) to the monolithic default."""
    import os

    from hierdiff_tpu.data.assets import load_geom_histogram
    from hierdiff_tpu.models.diffusion import CoarseDiffusion
    from hierdiff_tpu.sampling.coarse import (CoarseChunkProgram,
                                              make_masks_for_counts,
                                              sample_coarse)
    from hierdiff_tpu.sampling.pipeline import GenerationPipeline

    gen, denoise, dparams = fine_model
    coarse = CoarseDiffusion(in_node_nf=8, timesteps=6, hidden_nf=32,
                             n_layers=1)
    nm, em = make_masks_for_counts(np.array([5, 7]), 8)
    cb = {"positions": jnp.zeros((2, 8, 3)), "node_feature": jnp.zeros((2, 8, 8)),
          "atom_mask": jnp.asarray(nm), "edge_mask": jnp.asarray(em)}
    cparams = jax.jit(lambda r, b, r2: coarse.init(r, b, r2, train=True))(
        jax.random.PRNGKey(0), cb, jax.random.PRNGKey(1))

    key = jax.random.PRNGKey(7)
    ref = np.asarray(sample_coarse(coarse, cparams, key, jnp.asarray(nm),
                                   jnp.asarray(em), packed=True))
    for seg in (1, 2, 4, 6, 100):     # ragged (4: 4+2), exact, one-segment
        prog = CoarseChunkProgram(coarse, cparams, key, nm, em, seg=seg)
        while not prog.dispatched_all:
            prog.advance()
        np.testing.assert_array_equal(np.asarray(prog.result), ref,
                                      err_msg=f"seg={seg}")

    pipe = GenerationPipeline(coarse, cparams, denoise, dparams,
                              histogram=load_geom_histogram(), beam_size=2,
                              max_n_cap=16)
    base = pipe.run(jax.random.PRNGKey(5), 10, reconstruct=False,
                    batch_size=4, overlap=False)
    os.environ["HIERDIFF_COARSE_SEG"] = "2"
    try:
        for overlap in (False, True):
            r = pipe.run(jax.random.PRNGKey(5), 10, reconstruct=False,
                         batch_size=4, overlap=overlap)
            for a, b in zip(base.blur, r.blur):
                np.testing.assert_array_equal(a["x"], b["x"])
                np.testing.assert_array_equal(a["h"], b["h"])
            assert sum(t is not None for t in r.trees) == 10
    finally:
        del os.environ["HIERDIFF_COARSE_SEG"]


def test_lattice_bucket_pad_invariance(fine_model):
    """The lattice trajectory must not depend on the pad bucket: n=5 trees
    padded to 8 vs 16 give identical trees (masked padding contributes
    exact zeros to every reduction)."""
    gen, model, params = fine_model
    blur = [{"x": t.pos, "h": t.feats} for t in gen.sample_trees(6, n=5)]
    res_8 = LatticeSampler(model, params, beam_size=2,
                           buckets=(8,)).sample(blur)
    res_16 = LatticeSampler(model, params, beam_size=2,
                            buckets=(16,)).sample(blur)
    for a, b in zip(res_8, res_16):
        assert a is not None and b is not None
        np.testing.assert_array_equal(a.wids, b.wids)
        np.testing.assert_array_equal(a.adj, b.adj)


def test_round_sampler_bucket_threading_matches_lattice(fine_model):
    """ARSampler with the finer bucket set (n=10 -> pad 12) must equal
    LatticeSampler at the default set (n=10 -> pad 16): exercises the
    buckets= threading through DeviceExpander AND cross-sampler pad
    invariance in one shot."""
    from hierdiff_tpu.data.collate import SAMPLING_BUCKETS

    gen, model, params = fine_model
    blur = [{"x": t.pos, "h": t.feats} for t in gen.sample_trees(3, n=10)]
    res_round = ARSampler(model, params, beam_size=2,
                          rng=random.Random(7),
                          buckets=SAMPLING_BUCKETS).sample(blur)
    res_lat = LatticeSampler(model, params, beam_size=2,
                             rng=random.Random(7)).sample(blur)
    for a, b in zip(res_round, res_lat):
        assert a is not None and b is not None
        np.testing.assert_array_equal(a.wids, b.wids)
        np.testing.assert_array_equal(a.adj, b.adj)
