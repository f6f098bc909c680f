"""End-to-end generation pipeline: coarse EDM -> AR assembly -> reconstruction.

The TPU equivalent of running sampler.py + ar_sampling_nosize.py +
reconstruct.py in sequence (readme.md:40-66), as one callable:

1. coarse: batched 1000-step lax.scan sampling of blurred fragment point sets
   (node counts from the GEOM histogram prior);
2. fine: fleet-batched beam search assembling junction trees on device;
3. reconstruct: host-side RDKit geometry-scored assembly (optional — skipped
   without RDKit, returning assembled trees).

Integer blur features are rounded at the stage-1/2 hand-off exactly like the
reference (ar_sampling_nosize.py:388).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from hierdiff_tpu.chem import HAS_RDKIT
from hierdiff_tpu.models.diffusion import CoarseDiffusion
from hierdiff_tpu.models.edge_denoise import EdgeDenoise
from hierdiff_tpu.ops.distributions import DistributionNodes
from hierdiff_tpu.sampling.ar import ARSampler
from hierdiff_tpu.sampling.beam import TreeState
from hierdiff_tpu.sampling.coarse import make_masks_for_counts, sample_coarse
from hierdiff_tpu.sampling.lattice import LatticeSampler, _next_pow2, pow2_chunks


def build_fine_sampler(denoise_model: EdgeDenoise, denoise_params, *,
                       beam_size: int = 5, can_assemble=None,
                       refine_hook=None, allowed_fn=None, mesh=None,
                       buckets: Optional[Sequence[int]] = None,
                       refine_group_cap: Optional[int] = None,
                       refine_merge: Optional[int] = None):
    """Stage-2 sampler for a denoise model: the lattice sampler by default;
    the round-based ARSampler when type choices feed back into the
    trajectory (``vocab_conditioning``)."""
    if denoise_model.vocab_conditioning:
        return ARSampler(denoise_model, denoise_params, beam_size=beam_size,
                         can_assemble=can_assemble, refine_hook=refine_hook,
                         allowed_fn=allowed_fn, buckets=buckets)
    kw = {}
    if refine_group_cap is not None:
        kw["refine_group_cap"] = refine_group_cap
    if refine_merge is not None:
        kw["refine_merge"] = refine_merge
    return LatticeSampler(denoise_model, denoise_params, beam_size=beam_size,
                          can_assemble=can_assemble, refine_hook=refine_hook,
                          allowed_fn=allowed_fn, mesh=mesh, buckets=buckets,
                          **kw)


def round_int_features(h: np.ndarray, int_nf: int) -> np.ndarray:
    """Integer blur dims rounded at the stage-1/2 hand-off
    (reference: ar_sampling_nosize.py:388)."""
    return np.concatenate([np.round(h[:, :int_nf]), h[:, int_nf:]], axis=1)


@dataclasses.dataclass
class PipelineResult:
    blur: List[Dict[str, np.ndarray]]
    trees: List[Optional[TreeState]]
    molecules: Optional[list] = None       # [(mol, amap, smiles)] with RDKit
    stats: Optional[dict] = None


class GenerationPipeline:
    def __init__(self, coarse_model: CoarseDiffusion, coarse_params,
                 denoise_model: EdgeDenoise, denoise_params,
                 histogram: Dict[int, int], beam_size: int = 5,
                 int_nf: int = 5, refine_hook=None, can_assemble=None,
                 vocab=None, max_n_cap: Optional[int] = None,
                 allowed_fn=None, mesh=None,
                 sample_steps: Optional[int] = None,
                 sample_buckets: Optional[Sequence[int]] = None,
                 refine_group_cap: Optional[int] = None,
                 refine_merge: Optional[int] = None):
        """sample_steps: strided reverse-chain length (None = the model's
        full T; 100 measured 7.5x faster with indistinguishable sampled
        feature distributions — see BASELINE.md).

        sample_buckets: pad-bucket set for the coarse chunking AND the
        fine-stage samplers. Default (None) = data.collate.SAMPLING_BUCKETS
        — the finer set measured +16%% end-to-end on TPU (same-window A/B,
        3 interleaved reps, BASELINE.md round-4: 81.5 -> 94.8 mol/s;
        coarse N^2 pad 1.15x, lattice N^3 1.3x). Pass
        data.collate.DEFAULT_BUCKETS for the round-3 coarse set (fewer
        compiles)."""
        self.coarse_model = coarse_model
        if mesh is not None:
            # replicate params up front so repeated sharded calls don't
            # re-broadcast from a single device
            from jax.sharding import NamedSharding, PartitionSpec as P
            repl = NamedSharding(mesh, P())
            coarse_params = jax.device_put(coarse_params, repl)
            denoise_params = jax.device_put(denoise_params, repl)
        self.coarse_params = coarse_params
        self.nodes_dist = DistributionNodes(histogram)
        if sample_buckets is None:
            from hierdiff_tpu.data.collate import SAMPLING_BUCKETS
            sample_buckets = SAMPLING_BUCKETS
        self.sample_buckets = tuple(sample_buckets)
        if refine_hook is not None and hasattr(refine_hook, "buckets"):
            # The hook's pad buckets MUST match the fine sampler's: the native
            # refine search requires it (lattice.py eligibility check) and the
            # lane-merge bit-exactness precondition assumes the hook pads each
            # fleet to the group's bucket. A hook built with a different
            # (usually defaulted) set silently voids both, so align it here.
            refine_hook.buckets = self.sample_buckets
        self.sampler = build_fine_sampler(
            denoise_model, denoise_params, beam_size=beam_size,
            can_assemble=can_assemble, refine_hook=refine_hook,
            allowed_fn=allowed_fn, mesh=mesh, buckets=self.sample_buckets,
            refine_group_cap=refine_group_cap, refine_merge=refine_merge)
        self.int_nf = int_nf
        self.vocab = vocab
        self.max_n_cap = max_n_cap
        self.mesh = mesh
        self.sample_steps = sample_steps

    def sample_blur(self, rng_key, n_molecules: int, max_n: Optional[int] = None,
                    rng_np: Optional[np.random.Generator] = None,
                    batch_size: Optional[int] = None) -> List[Dict[str, np.ndarray]]:
        """Stage 1: coarse point clouds (sizes from the histogram prior).

        Scales to 10k+ molecules: sizes are sorted so each chunk pads to the
        smallest bucket (dense-EGNN cost is quadratic in the pad), chunks run
        at a fixed batch size (one compile per (batch, bucket)), and with a
        ``mesh`` the batch is sharded over the data axis — the jitted scan
        then runs data-parallel across all chips with zero collectives (the
        reverse diffusion of distinct molecules is embarrassingly parallel).
        """
        from hierdiff_tpu.data.collate import DEFAULT_BUCKETS, bucket_for

        buckets = self.sample_buckets or DEFAULT_BUCKETS
        rng_np = rng_np or np.random.default_rng(0)
        counts = self.nodes_dist.sample_np(rng_np, n_molecules)
        if self.max_n_cap:
            counts = np.minimum(counts, self.max_n_cap)
        if max_n is not None:
            counts = np.minimum(counts, max_n)
        bs = batch_size or (64 if self.mesh is None else 64 * self.mesh.devices.size)
        # group by size bucket FIRST, then chunk: a chunk never pads beyond
        # its own bucket (one 83-node outlier must not drag a batch of
        # 15-node trees to the 96 bucket — E[N^2] is ~25x smaller this way)
        by_bucket: Dict[int, list] = {}
        for i, c in enumerate(counts):
            by_bucket.setdefault(bucket_for(int(c), buckets), []).append(i)
        out: List[Optional[Dict[str, np.ndarray]]] = [None] * n_molecules
        # off-mesh: greedy pow2 chunking — a trailing 800-molecule chunk
        # padded to 1024 wastes 28% of its (B,N,N) device time; splitting
        # the remainder into pow2 pieces wastes ~nothing (measured: the
        # batch-1024 pipeline was LOSING to 256 by 11% purely from this)
        chunks = []
        for nb, idxs in sorted(by_bucket.items()):
            takes = (pow2_chunks(len(idxs), bs, 64) if self.mesh is None
                     else [min(bs, len(idxs) - c) for c in range(0, len(idxs), bs)])
            c0 = 0
            for take in takes:
                chunks.append((nb, idxs[c0: c0 + take]))
                c0 += take
        # dispatch every chunk first (JAX dispatch is async — host packing
        # of chunk k+1 overlaps device compute of chunk k), then collect
        # each as ONE packed (B, N, 3+F) readback (see sampling/lattice.py)
        pending = []
        for nb, chunk in chunks:
            chunk = np.asarray(chunk)
            c0 = int(chunk[0])
            ck = counts[chunk]
            # pow2 batch pad: bounded compile-cache growth off-mesh
            pad_b = _next_pow2(len(chunk)) if self.mesh is None else bs
            ck_pad = np.concatenate([ck, np.ones(pad_b - len(chunk), ck.dtype)])
            nm, em = make_masks_for_counts(ck_pad, nb)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                data = NamedSharding(self.mesh, P("data"))
                nm = jax.device_put(nm, data)
                em = jax.device_put(em, data)
            xh = sample_coarse(self.coarse_model, self.coarse_params,
                               jax.random.fold_in(rng_key, c0), nm, em,
                               steps=self.sample_steps, packed=True)
            pending.append((chunk, xh))
        nd = self.coarse_model.n_dims
        for chunk, xh in pending:
            xh = np.asarray(xh)                   # ONE readback per chunk
            x, h = xh[..., :nd], xh[..., nd:]
            for row, i in enumerate(chunk):
                c = int(counts[i])
                out[i] = {"x": x[row, :c],
                          "h": round_int_features(h[row, :c], self.int_nf)}
        return out  # type: ignore[return-value]

    def run(self, rng_key, n_molecules: int, reconstruct: bool = True,
            n_workers: int = 0, batch_size: Optional[int] = None) -> PipelineResult:
        import time

        rng_np = np.random.default_rng(int(jax.random.randint(rng_key, (), 0, 2**31 - 1)))
        t0 = time.perf_counter()
        blur = self.sample_blur(jax.random.fold_in(rng_key, 1), n_molecules,
                                rng_np=rng_np, batch_size=batch_size)
        t1 = time.perf_counter()
        trees = self.sampler.sample(blur)
        # end-of-search repair of non-assemblable fragments
        # (reference: model_refine.py:252-299 check_final_tree)
        hook = self.sampler.refine_hook
        if hook is not None and hasattr(hook, "finalize"):
            trees = [hook.finalize(t) if t is not None else None for t in trees]
        t2 = time.perf_counter()
        result = PipelineResult(blur=blur, trees=trees)
        result.stats = {"t_coarse": t1 - t0, "t_fine": t2 - t1}
        if reconstruct and HAS_RDKIT and self.vocab is not None:
            from hierdiff_tpu.chem.reconstruct import reconstruct_batch
            mol_trees = [t for t in trees if t is not None]
            jt = [tree_state_to_moltree(t, self.vocab) for t in mol_trees]
            result.molecules, stats = reconstruct_batch(jt, self.vocab, n_workers)
            result.stats.update(stats)
            result.stats["t_reconstruct"] = time.perf_counter() - t2
        return result


    def run_streamed(self, rng_key, n_molecules: int, chunk_size: int = 1024,
                     n_workers: int = 2, batch_size: Optional[int] = None,
                     memoize: bool = False) -> PipelineResult:
        """Chunked end-to-end generation with stage-3 overlap: each macro-
        chunk's host-side RDKit reconstruction is submitted to a persistent
        process pool (``map_async``) while the NEXT chunk's coarse sampling
        and lattice assembly run on device — the reconstruction wall time
        hides behind device compute instead of serializing after it (the
        reference runs the three stages as separate sequential scripts,
        readme.md:40-66). Falls back to ``run`` without RDKit/vocab.
        ``memoize`` enables the opt-in per-worker reconstruction caches."""
        import time

        if not (HAS_RDKIT and self.vocab is not None):
            return self.run(rng_key, n_molecules, reconstruct=False,
                            batch_size=batch_size)
        import multiprocessing as mp

        from hierdiff_tpu.chem.reconstruct import (_pool_init, _pool_one,
                                                   summarize_outputs)

        rng_np = np.random.default_rng(
            int(jax.random.randint(rng_key, (), 0, 2**31 - 1)))
        hook = self.sampler.refine_hook
        t0 = time.perf_counter()
        t_device = 0.0
        blur_all: List[Dict[str, np.ndarray]] = []
        trees_all: List[Optional[TreeState]] = []
        pending = []
        with mp.Pool(max(n_workers, 1), initializer=_pool_init,
                     initargs=(self.vocab, memoize)) as pool:
            for k, c0 in enumerate(range(0, n_molecules, chunk_size)):
                m = min(chunk_size, n_molecules - c0)
                td = time.perf_counter()
                blur = self.sample_blur(jax.random.fold_in(rng_key, 1000 + k),
                                        m, rng_np=rng_np, batch_size=batch_size)
                trees = self.sampler.sample(blur)
                if hook is not None and hasattr(hook, "finalize"):
                    trees = [hook.finalize(t) if t is not None else None
                             for t in trees]
                t_device += time.perf_counter() - td
                blur_all.extend(blur)
                trees_all.extend(trees)
                jt = [tree_state_to_moltree(t, self.vocab)
                      for t in trees if t is not None]
                pending.append(pool.map_async(_pool_one, jt))
            outputs = [o for p in pending for o in p.get()]
        results, stats = summarize_outputs(outputs)
        out = PipelineResult(blur=blur_all, trees=trees_all, molecules=results)
        out.stats = dict(stats, t_device=t_device,
                         t_total=time.perf_counter() - t0)
        return out


def tree_state_to_moltree(state: TreeState, vocab):
    """Convert a beam-search TreeState into a chem.MolTree for reconstruction."""
    return tree_dict_to_moltree(
        {"wids": state.wids, "adj": state.adj, "pos": state.pos,
         "feats": state.feats}, vocab)


def tree_dict_to_moltree(d: Dict[str, np.ndarray], vocab):
    """Portable tree-dict form ({wids, adj, pos, feats} — the sampling CLI's
    pickle payload) -> chem.MolTree for reconstruction."""
    from hierdiff_tpu.chem.mol_tree import MolTree, MolTreeNode

    wids = np.asarray(d["wids"])
    pos = np.asarray(d["pos"])
    feats = np.asarray(d["feats"])
    nodes = []
    for i in range(len(wids)):
        smiles = vocab.get_smiles(int(wids[i]))
        nodes.append(MolTreeNode(smiles, pos[i], vocab=vocab,
                                 hbd=float(feats[i, 0])))
    adj = np.asarray(d["adj"]).copy()
    np.fill_diagonal(adj, 0)
    edge_index = np.nonzero(adj)
    return MolTree(nodes=nodes, edge_index=edge_index)
