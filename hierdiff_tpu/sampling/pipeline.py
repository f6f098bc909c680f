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
import os
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from hierdiff_tpu.chem import HAS_RDKIT
from hierdiff_tpu.models.diffusion import CoarseDiffusion
from hierdiff_tpu.models.edge_denoise import EdgeDenoise
from hierdiff_tpu.ops.distributions import DistributionNodes
from hierdiff_tpu.sampling.ar import ARSampler
from hierdiff_tpu.sampling.beam import TreeState
from hierdiff_tpu.sampling.coarse import (CoarseChunkProgram,
                                          make_masks_for_counts, sample_coarse)
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


def _coarse_seg_steps() -> int:
    """Coarse-chain segment length (reverse steps per device program) for
    the segmented dispatch path; 0 = monolithic ``sample_coarse`` (one
    program per chunk). See CoarseChunkProgram for why segmentation exists
    (fine-round queue wait during stage-1/2 overlap)."""
    return int(os.environ.get("HIERDIFF_COARSE_SEG", "0"))


class _BlurFeeder:
    """Streams stage-1 coarse chunks into ``LatticeSampler.sample_streamed``.

    Keeps a small budget of coarse chunk programs dispatched (default 2 —
    enough that the device never idles between chunks while fine-stage
    programs can still interleave between them; a monolithic all-chunks
    enqueue would make every fine-round dispatch wait for the ENTIRE coarse
    stage). ``pump()`` is non-blocking: it absorbs any chunks whose packed
    readback is already on host and tops the budget back up.
    ``collect_next()`` blocks on the oldest in-flight chunk. Chunk plan and
    rng fold are shared with ``GenerationPipeline.sample_blur``, so the
    coarse samples are bit-identical to the unoverlapped path."""

    def __init__(self, pipe: "GenerationPipeline", rng_key, counts: np.ndarray,
                 batch_size: Optional[int] = None,
                 inflight: Optional[int] = None):
        from collections import deque

        self.pipe = pipe
        self.rng_key = rng_key
        self.counts = counts
        self.batch_size = batch_size
        self.chunks = pipe._plan_chunks(counts, batch_size)
        self.total = len(counts)
        self.blur: List[Optional[Dict[str, np.ndarray]]] = [None] * self.total
        self.inflight = deque()
        self.pos = 0
        self.budget = int(inflight or os.environ.get("HIERDIFF_COARSE_INFLIGHT", "2"))
        # seg mode: the chunk's reverse chain runs as ~steps/seg small
        # programs (CoarseChunkProgram) and ``budget`` bounds in-flight
        # SEGMENT futures — the fine stage's fused checks then wait at most
        # ~budget x seg_time on the FIFO queue instead of behind whole
        # multi-second chunk scans (the measured failure mode of the first
        # overlap A/B: 32.8 vs 33.1 mol/s, i.e. no overlap at all)
        self.seg = _coarse_seg_steps() if pipe.mesh is None else 0
        self.max_progs = 2
        self.t_last_coarse: Optional[float] = None
        self._top_up()

    def _top_up(self) -> None:
        if self.seg:
            self._drive()
            return
        while len(self.inflight) < self.budget and self.pos < len(self.chunks):
            nb, chunk = self.chunks[self.pos]
            self.pos += 1
            xh = self.pipe._dispatch_coarse(self.rng_key, self.counts, nb,
                                            chunk, self.batch_size)
            self.inflight.append((chunk, xh))

    def _drive(self) -> None:
        """Seg mode: keep ≤ budget segment programs in flight, chaining each
        chunk's segments and starting the next chunk when the current ones
        are fully dispatched. Non-blocking."""
        live = sum(p.prune() for _, p in self.inflight)
        while live < self.budget:
            prog = next((p for _, p in self.inflight
                         if not p.dispatched_all), None)
            if prog is None:
                if (self.pos < len(self.chunks)
                        and len(self.inflight) < self.max_progs):
                    nb, chunk = self.chunks[self.pos]
                    self.pos += 1
                    p = self.pipe._dispatch_coarse_program(
                        self.rng_key, self.counts, nb, chunk,
                        self.batch_size, self.seg)
                    self.inflight.append((chunk, p))
                    live += 1        # the init program's z future
                    continue
                break
            prog.advance()
            live += 1

    @property
    def done(self) -> bool:
        return not self.inflight and self.pos >= len(self.chunks)

    def _absorb(self, chunk, xh) -> list:
        self.pipe._absorb_coarse(chunk, np.asarray(xh), self.counts, self.blur)
        if self.done:
            import time
            self.t_last_coarse = time.perf_counter()
        return list(chunk)

    def pump(self) -> List[list]:
        out = []
        if self.seg:
            self._drive()
            while self.inflight:
                prog = self.inflight[0][1]
                if prog.result is None or not CoarseChunkProgram._ready(
                        prog.result):
                    break
                chunk, prog = self.inflight.popleft()
                self._drive()            # keep the device fed before reading
                out.append(self._absorb(chunk, prog.result))
            self._drive()
            return out
        while self.inflight and getattr(
                self.inflight[0][1], "is_ready", lambda: False)():
            chunk, xh = self.inflight.popleft()
            self._top_up()               # keep the device fed before reading
            out.append(self._absorb(chunk, xh))
        self._top_up()
        return out

    def collect_next(self) -> List[list]:
        if not self.inflight:
            return []
        if self.seg:
            chunk, prog = self.inflight.popleft()
            while not prog.dispatched_all:
                prog.advance()           # flood: we block on this chunk anyway
            self._drive()                # later chunks keep streaming
            return [self._absorb(chunk, prog.result)]
        chunk, xh = self.inflight.popleft()
        self._top_up()                   # dispatch before the blocking read
        return [self._absorb(chunk, xh)]


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

    def _sample_counts(self, rng_np, n_molecules: int,
                       max_n: Optional[int] = None) -> np.ndarray:
        counts = self.nodes_dist.sample_np(rng_np, n_molecules)
        if self.max_n_cap:
            counts = np.minimum(counts, self.max_n_cap)
        if max_n is not None:
            counts = np.minimum(counts, max_n)
        return counts

    def _plan_chunks(self, counts: np.ndarray,
                     batch_size: Optional[int] = None) -> List[tuple]:
        """Coarse chunk plan [(bucket, idx_list), ...]: group by size bucket
        FIRST, then chunk — a chunk never pads beyond its own bucket (one
        83-node outlier must not drag a batch of 15-node trees to the 96
        bucket; E[N^2] is ~25x smaller this way). Off-mesh the remainder is
        split into pow2 pieces (a trailing 800-molecule chunk padded to 1024
        wastes 28% of its (B,N,N) device time). Shared by ``sample_blur``
        and the overlapped feeder so the rng partition (fold_in by the
        chunk's first index) is identical in both modes."""
        from hierdiff_tpu.data.collate import DEFAULT_BUCKETS, bucket_for

        buckets = self.sample_buckets or DEFAULT_BUCKETS
        bs = batch_size or (64 if self.mesh is None else 64 * self.mesh.devices.size)
        by_bucket: Dict[int, list] = {}
        for i, c in enumerate(counts):
            by_bucket.setdefault(bucket_for(int(c), buckets), []).append(i)
        chunks = []
        for nb, idxs in sorted(by_bucket.items()):
            takes = (pow2_chunks(len(idxs), bs, 64) if self.mesh is None
                     else [min(bs, len(idxs) - c) for c in range(0, len(idxs), bs)])
            c0 = 0
            for take in takes:
                chunks.append((nb, idxs[c0: c0 + take]))
                c0 += take
        return chunks

    def _dispatch_coarse(self, rng_key, counts: np.ndarray, nb: int, chunk,
                         batch_size: Optional[int] = None):
        """Async half of one coarse chunk: dispatch the 1000-step scan,
        return the packed (B, N, 3+F) device array (readback not blocked).
        rng = fold_in(rng_key, first molecule index) — the partition is a
        pure function of the chunk plan, so overlapped and serial runs draw
        IDENTICAL coarse samples."""
        chunk = np.asarray(chunk)
        ck = counts[chunk]
        bs = batch_size or (64 if self.mesh is None else 64 * self.mesh.devices.size)
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
                           jax.random.fold_in(rng_key, int(chunk[0])), nm, em,
                           steps=self.sample_steps, packed=True)
        try:
            xh.copy_to_host_async()
        except Exception:
            pass
        return xh

    def _dispatch_coarse_program(self, rng_key, counts: np.ndarray, nb: int,
                                 chunk, batch_size: Optional[int] = None,
                                 seg: int = 128) -> CoarseChunkProgram:
        """Segmented variant of ``_dispatch_coarse``: same chunk pad policy
        and the same ``fold_in(rng_key, first index)`` rng partition, but the
        reverse chain runs as ~steps/seg small device programs
        (CoarseChunkProgram) whose dispatch the caller paces. Off-mesh only.
        Samples are bit-identical to ``sample_coarse`` (pinned in
        tests/test_beam.py::test_segmented_coarse_matches_monolithic)."""
        chunk = np.asarray(chunk)
        ck = counts[chunk]
        pad_b = _next_pow2(len(chunk))
        ck_pad = np.concatenate([ck, np.ones(pad_b - len(chunk), ck.dtype)])
        nm, em = make_masks_for_counts(ck_pad, nb)
        return CoarseChunkProgram(
            self.coarse_model, self.coarse_params,
            jax.random.fold_in(rng_key, int(chunk[0])), nm, em,
            steps=self.sample_steps, seg=seg, packed=True)

    def _absorb_coarse(self, chunk, xh: np.ndarray, counts: np.ndarray,
                       out: list) -> None:
        """Blocking half: unpack one chunk's packed readback into per-
        molecule blur dicts (integer dims rounded at the stage hand-off,
        ar_sampling_nosize.py:388)."""
        nd = self.coarse_model.n_dims
        x, h = xh[..., :nd], xh[..., nd:]
        for row, i in enumerate(chunk):
            c = int(counts[i])
            out[i] = {"x": x[row, :c],
                      "h": round_int_features(h[row, :c], self.int_nf)}

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
        rng_np = rng_np or np.random.default_rng(0)
        counts = self._sample_counts(rng_np, n_molecules, max_n)
        out: List[Optional[Dict[str, np.ndarray]]] = [None] * n_molecules
        # dispatch every chunk first (JAX dispatch is async — host packing
        # of chunk k+1 overlaps device compute of chunk k), then collect
        # each as ONE packed (B, N, 3+F) readback (see sampling/lattice.py)
        seg = _coarse_seg_steps()
        pending = []
        if seg and self.mesh is None:
            # same segmented programs as the overlapped feeder, so serial
            # and streamed runs stay bit-identical; all segments dispatch
            # up front (back-to-back on the queue — continuity as before)
            for nb, chunk in self._plan_chunks(counts, batch_size):
                prog = self._dispatch_coarse_program(rng_key, counts, nb,
                                                     chunk, batch_size, seg)
                while not prog.dispatched_all:
                    prog.advance()
                pending.append((chunk, prog.result))
        else:
            for nb, chunk in self._plan_chunks(counts, batch_size):
                pending.append((chunk, self._dispatch_coarse(
                    rng_key, counts, nb, chunk, batch_size)))
        for chunk, xh in pending:
            self._absorb_coarse(chunk, np.asarray(xh), counts, out)
        return out  # type: ignore[return-value]

    def run(self, rng_key, n_molecules: int, reconstruct: bool = True,
            n_workers: int = 0, batch_size: Optional[int] = None,
            overlap: Optional[bool] = None) -> PipelineResult:
        """overlap: stream stage-1 chunks into stage 2 (_BlurFeeder +
        LatticeSampler.sample_streamed) so fine-stage rounds interleave with
        the remaining coarse chunks' device programs instead of serializing
        after the whole coarse stage. Default (None) = on whenever supported
        (off-mesh lattice sampler); coarse samples are bit-identical either
        way, the fine-stage group rng is re-partitioned (distribution-
        equivalent — see sample_streamed). ``stats['t_coarse']`` then means
        "wall until the LAST coarse chunk landed" (fine work already ran
        under it) and ``t_fine`` the tail after."""
        import time

        if overlap is None:
            overlap = os.environ.get("HIERDIFF_PIPE_OVERLAP", "1") != "0"
        overlap = (overlap and self.mesh is None
                   and hasattr(self.sampler, "sample_streamed"))
        rng_np = np.random.default_rng(int(jax.random.randint(rng_key, (), 0, 2**31 - 1)))
        t0 = time.perf_counter()
        if overlap:
            counts = self._sample_counts(rng_np, n_molecules)
            feeder = _BlurFeeder(self, jax.random.fold_in(rng_key, 1), counts,
                                 batch_size)
            trees = self.sampler.sample_streamed(feeder)
            blur = feeder.blur
            t1 = feeder.t_last_coarse or time.perf_counter()
        else:
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
            overlap = (self.mesh is None
                       and hasattr(self.sampler, "sample_streamed")
                       and os.environ.get("HIERDIFF_PIPE_OVERLAP", "1") != "0")
            for k, c0 in enumerate(range(0, n_molecules, chunk_size)):
                m = min(chunk_size, n_molecules - c0)
                td = time.perf_counter()
                if overlap:
                    counts = self._sample_counts(rng_np, m)
                    feeder = _BlurFeeder(self, jax.random.fold_in(rng_key, 1000 + k),
                                         counts, batch_size)
                    trees = self.sampler.sample_streamed(feeder)
                    blur = feeder.blur
                else:
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
