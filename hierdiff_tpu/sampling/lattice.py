"""Lattice AR sampler: the whole fine-stage assembly in one device call.

With the reference's live configuration the tree-growth trajectory is
independent of the fragment types the beam chooses (see
``EdgeDenoise.ar_lattice``), so the device can emit the full expansion
lattice — per step: focal node, attach target, top-k type candidates — for a
whole batch of molecules in ONE jitted ``lax.scan``. The beam search
(priority queue, backtracking, assembly gates, refine perturbation) then
runs on host against the precomputed lattice at zero device cost per
expansion.

Cost model vs the round-based sampler (sampling/ar.py): the reference-shaped
search crosses the host<->device boundary once per beam expansion — O(N)
round trips per molecule, 28-60 ms each on a tunneled TPU. Here it crosses
once per (size-bucket, chunk): ~13 device round trips for 10k GEOM
molecules. Throughput follows the device FLOPs instead of the link latency.

Because each chunk is a fixed-shape pure function of (params, feats, pos,
mask), the lattice computation shards trivially over a data mesh
(``mesh=`` argument) — the same path that scales coarse sampling scales the
fine stage.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hierdiff_tpu.data.collate import DEFAULT_BUCKETS, bucket_for
from hierdiff_tpu.models.edge_denoise import EdgeDenoise
from hierdiff_tpu.sampling.beam import Expansion, PQBeamSearch, TreeState

UNDISCOVERED_TOKEN = 780


@dataclasses.dataclass
class MoleculeLattice:
    """Per-molecule expansion lattice: step t assigns the type of node
    target[t] (t=0 is the root-typing step, attach[0]=False)."""

    focal: np.ndarray      # (S,) int
    target: np.ndarray     # (S,) int
    attach: np.ndarray     # (S,) bool
    top_wid: np.ndarray    # (S, K) int
    top_logp: np.ndarray   # (S, K) float


class LatticeExpander:
    """beam.PQBeamSearch expander backed by precomputed lattices."""

    def __init__(self, lattices: Dict[int, MoleculeLattice]):
        self.lattices = lattices

    def __call__(self, states: Sequence[TreeState]) -> List[Expansion]:
        out = []
        for s in states:
            lat = self.lattices[s.index]
            t = s.n_assigned
            out.append(Expansion(
                focal=int(lat.focal[t]), target=int(lat.target[t]),
                attach=bool(lat.attach[t]),
                cand_wids=lat.top_wid[t], cand_logps=lat.top_logp[t]))
        return out


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _group_seed(base: int, members) -> int:
    """Per-group rng seed for the refine-on searches: one master draw
    (``base``) mixed with the group's FIRST molecule index. Groups partition
    the molecules, so first indices are unique — and the seed is a pure
    function of the group's identity, not of the order groups were created
    in. That is what makes ``sample_streamed`` bit-exact with ``sample()``:
    the streamed driver emits full groups on arrival and remainders at
    flush (a different creation ORDER than the serial driver), but both
    form the same group partition, so every group draws the identical
    tiebreak stream. Shared by the Python pipelined and native (C++)
    searches — their cross-parity pin depends on it."""
    return (base ^ ((int(members[0]) + 1) * 0x9E3779B97F4A7C15)) & (2**64 - 1)


def pow2_chunks(n: int, cap: int, min_chunk: int = 4):
    """Greedy pow2 decomposition of a bucket population into chunk sizes.

    Full ``cap``-sized chunks first, then the remainder split into
    descending pow2 pieces (952 -> 512, 256, 128, 56) instead of one
    chunk padded up to the next pow2 (952 -> pad 1024). Padding rows of
    the dense (B,N,N) compute cost full FLOPs, so a trailing 800-molecule
    chunk padded to 1024 wastes 28% of its device time; the greedy split
    wastes at most ``min_chunk - 1`` rows total. Chunk-size diversity
    stays bounded (pow2 only) so the jit cache cannot grow unboundedly."""
    while n > 0:
        if n >= cap:
            yield cap
            n -= cap
            continue
        p = min_chunk
        while p * 2 <= n:
            p *= 2
        yield min(p, n)
        n -= min(p, n)


def build_allowed_arrays(feats_list: Sequence[np.ndarray],
                         allowed_fn: Callable[[np.ndarray], List[np.ndarray]],
                         b: int, nb: int, v: int):
    """Union table of allowed-support rows across a batch; per-node bucket
    ids index into it. Row 0 is the full-vocab fallback (padding rows)."""
    rows: List[np.ndarray] = [np.ones(v, np.float32)]
    row_key: Dict[bytes, int] = {}
    bucket = np.zeros((b, nb), np.int32)
    for row, feats in enumerate(feats_list):
        supports = allowed_fn(feats)
        for node, allowed in enumerate(supports):
            mask = np.zeros(v, np.float32)
            mask[np.asarray(allowed, np.int64)] = 1.0
            key = mask.tobytes()
            if key not in row_key:
                row_key[key] = len(rows)
                rows.append(mask)
            bucket[row, node] = row_key[key]
    return bucket, np.stack(rows)


class LatticeSampler:
    def __init__(self, model: EdgeDenoise, params, beam_size: int = 5,
                 can_assemble: Optional[Callable[[TreeState, int], bool]] = None,
                 refine_hook=None,
                 allowed_fn: Optional[Callable[[np.ndarray], List[np.ndarray]]] = None,
                 retry_final_gate: bool = True,
                 rng=None,
                 mesh=None,
                 hbm_budget_bytes: int = 2 << 30,
                 max_chunk: Optional[int] = None,
                 buckets: Optional[Sequence[int]] = None,
                 native_search: bool = True,
                 refine_group_cap: int = 32,
                 refine_merge: int = 1):
        """allowed_fn(blur_feats (n,F)) -> per-node allowed vocab index
        arrays (the array_dict/size restriction of ar_sampling.py:62-118);
        None disables the restriction (nosize variant).

        buckets: pad-bucket set (None = collate DEFAULT_BUCKETS). The
        lattice scan length tracks the bucket, so cost is ~N^3 in the pad:
        the finer SAMPLING_BUCKETS set cuts padded N^3 by 1.33x under the
        GEOM histogram.

        refine_group_cap: refine-hook searches run as MANY independent
        molecule-group searches (<= cap molecules each, grouped by size
        bucket) advanced round-robin, so each group's fused check dispatch
        is in flight while other groups' host work and readbacks proceed —
        the refine-on fine stage is dispatch-LATENCY-bound on a tunneled
        TPU (~55+30 ms per round; BASELINE.md), and pipelining across
        groups hides it. 0 restores the single lockstep search (bit-exact
        with the reference rng partitioning).

        refine_merge: same-bucket groups are bundled into LANES of up to
        this many groups that share ONE fused check dispatch per round
        (their fleets are concatenated row-wise). The fused check program
        is row-independent and lanes never straddle pad buckets, so lane
        results are BIT-EXACT vs merge=1 (pinned:
        test_refine_merge_matches_unmerged); merging only cuts the
        per-round dispatch count. Measured (BASELINE.md round-4): the
        interleaved 2048-molecule A/B is NOISE-NEUTRAL across merge 1/8/16,
        and the instrumented 1024-run split showed merged lanes WAIT LONGER
        per readback (fewer independent dispatches in flight = less
        device/host overlap), so 1 (no bundling) is the default; the knob
        stays for many-small-group workloads."""
        if model.gated and not model.dynamic_depth:
            # inference: bound depth scans by actual tree depth (exact under
            # gated=True; see EdgeDenoise.dynamic_depth)
            model = model.clone(dynamic_depth=True)
        self.model = model
        self.params = params
        self.beam_size = beam_size
        self.can_assemble = can_assemble
        self.refine_hook = refine_hook
        self.allowed_fn = allowed_fn
        self.retry_final_gate = retry_final_gate
        self.rng = rng
        self.mesh = mesh
        self.hbm_budget = hbm_budget_bytes
        self.max_chunk = max_chunk
        self.buckets = tuple(buckets) if buckets else DEFAULT_BUCKETS
        self.native_search = native_search
        self.refine_group_cap = refine_group_cap
        self.refine_merge = refine_merge
        self._fn_cache: Dict[tuple, Callable] = {}

    # --- device side ---------------------------------------------------------

    def _max_batch(self, nb: int) -> int:
        # ~6 live (B, N, N, H) f32 tensors inside the scan body
        per_item = nb * nb * self.model.hidden_nf * 4 * 6
        b = max(4, self.hbm_budget // per_item)
        if self.mesh is not None:
            d = self.mesh.devices.size
            b = max(d, (b // d) * d)
        # 512 measured best on one chip (2048-molecule cap sweep: 256 ->
        # 279.7, 512 -> 297.4, 1024 -> 296.6, 2048 -> 240.8 trees/s)
        cap = self.max_chunk or (512 if self.mesh is None else 2048)
        return int(min(cap, b))

    def _fn(self, nb: int, b: int, with_allowed: bool):
        key = (nb, b, with_allowed)
        if key not in self._fn_cache:
            model = self.model

            def run(params, feats, pos, nmask, bucket=None, table=None):
                out = model.apply(params, feats, pos, nmask,
                                  allowed_bucket=bucket, allowed_table=table,
                                  method=EdgeDenoise.ar_lattice)
                # Pack all five outputs into ONE (B, S, 3+2K) f32 matrix: a
                # tunneled TPU pays ~20-30 ms per RETURNED ARRAY on top of the
                # dispatch, so the chunk readback must be a single transfer
                # (same trick as RefineHook._fused_fn). ints here are < 2^24,
                # exactly representable in f32.
                f32 = lambda a: a.astype(jnp.float32)
                return jnp.concatenate([
                    f32(out["focal"])[..., None],
                    f32(out["target"])[..., None],
                    f32(out["did_attach"])[..., None],
                    f32(out["top_wid"]),
                    f32(out["top_logp"]),
                ], axis=-1)

            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                data = NamedSharding(self.mesh, P("data"))
                repl = NamedSharding(self.mesh, P())
                in_sh = (repl, data, data, data) + ((data, repl) if with_allowed else ())
                self._fn_cache[key] = jax.jit(run, in_shardings=in_sh)
            else:
                self._fn_cache[key] = jax.jit(run)
        return self._fn_cache[key]

    def _dispatch_lattices(self, blur_sets, indices) -> List[tuple]:
        """Async half: pack + dispatch one lattice program per (bucket,
        pow2 chunk) over ``indices``; returns [(chunk, dev), ...] in
        dispatch order (device executes in order). JAX dispatch is async, so
        host packing of chunk k+1 overlaps device compute of chunk k."""
        by_bucket: Dict[int, List[int]] = {}
        for i in indices:
            by_bucket.setdefault(
                bucket_for(blur_sets[i]["h"].shape[0], self.buckets), []).append(i)
        pending = []
        for nb, idxs in sorted(by_bucket.items()):
            cap = self._max_batch(nb)
            # off-mesh: greedy pow2 chunking (no padded-row waste on the
            # trailing chunk); on-mesh: fixed cap so shards stay even
            takes = (pow2_chunks(len(idxs), cap) if self.mesh is None
                     else [min(cap, len(idxs) - c) for c in range(0, len(idxs), cap)])
            c0 = 0
            for take in takes:
                chunk = idxs[c0: c0 + take]
                c0 += take
                b = _next_pow2(len(chunk)) if self.mesh is None else cap
                f = blur_sets[chunk[0]]["h"].shape[1]
                feats = np.zeros((b, nb, f), np.float32)
                pos = np.zeros((b, nb, 3), np.float32)
                nmask = np.zeros((b, nb, 1), np.float32)
                for row, i in enumerate(chunk):
                    n = blur_sets[i]["h"].shape[0]
                    feats[row, :n] = blur_sets[i]["h"]
                    pos[row, :n] = blur_sets[i]["x"]
                    nmask[row, :n] = 1.0
                args = [jnp.asarray(feats), jnp.asarray(pos), jnp.asarray(nmask)]
                with_allowed = self.allowed_fn is not None
                if with_allowed:
                    bucket, table = build_allowed_arrays(
                        [blur_sets[i]["h"] for i in chunk], self.allowed_fn,
                        b, nb, self.model.out_node_nf)
                    args += [jnp.asarray(bucket), jnp.asarray(table)]
                dev = self._fn(nb, b, with_allowed)(self.params, *args)
                try:
                    dev.copy_to_host_async()
                except Exception:
                    pass
                pending.append((chunk, dev))
        return pending

    @staticmethod
    def _collect_lattice(chunk, out, blur_sets, lattices) -> None:
        """Blocking half: unpack one chunk's packed readback into
        per-molecule MoleculeLattice entries."""
        out = np.asarray(out)                 # ONE readback per chunk
        k = (out.shape[-1] - 3) // 2
        for row, i in enumerate(chunk):
            n = blur_sets[i]["h"].shape[0]
            o = out[row, :n]
            lattices[i] = MoleculeLattice(
                focal=o[:, 0].astype(np.int32),
                target=o[:, 1].astype(np.int32),
                attach=o[:, 2] > 0.5,
                top_wid=o[:, 3:3 + k].astype(np.int64),
                top_logp=o[:, 3 + k:])

    def compute_lattices(self, blur_sets: Sequence[Dict[str, np.ndarray]]
                         ) -> Dict[int, MoleculeLattice]:
        """Group molecules by size bucket, pad, and run the scan per chunk."""
        pending = self._dispatch_lattices(blur_sets, range(len(blur_sets)))
        lattices: Dict[int, MoleculeLattice] = {}
        for chunk, out in pending:
            self._collect_lattice(chunk, out, blur_sets, lattices)
        return lattices

    # --- host search ----------------------------------------------------------

    def sample(self, blur_sets: Sequence[Dict[str, np.ndarray]]
               ) -> List[Optional[TreeState]]:
        """Assemble junction trees for a batch of coarse samples.

        blur_sets: per molecule {'x': (n,3), 'h': (n,F)} (h integer-rounded
        as in ar_sampling_nosize.py:388). Returns the best completed tree per
        molecule (None on failure).
        """
        if not blur_sets:
            return []
        lattices = self.compute_lattices(blur_sets)
        return self._search(blur_sets, lattices)

    def sample_streamed(self, feeder) -> List[Optional[TreeState]]:
        """Stage-1/2 OVERLAPPED assembly: consume coarse chunks from
        ``feeder`` as they land instead of waiting for the whole coarse
        stage.

        feeder protocol (see pipeline._BlurFeeder): ``total`` (molecule
        count), ``blur`` (the per-molecule dict list the feeder fills),
        ``pump()`` — non-blocking; tops up the in-flight coarse dispatch
        budget, absorbs newly-ready chunks into ``blur`` and returns their
        index lists; ``collect_next()`` — blocking variant; ``done`` — all
        chunks collected.

        Each arrived chunk's lattice program is dispatched immediately, and
        (refine-on, native-eligible) its molecule groups join the shared
        round-robin loop — fine-stage rounds then interleave with the
        REMAINING coarse chunks' device programs, so the fine stage's
        dominant cost on a tunneled TPU (dispatch/readback latency + host
        walk, BASELINE.md round-4 split) hides under coarse device compute
        instead of serializing after it. The reference has no equivalent
        (three sequential scripts, readme.md:40-66).

        Results vs the unoverlapped ``sample()``: per-bucket pooling
        reproduces the serial group partition for any feeder that delivers
        molecules in index order (the coarse chunk plan always does), and
        ``_group_seed`` ties each group's rng to the group's identity rather
        than its creation order — BIT-exact when the per-arrival lattice
        programs also run at the same batch shapes, and equal up to the
        measured ~2e-6 f32 batch-shape rounding in lattice logits when a
        bucket's molecules arrive split differently (decision flips from
        that rounding are possible in principle — distribution-equivalent,
        the usual bucket-chunking argument). Pinned both ways:
        tests/test_runtime.py test_sample_streamed_matches_sample."""
        from collections import deque

        total = feeder.total
        blur_sets = feeder.blur
        if not total:
            return []
        use_refine_loop = self._refine_native_eligible()
        if self.refine_hook is not None and not use_refine_loop:
            # no incremental driver for the Python refine path: collect
            # everything, then run the serial search (correct, unoverlapped)
            while not feeder.done:
                feeder.collect_next()
            return self.sample(blur_sets)
        lattices: Dict[int, MoleculeLattice] = {}
        results: List[Optional[TreeState]] = [None] * total
        loop = (_NativeRefineLoop(self, blur_sets, results)
                if use_refine_loop else None)
        pending_lat = deque()

        def on_chunks(chunks):
            for idxs in chunks:
                pending_lat.extend(self._dispatch_lattices(blur_sets, idxs))

        # per-bucket pools: emit a group the moment ``cap`` members are
        # available, keep the (<cap) remainders pooled until every lattice
        # has landed. Grouping per ARRIVED CHUNK instead would make each
        # (coarse chunk x bucket) tail its own undersized group — measured
        # 2.2x t_fine at 128 molecules (more fused-check dispatches, each
        # paying the ~55 ms tunnel latency, on less-full fleets).
        pools: Dict[int, List[int]] = {}
        flushed = False

        def absorb_lattice(item):
            chunk, out = item
            self._collect_lattice(chunk, out, blur_sets, lattices)
            if loop is not None:
                # lattice chunks are bucket-homogeneous by construction
                gbucket = bucket_for(blur_sets[chunk[0]]["h"].shape[0],
                                     self.buckets)
                pool = pools.setdefault(gbucket, [])
                pool.extend(chunk)
                cap = self.refine_group_cap
                while len(pool) >= cap:
                    loop.add_group(pool[:cap], gbucket, lattices)
                    del pool[:cap]

        while True:
            on_chunks(feeder.pump())
            while pending_lat and getattr(
                    pending_lat[0][1], "is_ready", lambda: False)():
                absorb_lattice(pending_lat.popleft())
            if loop is not None and feeder.done and not pending_lat \
                    and not flushed:
                # remainder flush in sorted-bucket order = the serial
                # grouping whenever each bucket held < cap molecules (the
                # pinned parity case); larger buckets' remainders land after
                # the full groups instead of interleaved (seed re-partition,
                # distribution-equivalent)
                flushed = True
                for nb in sorted(pools):
                    if pools[nb]:
                        loop.add_group(pools[nb], nb, lattices)
                        pools[nb] = []
            if loop is not None and not loop.empty:
                loop.step_one()
            elif not feeder.done:
                on_chunks(feeder.collect_next())
            elif pending_lat:
                absorb_lattice(pending_lat.popleft())   # blocking readback
            else:
                break
        if loop is not None:
            loop.drain()
            return results
        return self._search(blur_sets, lattices)

    def _refine_native_eligible(self) -> bool:
        """Native refine-search eligibility: gates must be verdict-style
        (pure functions of (wid, sorted neighbor wids) the C++ can memoize
        over a callback), and the hook must pad with the SAME bucket set —
        the Python path derives each dispatch's pad from hook.buckets, and
        bit-parity needs the native group bucket to equal it."""
        if self.refine_hook is None or not self.refine_group_cap:
            return False
        hook_gate = self.refine_hook.can_assemble
        if not (self.native_search
                and os.environ.get("HIERDIFF_REFINE_NATIVE", "1") != "0"
                and tuple(self.refine_hook.buckets) == self.buckets
                and (self.can_assemble is None
                     or hasattr(self.can_assemble, "verdict"))
                and (hook_gate is None or hasattr(hook_gate, "verdict"))):
            return False
        from hierdiff_tpu import runtime
        return runtime.treekit_available()

    def _search(self, blur_sets, lattices) -> List[Optional[TreeState]]:
        """Host beam search over precomputed lattices (stage-2 tail)."""
        if (self.refine_hook is None and self.native_search
                and (self.can_assemble is None
                     or hasattr(self.can_assemble, "verdict"))):
            from hierdiff_tpu import runtime
            if runtime.treekit_available():
                return self._sample_native(blur_sets, lattices)
        if self.refine_hook is not None and self.refine_group_cap:
            if self._refine_native_eligible():
                return self._sample_refine_native(blur_sets, lattices)
            return self._sample_refine_pipelined(blur_sets, lattices)
        search = PQBeamSearch(
            LatticeExpander(lattices), beam_size=self.beam_size,
            can_assemble=self.can_assemble, refine_hook=self.refine_hook,
            rng=self.rng, retry_final_gate=self.retry_final_gate)
        return search.run(self._init_states(blur_sets, range(len(blur_sets))))

    @staticmethod
    def _init_states(blur_sets, indices) -> List[TreeState]:
        init = []
        for idx in indices:
            jt = blur_sets[idx]
            n = jt["h"].shape[0]
            init.append(TreeState(
                feats=np.asarray(jt["h"], np.float32),
                pos=np.asarray(jt["x"], np.float32),
                adj=np.zeros((n, n), np.float32),
                wids=np.full(n, -1, np.int64),
                index=idx))
        return init

    def _sample_refine_pipelined(self, blur_sets, lattices
                                 ) -> List[Optional[TreeState]]:
        """Refine-on search as pipelined molecule-group searches.

        The refine hook needs one fused device dispatch per fleet round; a
        single lockstep search serializes round latency (~85 ms dispatch +
        readback through the tunnel) with the host walk. Here molecules are
        grouped by size bucket into groups of <= ``refine_group_cap``; each
        group runs its own PQBeamSearch as a generator
        (beam.PQBeamSearch.run_rounds) and the event loop keeps every live
        group's fused check DISPATCHED while collecting them round-robin —
        device programs queue back-to-back and readbacks (enqueued eagerly
        via copy_to_host_async) overlap the other groups' host work.

        Per-group searches are seeded by ``_group_seed`` (one master draw
        mixed with the group's first molecule index — order-independent), so
        results are deterministic for a fixed (molecule set, grouping, seed)
        but re-partition the rng tiebreak stream vs the lockstep search —
        distribution-equivalent, same situation as the coarse stage's
        bucket-chunked rng. Pipelining itself is bit-exact: execution order
        WITHIN a group is unchanged
        (pinned by test_refine_pipelined_matches_sequential_groups)."""
        import random as _random
        from collections import deque

        master = self.rng if self.rng is not None else _random.Random(2022)
        seed_base = master.getrandbits(64)
        # group bucket = the sampler bucket the group was formed under —
        # lanes never straddle buckets so that the merged dispatch's pad
        # bucket equals every member group's own (all of a group's
        # molecules sit in (prev_bucket, bucket], so the hook's nb is the
        # group bucket whichever states are active) — that is what makes
        # lane merging BIT-exact, not just pad-invariant-close
        group_defs = self._refine_groups(blur_sets)

        hook = self.refine_hook
        expander = LatticeExpander(lattices)
        results: List[Optional[TreeState]] = [None] * len(blur_sets)

        def finish(members, values):
            for i, r in zip(members, values):
                results[i] = r

        items = []   # live (bucket, gen, members, fleet) at their 1st yield
        for members, gbucket in group_defs:
            search = PQBeamSearch(
                expander, beam_size=self.beam_size,
                can_assemble=self.can_assemble, refine_hook=hook,
                rng=_random.Random(_group_seed(seed_base, members)),
                retry_final_gate=self.retry_final_gate)
            gen = search.run_rounds(self._init_states(blur_sets, members))
            try:
                fleet = next(gen)
            except StopIteration as e:
                finish(members, e.value)
                continue
            items.append((gbucket, gen, members, fleet))

        def dispatch_lane(lane):
            # one fused dispatch for the whole lane: the fused check is
            # row-independent, so concatenating same-bucket fleets is
            # bit-exact per group while dividing the dispatch count
            return hook.dispatch_batch(
                [s for (_b, _g, _m, fleet) in lane for s in fleet])

        # keep >=4 lanes in flight: merging trades dispatch COUNT for
        # in-flight depth, and with few groups a big merge collapses the
        # pipeline back into the lockstep latency chain it exists to avoid
        merge = max(1, min(int(self.refine_merge or 1), len(items) // 4))
        queue = deque()
        lane: List[tuple] = []
        for it in items:
            if lane and (len(lane) >= merge or lane[0][0] != it[0]):
                queue.append((lane, dispatch_lane(lane)))
                lane = []
            lane.append(it)
        if lane:
            queue.append((lane, dispatch_lane(lane)))

        while queue:
            lane, token = queue.popleft()
            states = [s for (_b, _g, _m, fleet) in lane for s in fleet]
            checked = hook.collect_batch(token, states)
            nxt, off = [], 0
            for gbucket, gen, members, fleet in lane:
                part = checked[off: off + len(fleet)]
                off += len(fleet)
                try:
                    fleet = gen.send(part)
                except StopIteration as e:
                    finish(members, e.value)
                    continue
                nxt.append((gbucket, gen, members, fleet))
            if nxt:
                queue.append((nxt, dispatch_lane(nxt)))
        return results

    def _sample_native(self, blur_sets, lattices) -> List[Optional[TreeState]]:
        """No-refine-hook fast path: the whole PQ search in C++
        (runtime/treekit.cpp tk_beam_search_lattice) — BIT-EXACT with the
        Python search including the rng tiebreak stream (the caller rng's
        Mersenne state is continued and written back; parity pinned in
        tests/test_runtime.py). ~60x less host time at GEOM sizes."""
        import random as _random

        from hierdiff_tpu import runtime

        sizes = [jt["h"].shape[0] for jt in blur_sets]
        rng = self.rng if self.rng is not None else _random.Random(2022)
        verdict = getattr(self.can_assemble, "verdict", None)
        wids, ok, logp = runtime.beam_search_lattice_native(
            lattices, sizes, self.beam_size, rng, verdict=verdict,
            retry_final_gate=self.retry_final_gate)
        return [self._tree_from_lattice(blur_sets, lattices, i, wids[i],
                                        float(logp[i])) if ok[i] else None
                for i in range(len(blur_sets))]

    @staticmethod
    def _tree_from_lattice(blur_sets, lattices, i: int, wids: np.ndarray,
                           logp: float) -> TreeState:
        """Completed TreeState from a finished native search: topology is the
        full lattice trajectory, wids/logp come from the search."""
        jt = blur_sets[i]
        n = jt["h"].shape[0]
        lat = lattices[i]
        adj = np.zeros((n, n), np.float32)
        last_edge = None
        for t in range(n):
            if lat.attach[t]:
                f, tg = int(lat.focal[t]), int(lat.target[t])
                adj[f, tg] = adj[tg, f] = 1.0
                last_edge = (f, tg)
        if last_edge is None and n > 0:
            adj[0, 0] = 1.0     # n==1: the root marker is never cleared
        return TreeState(
            feats=np.asarray(jt["h"], np.float32),
            pos=np.asarray(jt["x"], np.float32),
            adj=adj, wids=wids, logp=logp, index=i, last_edge=last_edge)

    def _refine_groups(self, blur_sets) -> List[tuple]:
        """(members, bucket) groups for the refine-on searches: molecules
        grouped by pad bucket, <= refine_group_cap per group. Shared by the
        Python pipelined and the native (C++) search so their group seeds
        (``_group_seed``) partition identically."""
        by_bucket: Dict[int, List[int]] = {}
        for idx, jt in enumerate(blur_sets):
            by_bucket.setdefault(
                bucket_for(jt["h"].shape[0], self.buckets), []).append(idx)
        out: List[tuple] = []
        for nb, idxs in sorted(by_bucket.items()):
            for c0 in range(0, len(idxs), self.refine_group_cap):
                out.append((idxs[c0: c0 + self.refine_group_cap], nb))
        return out

    def _sample_refine_native(self, blur_sets, lattices
                              ) -> List[Optional[TreeState]]:
        """Refine-on search with the whole HOST side in C++
        (runtime.NativeRefineSearch over treekit tk_rsearch_*): per group,
        the native state machine owns the priority queues, the packed-result
        walk (swap commit + gates) and the lattice expansions; Python only
        pads each returned fleet and runs RefineHook._fused_fn — ONE fused
        dispatch per group round, pipelined round-robin across groups
        exactly like ``_sample_refine_pipelined`` (whose host share —
        ~40% of t_fine at 1024 molecules, BASELINE.md — this removes).

        BIT-EXACT with the Python pipelined search for the same seed
        (pinned: tests/test_runtime.py test_native_refine_search_parity):
        same grouping/seed partition, same fleet composition per round, and
        the fused-check inputs are identical, so the device results and the
        walk/expansion decisions coincide stream-for-stream."""
        results: List[Optional[TreeState]] = [None] * len(blur_sets)
        loop = _NativeRefineLoop(self, blur_sets, results)
        for members, gbucket in self._refine_groups(blur_sets):
            loop.add_group(members, gbucket, lattices)
        loop.drain()
        return results


class _NativeRefineLoop:
    """Event loop for native refine-on group searches, factored so groups can
    be added INCREMENTALLY: ``_sample_refine_native`` adds every group up
    front (preserving the pinned bit-exact order), while
    ``LatticeSampler.sample_streamed`` adds groups as their molecules' coarse
    chunks land — the round dispatches then interleave with the NEXT coarse
    chunks' device programs, hiding the fine stage's tunnel latency under
    coarse compute (stage-1/2 overlap).

    Group seeds come from ``_group_seed`` (one master draw mixed with the
    group's first molecule index) — a pure function of the group's identity,
    NOT of ``add_group`` order, so the streamed driver's arrival-order group
    creation draws the same per-group streams as the serial driver's
    bucket-order creation whenever the group PARTITION matches (pinned:
    tests/test_runtime.py test_sample_streamed_matches_sample). Different
    groupings (another cap) re-partition the rng stream
    (distribution-equivalent, same argument as coarse bucket chunking).

    LANE MERGING (round-5, the gated/backtracking lever): under the
    assembly gate the searches backtrack, so fleets shrink to a few active
    rows while round counts balloon — the round-5 profile measured a MEAN
    fleet of ~2 rows over 565 rounds at 64 molecules / 20% rejection, i.e.
    the fine stage's wall is per-dispatch host overhead, not device work.
    The loop therefore merges SAME-BUCKET groups' fleets into one
    ``dispatch_arrays`` call, bounded by ``fleet_chunk_rows`` so a lane is
    still (at most) ONE device program — device-side structure is unchanged
    vs solo dispatches (this is what made the round-4 Python-path lane
    merge neutral-at-best: its lanes spanned multiple device chunks and
    collapsed the in-flight depth; the row bound avoids that by
    construction). Small fleets are HELD in a per-bucket ready list while
    other lanes are in flight (they merge with whatever lands next) and
    flushed unconditionally when nothing is in flight, so progress is
    guaranteed. Per-group step inputs are unchanged — the fused check is
    row-independent and pad-invariant (pinned:
    test_refine_merge_matches_unmerged) — so lane composition does not
    change results: the native-vs-Python and streamed-vs-serial bit-parity
    pins still hold."""

    def __init__(self, sampler: "LatticeSampler", blur_sets, results):
        import random as _random
        from collections import deque

        self.s = sampler
        self.blur_sets = blur_sets
        self.results = results
        self.hook = sampler.refine_hook
        self.master = sampler.rng if sampler.rng is not None else _random.Random(2022)
        self.seed_base = self.master.getrandbits(64)
        self.verdict = getattr(sampler.can_assemble, "verdict", None)
        self.hook_verdict = (getattr(self.hook.can_assemble, "verdict", None)
                             if self.hook.can_assemble is not None else None)
        # queue: in-flight lanes ([(group, rows_at_dispatch), ...], pending);
        # ready: per-bucket groups awaiting a (possibly merged) dispatch
        self.queue = deque()
        self.ready: Dict[int, List[dict]] = {}
        self.merge = os.environ.get("HIERDIFF_REFINE_LANE_MERGE", "1") != "0"

    @property
    def empty(self) -> bool:
        return not self.queue and not any(self.ready.values())

    def add_group(self, members, gbucket: int, lattices) -> None:
        import random as _random

        from hierdiff_tpu import runtime

        hook = self.hook
        grng = _random.Random(_group_seed(self.seed_base, members))
        sizes = [self.blur_sets[i]["h"].shape[0] for i in members]
        f = self.blur_sets[members[0]]["h"].shape[1]
        feats = np.zeros((len(members), gbucket, f), np.float32)
        pos = np.zeros((len(members), gbucket, 3), np.float32)
        nmask = np.zeros((len(members), gbucket, 1), np.float32)
        for r, i in enumerate(members):
            n = sizes[r]
            feats[r, :n] = self.blur_sets[i]["h"]
            pos[r, :n] = self.blur_sets[i]["x"]
            nmask[r, :n] = 1.0
        g = {"members": members, "bucket": gbucket, "lattices": lattices,
             "K": max(1, int(gbucket * hook.check_frac)),
             "feats": feats, "pos": pos, "nmask": nmask,
             "ns": runtime.NativeRefineSearch(
                 lattices, members, sizes, self.s.beam_size, grng, gbucket,
                 hook.check_frac, verdict=self.verdict,
                 hook_verdict=self.hook_verdict,
                 retry_final_gate=self.s.retry_final_gate)}
        g["S"] = g["ns"].step(None, g["K"])
        if g["S"] == 0:
            self._finish(g)
            return
        self._enqueue(g)
        self._flush()

    def _finish(self, g) -> None:
        wids_list, ok, logp = g["ns"].finish()
        for r, i in enumerate(g["members"]):
            if ok[r]:
                self.results[i] = LatticeSampler._tree_from_lattice(
                    self.blur_sets, g["lattices"], i, wids_list[r],
                    float(logp[r]))

    def _enqueue(self, g) -> None:
        self.ready.setdefault(g["bucket"], []).append(g)

    def _flush(self) -> None:
        """Form lanes from the ready groups and dispatch them. A lane packs
        same-bucket fleets up to ``fleet_chunk_rows`` (one device program).
        While other lanes are in flight, only lanes reaching half the row
        bound dispatch — smaller fleets wait for merge partners; with
        nothing in flight everything dispatches (progress guarantee)."""
        for nb, gs in self.ready.items():
            if not gs:
                continue
            cap = self.hook.fleet_chunk_rows(nb) if self.merge else 0
            while gs:
                rows = sum(g["S"] for g in gs)
                if self.queue and self.merge and rows < max(1, cap // 2):
                    break   # hold: merge partners will land next ticks
                lane, lrows = [], 0
                while gs and (not lane or lrows + gs[0]["S"] <= cap):
                    g = gs.pop(0)
                    lane.append(g)
                    lrows += g["S"]
                self.queue.append((
                    [(g, g["S"]) for g in lane],
                    self._dispatch_lane(lane, nb)))
                self.hook.stats["lanes"] = self.hook.stats.get("lanes", 0) + 1

    def _fleet_arrays(self, g):
        ns, s_rows = g["ns"], g["S"]
        mol = ns.fleet_mol[:s_rows]
        return (g["feats"][mol], g["pos"][mol],
                np.ascontiguousarray(ns.fleet_adj[:s_rows]),
                g["nmask"][mol],
                np.ascontiguousarray(ns.fleet_wids[:s_rows]))

    def _dispatch_lane(self, lane, nb: int):
        """Pad + dispatch the lane's concatenated fleets through the hook's
        shared chunk/pad policy (RefineHook.dispatch_arrays — ONE code path
        with dispatch_batch, so the _fused_fn padding contract cannot
        skew)."""
        parts = [self._fleet_arrays(g) for g in lane]
        if len(parts) == 1:
            feats, pos, adj, nmask, wids = parts[0]
        else:
            feats, pos, adj, nmask, wids = (
                np.concatenate([p[i] for p in parts]) for i in range(5))
        return self.hook.dispatch_arrays(nb, feats, pos, adj, nmask, wids)

    def step_one(self) -> None:
        """Advance the OLDEST in-flight lane one round (blocking on its
        fused-check readback; all other lanes' dispatches stay in flight),
        stepping every member group and re-queueing the survivors."""
        import time as _time

        hook = self.hook
        if not self.queue:
            self._flush()
        lane, pending = self.queue.popleft()
        t0 = _time.perf_counter()
        packed = np.concatenate(
            [np.asarray(dev)[:cnt] for cnt, dev in pending]
        ) if pending else None
        t1 = _time.perf_counter()
        hook.stats["collect_s"] += t1 - t0
        hook.stats["score_s"] += t1 - t0
        off = 0
        for g, cnt in lane:
            rows = packed[off: off + cnt] if packed is not None else None
            off += cnt
            g["S"] = g["ns"].step(rows, g["K"])
            hook.stats["rounds"] += 1
            hook.stats["fleet_rows"] += int(g["S"])
            if g["S"] == 0:
                self._finish(g)
            else:
                self._enqueue(g)
        hook.stats["walk_s"] += _time.perf_counter() - t1
        self._flush()

    def drain(self) -> None:
        while not self.empty:
            self.step_one()
