"""Beam-search refine perturbation: the check_tree hook.

Rebuild of ``Node2Vec.check_tree`` (models/model_refine.py:175-249): during
beam search, re-score every ASSIGNED node of each candidate tree with the
refine model (mask the node, size-restricted softmax), and if swapping the
lowest-probability mispredicted node to the model's top choice raises the
tree's total log-probability (and passes the optional assembly gate), commit
the swap and skip the tree's expansion this round.

Device work is one batched call per fleet round: the host packs ONE set of
per-STATE arrays (feats/pos/adj, plus the current wid row), and the device
program expands every state to all of its masked-node variants, runs
``NodeRefine.check_logits`` over the whole (state x node) grid, applies the
size-restricted log-softmax on device, and returns only the per-node
current-wid log-probability and top-1 proposal — (S, N) scalars instead of
the (jobs, 780) logits matrix. vs the reference's per-tree per-node loops
this removes both the per-job host packing (S vs S*N python iterations) and
~780x of the device->host transfer per round, the two measured hot spots of
the refine-on pipeline after round 3's pow2 padding fix.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hierdiff_tpu.data.collate import DEFAULT_BUCKETS, bucket_for
from hierdiff_tpu.data.refine import size_support_indices
from hierdiff_tpu.models.refine import MASK_TOKEN, NodeRefine
from hierdiff_tpu.sampling.ar import TreeState


class RefineHook:
    def __init__(self, model: NodeRefine, params, vocab_sizes: np.ndarray,
                 check_frac: float = 0.1,
                 can_assemble: Optional[Callable[[TreeState, int], bool]] = None,
                 buckets: Optional[Sequence[int]] = None):
        """vocab_sizes: heavy-atom count per vocab index (Vocab.mol_sizes).

        buckets: pad-bucket set for fleet batches (None = collate
        DEFAULT_BUCKETS; the fleet pads to the bucket of its max-n state)."""
        if model.gated and not model.dynamic_depth:
            # inference-only depth bound (see NodeRefine.dynamic_depth)
            model = model.clone(dynamic_depth=True)
        self.model = model
        self.params = params
        self.vocab_sizes = np.asarray(vocab_sizes)
        self.check_frac = check_frac
        self.can_assemble = can_assemble
        self.buckets = tuple(buckets) if buckets else DEFAULT_BUCKETS
        self._fn_cache: Dict[int, Callable] = {}
        self._support_cache: Dict[int, np.ndarray] = {}
        self._states_fn_cache: Dict[tuple, Callable] = {}
        self._size_table_cache: Optional[np.ndarray] = None
        # lightweight perf counters (negligible overhead; refine_ab --stats
        # and HIERDIFF_BENCH_STATS=1 in bench.py). score_s = dispatch_s +
        # collect_s for the fused path; collect_s is the BLOCKING readback
        # wait (device execution still pending counts here), dispatch_s the
        # host-side pack-and-enqueue cost.
        self.stats = {"pack_s": 0.0, "pack_calls": 0, "score_s": 0.0,
                      "score_calls": 0, "score_rows": 0, "host_s": 0.0,
                      "dispatch_s": 0.0, "collect_s": 0.0, "walk_s": 0.0,
                      # group-search round shape (native loop): rounds =
                      # per-group step calls, fleet_rows = active states
                      # walked (fleet_rows/rounds = mean fleet size), lanes =
                      # merged dispatches (rounds/lanes = groups per lane —
                      # the gated/backtracking lever, see _NativeRefineLoop)
                      "rounds": 0, "fleet_rows": 0, "lanes": 0}

    def _fn(self, n: int):
        if n not in self._fn_cache:
            model = self.model

            @jax.jit
            def run(params, feats, vocab, size, pos, adj, nmask, pad_idx, val):
                return model.apply(params, feats, vocab, size, pos, adj, nmask,
                                   pad_idx, val, method=NodeRefine.check_logits)

            self._fn_cache[n] = run
        return self._fn_cache[n]

    def _support(self, size: int) -> np.ndarray:
        if size not in self._support_cache:
            self._support_cache[size] = np.asarray(
                size_support_indices(size, self.model.vocab_size), np.int64)
        return self._support_cache[size]

    def _support_mask(self, size: int) -> np.ndarray:
        key = ("mask", size)
        if key not in self._support_cache:
            m = np.zeros(self.model.vocab_size, bool)
            m[self._support(size)] = True
            self._support_cache[key] = m
        return self._support_cache[key]

    # --- per-state device scoring (all masked-node variants in one call) ----

    def _size_table(self) -> np.ndarray:
        """(max_size+1, V) restricted-support rows indexed by heavy-atom
        count — the device-side form of ``_support_mask`` (same
        ``size_support_indices`` fallback semantics)."""
        if self._size_table_cache is None:
            rows = [self._support_mask(s).astype(np.float32)
                    for s in range(int(self.vocab_sizes.max()) + 1)]
            self._size_table_cache = np.stack(rows)
        return self._size_table_cache

    def _states_fn(self, nb: int, sp: int):
        """Jitted fleet scorer at (bucket nb, padded fleet sp): expands each
        state to its nb masked-node variants ON DEVICE, scores them with
        ``check_logits``, applies the size-restricted log-softmax (support =
        size-table row of the current wid's size, current wid force-included
        like the reference's append), and returns per-node
        (logp of current wid, top-1 proposal) — (S, N) each."""
        key = (nb, sp)
        if key not in self._states_fn_cache:
            model = self.model

            @jax.jit
            def run(params, feats, wids, size, pos, adj, nmask, table):
                s, n, f = feats.shape
                v = model.vocab_size
                eye = jnp.eye(n, dtype=feats.dtype)
                # variant i of state s masks node i: zero its features, set
                # its vocab id to MASK_TOKEN (what _score_nodes does per job)
                feats_e = feats[:, None, :, :] * (1.0 - eye)[None, :, :, None]
                vocab_e = jnp.where(eye[None, :, :] > 0, MASK_TOKEN,
                                    wids[:, None, :].astype(jnp.int32))
                size_e = jnp.broadcast_to(size[:, None, :], (s, n, n))
                pos_e = jnp.broadcast_to(pos[:, None], (s, n, n, 3))
                adj_e = jnp.broadcast_to(adj[:, None], (s, n, n, n))
                nmask_e = jnp.broadcast_to(nmask[:, None], (s, n, n, 1))
                pad_idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None],
                                           (s, n))
                val = jnp.sum(adj, axis=2)                   # (S, N) degrees
                rs = lambda a: a.reshape((s * n,) + a.shape[2:])
                logits = model.apply(params, rs(feats_e), rs(vocab_e),
                                     rs(size_e), rs(pos_e), rs(adj_e),
                                     rs(nmask_e), pad_idx.reshape(-1),
                                     val.reshape(-1),
                                     method=NodeRefine.check_logits)
                logits = logits.reshape(s, n, v)
                # restricted log-softmax; `size` is vocab_sizes[clip(wids)]
                # host-side, so table[size] == _support_mask(size_of_cur)
                soh = jax.nn.one_hot(jnp.clip(size, 0, table.shape[0] - 1),
                                     table.shape[0], dtype=logits.dtype)
                support = jnp.einsum("snr,rv->snv", soh, table)
                coh = jax.nn.one_hot(jnp.clip(wids, 0, v - 1), v,
                                     dtype=logits.dtype)
                support = jnp.maximum(support, coh)
                from hierdiff_tpu.ops.masked import masked_log_softmax
                lp = masked_log_softmax(logits, support)
                logp_cur = jnp.sum(lp * coh, axis=-1)
                top = jnp.argmax(lp, axis=-1)
                return logp_cur, top

            self._states_fn_cache[key] = run
        return self._states_fn_cache[key]

    def _fused_fn(self, nb: int, sp: int):
        """ONE-dispatch check program at (bucket nb, padded fleet sp): pass 1
        scores every masked-node variant (as ``_states_fn``), then the
        CANDIDATE SELECTION — argsort of per-node logps, the front-half /
        top!=current filters, the ``n_check`` cap — runs on device, and the
        K = max(1, int(nb*check_frac)) slots' swap variants are re-scored
        over all their nodes in the SAME program. The host only walks the
        returned slots in order and applies the assembly gate. Measured
        motivation: under gated beam backtracking the fleet shrinks to ~5
        states/call and the ~60-75 ms tunnel dispatch latency dominates
        (refine_ab --stats: 328 dispatches, 24.6 s score time of 28 s wall)
        — this halves the dispatch count per fleet round to one."""
        key = ("fused", nb, sp)
        if key not in self._states_fn_cache:
            model = self.model
            check_frac = self.check_frac
            K = max(1, int(nb * check_frac))
            vsizes = jnp.asarray(self.vocab_sizes, jnp.int32)

            def score_grid(params, feats, vocab_ids, pos, adj, nmask, table):
                """Score all (row, masked-node) variants: rows of any batch
                shape prefix Q -> (Q, N) logp-of-current + top-1 under the
                size-restricted log-softmax."""
                q, n, f = feats.shape
                v = model.vocab_size
                eye = jnp.eye(n, dtype=feats.dtype)
                feats_e = feats[:, None, :, :] * (1.0 - eye)[None, :, :, None]
                vocab_e = jnp.where(eye[None, :, :] > 0, MASK_TOKEN,
                                    vocab_ids[:, None, :].astype(jnp.int32))
                # sizes of the CURRENT assignment, via one-hot (no gathers)
                voh = jax.nn.one_hot(jnp.clip(vocab_ids, 0, v - 1), v,
                                     dtype=jnp.float32)
                size = jnp.einsum("qnv,v->qn", voh,
                                  vsizes.astype(jnp.float32)).astype(jnp.int32)
                size_e = jnp.broadcast_to(size[:, None, :], (q, n, n))
                pos_e = jnp.broadcast_to(pos[:, None], (q, n, n, 3))
                adj_e = jnp.broadcast_to(adj[:, None], (q, n, n, n))
                nmask_e = jnp.broadcast_to(nmask[:, None], (q, n, n, 1))
                pad_idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None],
                                           (q, n))
                val = jnp.sum(adj, axis=2)
                rs = lambda a: a.reshape((q * n,) + a.shape[2:])
                logits = model.apply(params, rs(feats_e), rs(vocab_e),
                                     rs(size_e), rs(pos_e), rs(adj_e),
                                     rs(nmask_e), pad_idx.reshape(-1),
                                     val.reshape(-1),
                                     method=NodeRefine.check_logits)
                logits = logits.reshape(q, n, v)
                soh = jax.nn.one_hot(jnp.clip(size, 0, table.shape[0] - 1),
                                     table.shape[0], dtype=logits.dtype)
                support = jnp.einsum("qnr,rv->qnv", soh, table)
                coh = jax.nn.one_hot(jnp.clip(vocab_ids, 0, v - 1), v,
                                     dtype=logits.dtype)
                support = jnp.maximum(support, coh)
                from hierdiff_tpu.ops.masked import masked_log_softmax
                lp = masked_log_softmax(logits, support)
                return jnp.sum(lp * coh, axis=-1), jnp.argmax(lp, axis=-1)

            @jax.jit
            def run(params, feats, wids, pos, adj, nmask, table):
                s, n, _ = feats.shape
                logp_cur, top = score_grid(params, feats, wids, pos, adj,
                                           nmask, table)
                # ---- candidate selection (device mirror of the host walk)
                assigned = (wids >= 0) & (nmask[..., 0] > 0)       # (S, N)
                m = jnp.sum(assigned, axis=1)                       # (S,)
                n_check = jnp.floor(m * check_frac).astype(jnp.int32)
                big = jnp.float32(jnp.inf)
                order = jnp.argsort(jnp.where(assigned, logp_cur, big),
                                    axis=1)                         # (S, N)
                rank = jnp.cumsum(assigned.astype(jnp.int32), axis=1) - 1
                koh = jax.nn.one_hot(order[:, :K], n,
                                     dtype=jnp.float32)             # (S,K,N)
                node_k = order[:, :K].astype(jnp.int32)             # (S, K)
                take = lambda a: jnp.einsum(
                    "skn,sn->sk", koh, a.astype(jnp.float32))
                i_k = take(rank).astype(jnp.int32)
                cur_k = take(wids).astype(jnp.int32)
                top_k = take(top).astype(jnp.int32)
                assigned_k = take(assigned) > 0
                valid = ((jnp.arange(K)[None, :] < n_check[:, None])
                         & (i_k.astype(jnp.float32) < 0.5 * m[:, None])
                         & (top_k != cur_k) & assigned_k)           # (S, K)
                # ---- swap variants: node_k -> top_k where valid
                sel = koh * valid[:, :, None].astype(jnp.float32)   # (S,K,N)
                wids_k = jnp.where(sel > 0,
                                   jnp.broadcast_to(top_k[:, :, None], (s, K, n)),
                                   jnp.broadcast_to(wids[:, None, :], (s, K, n)))
                rs = lambda a: a.reshape((s * K,) + a.shape[2:])
                bc = lambda a: rs(jnp.broadcast_to(a[:, None],
                                                   (s, K) + a.shape[1:]))
                new_logp, _ = score_grid(params, bc(feats), rs(wids_k),
                                         bc(pos), bc(adj), bc(nmask), table)
                new_logp = new_logp.reshape(s, K, n)
                amask = assigned.astype(jnp.float32)
                total = jnp.sum(logp_cur * amask, axis=1)           # (S,)
                new_total = jnp.sum(new_logp * amask[:, None, :], axis=2)
                # ONE packed f32 output: every extra returned array is an
                # extra ~20-30 ms device->host readback through the tunnel
                # (measured: 7 arrays -> 230 ms/dispatch, 1 -> ~60 ms).
                # Columns: [total, node_k*K, wid_k*K, valid*K, new_total*K].
                return jnp.concatenate(
                    [total[:, None], node_k.astype(jnp.float32),
                     top_k.astype(jnp.float32),
                     valid.astype(jnp.float32), new_total], axis=1)

            self._states_fn_cache[key] = run
        return self._states_fn_cache[key]

    def _pack_states(self, states: Sequence[TreeState], nb: int, sp: int):
        """Per-STATE base arrays (reused unchanged across swap rounds)."""
        import time
        t0 = time.perf_counter()
        f = states[0].feats.shape[1]
        feats = np.zeros((sp, nb, f), np.float32)
        pos = np.zeros((sp, nb, 3), np.float32)
        adj = np.zeros((sp, nb, nb), np.float32)
        nmask = np.zeros((sp, nb, 1), np.float32)
        for i, s in enumerate(states):
            n = s.n
            feats[i, :n] = s.feats
            pos[i, :n] = s.pos
            a = s.adj.copy()
            np.fill_diagonal(a, 0)
            adj[i, :n, :n] = a
            nmask[i, :n] = 1.0
        out = (jnp.asarray(feats), jnp.asarray(pos), jnp.asarray(adj),
               jnp.asarray(nmask))
        self.stats["pack_s"] += time.perf_counter() - t0
        self.stats["pack_calls"] += 1
        return out

    def _score_states(self, base, wids_rows: Sequence[np.ndarray],
                      nb: int, sp: int):
        """Score every node of every state in one device call.
        Returns (logp_cur (S, nb), top (S, nb)) numpy arrays."""
        import time
        t0 = time.perf_counter()
        feats, pos, adj, nmask = base
        wids = np.zeros((sp, nb), np.int64)
        for i, w in enumerate(wids_rows):
            wids[i, :len(w)] = w
        size = self.vocab_sizes[np.clip(wids, 0, len(self.vocab_sizes) - 1)]
        logp, top = self._states_fn(nb, sp)(
            self.params, feats, jnp.asarray(wids), jnp.asarray(size, np.int32),
            pos, adj, nmask, jnp.asarray(self._size_table()))
        k = len(wids_rows)
        out = np.asarray(logp)[:k], np.asarray(top)[:k]
        self.stats["score_s"] += time.perf_counter() - t0
        self.stats["score_calls"] += 1
        self.stats["score_rows"] += sp
        return out

    def _dispatch_fused(self, base, wids_rows: Sequence[np.ndarray],
                        nb: int, sp: int):
        """Async half of the fused check: pack + dispatch, do NOT block.
        The device->host copy is enqueued immediately (copy_to_host_async)
        so by the time ``_collect_fused`` runs the packed matrix is already
        on host — the ~20-30 ms blocking readback overlaps other work."""
        import time
        t0 = time.perf_counter()
        feats, pos, adj, nmask = base
        wids = np.zeros((sp, nb), np.int64)
        for i, w in enumerate(wids_rows):
            wids[i, :len(w)] = w
            wids[i, len(w):] = -1     # padding nodes must read as unassigned
        dev = self._fused_fn(nb, sp)(
            self.params, feats, jnp.asarray(wids), pos, adj, nmask,
            jnp.asarray(self._size_table()))
        try:
            dev.copy_to_host_async()
        except Exception:
            pass
        dt = time.perf_counter() - t0
        self.stats["score_s"] += dt
        self.stats["dispatch_s"] += dt
        self.stats["score_calls"] += 1
        self.stats["score_rows"] += sp
        return dev

    def _collect_fused(self, dev, n_rows: int, K: int):
        """Blocking half: unpack ONE readback into numpy
        (total, node_k, wid_k, valid, new_total) trimmed to n_rows."""
        import time
        t0 = time.perf_counter()
        packed = np.asarray(dev)[:n_rows]
        total = packed[:, 0]
        node_k = packed[:, 1: 1 + K].astype(np.int64)
        wid_k = packed[:, 1 + K: 1 + 2 * K].astype(np.int64)
        valid = packed[:, 1 + 2 * K: 1 + 3 * K] > 0.5
        new_total = packed[:, 1 + 3 * K: 1 + 4 * K]
        dt = time.perf_counter() - t0
        self.stats["score_s"] += dt
        self.stats["collect_s"] += dt
        return total, node_k, wid_k, valid, new_total

    def _run_fused(self, base, wids_rows: Sequence[np.ndarray],
                   nb: int, sp: int, K: int):
        """One fused dispatch (single packed readback); returns numpy
        (total, node_k, wid_k, valid, new_total) trimmed to len(wids_rows)
        rows."""
        dev = self._dispatch_fused(base, wids_rows, nb, sp)
        return self._collect_fused(dev, len(wids_rows), K)

    def _score_nodes(self, jobs: List[Tuple[TreeState, np.ndarray, int]]) -> np.ndarray:
        """Each job = (state, wids_override, masked_node). One device call.
        Returns logits (K, V).

        The job count is padded to the next power of two: the fleet size
        changes every beam round, and an unpadded batch would trigger a
        fresh XLA compile per distinct K — measured as the dominant cost of
        the refine-on pipeline (one multi-second compile per round through
        the tunnel vs ~ms of actual device work)."""
        import time

        from hierdiff_tpu.sampling.lattice import _next_pow2

        t0 = time.perf_counter()
        nb = bucket_for(max(j[0].n for j in jobs), self.buckets)
        k = len(jobs)
        kp = _next_pow2(k)
        f = jobs[0][0].feats.shape[1]
        feats = np.zeros((kp, nb, f), np.float32)
        vocab = np.zeros((kp, nb), np.int32)
        size = np.zeros((kp, nb), np.int32)
        pos = np.zeros((kp, nb, 3), np.float32)
        adj = np.zeros((kp, nb, nb), np.float32)
        nmask = np.zeros((kp, nb, 1), np.float32)
        pad_idx = np.zeros((kp,), np.int32)
        val = np.zeros((kp,), np.float32)
        for i, (s, wids, node) in enumerate(jobs):
            n = s.n
            feats[i, :n] = s.feats
            feats[i, node] = 0.0
            vocab[i, :n] = wids
            vocab[i, node] = MASK_TOKEN
            size[i, :n] = self.vocab_sizes[np.clip(wids, 0, len(self.vocab_sizes) - 1)]
            a = s.adj.copy()
            np.fill_diagonal(a, 0)
            adj[i, :n, :n] = a
            pos[i, :n] = s.pos
            nmask[i, :n] = 1.0
            pad_idx[i] = node
            val[i] = a[node].sum()
        logits = self._fn(nb)(self.params, jnp.asarray(feats), jnp.asarray(vocab),
                              jnp.asarray(size), jnp.asarray(pos), jnp.asarray(adj),
                              jnp.asarray(nmask), jnp.asarray(pad_idx), jnp.asarray(val))
        out = np.asarray(logits)[:k]
        self.stats["score_s"] += time.perf_counter() - t0
        self.stats["score_calls"] += 1
        self.stats["score_rows"] += kp
        return out

    def _logps_from_logits(self, wids: np.ndarray, nodes: Sequence[int],
                           logits: np.ndarray):
        """Size-restricted logp of the current wid + top-1 proposal per node.
        logits: (len(nodes), V) rows already scored for (wids, node) pairs.

        Vectorized over the whole fleet: the per-job python softmax loop was
        the refine-on pipeline's dominant HOST cost (thousands of jobs per
        beam round). Masked log-softmax over (K, V) with support masks
        cached per heavy-atom size is numerically identical (the current wid
        is force-included like the reference's append)."""
        nodes = np.asarray(list(nodes), np.int64)
        k = len(nodes)
        if k == 0:
            return np.zeros(0), np.zeros(0, np.int64)
        cur = np.asarray(wids)[nodes].astype(np.int64)
        sizes = self.vocab_sizes[np.clip(cur, 0, len(self.vocab_sizes) - 1)]
        mask = np.stack([self._support_mask(int(s)) for s in sizes])
        mask[np.arange(k), cur] = True
        ls = np.where(mask, logits[:k], -np.inf)
        mx = ls.max(axis=1, keepdims=True)
        lp = ls - (mx + np.log(np.exp(ls - mx).sum(axis=1, keepdims=True)))
        logps = lp[np.arange(k), cur]
        top = np.argmax(lp, axis=1).astype(np.int64)
        return logps, top

    def _node_logps(self, state: TreeState, wids: np.ndarray, nodes: np.ndarray):
        jobs = [(state, wids, int(n)) for n in nodes]
        return self._logps_from_logits(wids, nodes, self._score_nodes(jobs))

    def check_state(self, state: TreeState) -> Tuple[TreeState, float, bool]:
        """(reference: model_refine.py:175-249)"""
        return self.check_batch([state])[0]

    def fleet_chunk_rows(self, nb: int) -> int:
        """Max fleet rows per fused-check dispatch at bucket nb: bounds the
        device grid to (1+K)*rows*nb masked-node variants per program. The
        ONE source of the chunking policy — shared by ``dispatch_batch``
        (Python TreeState fleets) and ``dispatch_arrays`` (the native
        search's packed fleets) so the pad/chunk contract with ``_fused_fn``
        cannot skew between the two drivers. Capped at 64 rows so
        ``fleet_pad_rows`` stays bounded at small buckets."""
        K = max(1, int(nb * self.check_frac))
        return max(1, min(8192 // (nb * (1 + K)), 64))

    def fleet_pad_rows(self, nb: int) -> int:
        """The ONE padded fleet shape per bucket: every fused-check dispatch
        pads its rows to this constant, so all drivers (``dispatch_batch``
        fleets, ``dispatch_arrays`` native/merged lanes, any chunk tail) run
        rows through the SAME compiled program. Rows are independent trees —
        no cross-row ops — so with one program per bucket the per-row
        results are invariant to fleet composition TO THE BIT; variable
        pow2-of-rows padding instead compiles a different program per fleet
        size, whose fusion/reassociation moves f32 totals by ~2e-6 and
        breaks the native/streamed/merged bit-parity pins (measured,
        round-5). Also: one compile per bucket instead of one per (bucket,
        pow2 size)."""
        from hierdiff_tpu.sampling.lattice import _next_pow2
        return _next_pow2(self.fleet_chunk_rows(nb))

    def dispatch_batch(self, states: List[TreeState]):
        """Async half of ``check_batch``: pack and dispatch EVERY fleet
        chunk without blocking (JAX dispatch is async; the packed readback
        is also enqueued). Returns a token for ``collect_batch``."""
        act = [si for si, s in enumerate(states)
               if np.sum(s.wids >= 0) * self.check_frac > 1]
        if not act:
            return (None, [])
        nb = bucket_for(max(states[si].n for si in act), self.buckets)
        K = max(1, int(nb * self.check_frac))
        max_states = self.fleet_chunk_rows(nb)
        sp = self.fleet_pad_rows(nb)   # ONE shape per bucket (see docstring)
        pending = []
        for c0 in range(0, len(act), max_states):
            chunk = act[c0: c0 + max_states]
            base = self._pack_states([states[si] for si in chunk], nb, sp)
            dev = self._dispatch_fused(
                base, [states[si].wids for si in chunk], nb, sp)
            pending.append((chunk, dev))
        return (K, pending)

    def dispatch_arrays(self, nb: int, feats: np.ndarray, pos: np.ndarray,
                        adj: np.ndarray, nmask: np.ndarray, wids: np.ndarray):
        """Chunk + pow2-pad + dispatch an ALREADY-PACKED fleet (``rows``
        states at bucket nb, arrays shaped (rows, nb, ...)) through the
        fused check. Same policy as ``dispatch_batch`` (one
        ``fleet_chunk_rows`` bound, eager readbacks, padding rows read as
        unassigned) minus the TreeState packing — the native refine search
        hands fleets over as contiguous arrays. Returns [(cnt, dev), ...];
        collect each with np.asarray(dev)[:cnt]."""
        import time as _time

        rows = len(feats)
        max_states = self.fleet_chunk_rows(nb)
        sp = self.fleet_pad_rows(nb)   # ONE shape per bucket (see docstring)
        pending = []
        for c0 in range(0, rows, max_states):
            c1 = min(rows, c0 + max_states)
            cnt = c1 - c0
            t0 = _time.perf_counter()
            fe = np.zeros((sp,) + feats.shape[1:], np.float32)
            po = np.zeros((sp,) + pos.shape[1:], np.float32)
            ad = np.zeros((sp,) + adj.shape[1:], np.float32)
            nm = np.zeros((sp,) + nmask.shape[1:], np.float32)
            fe[:cnt] = feats[c0:c1]
            po[:cnt] = pos[c0:c1]
            ad[:cnt] = adj[c0:c1]
            nm[:cnt] = nmask[c0:c1]
            base = (jnp.asarray(fe), jnp.asarray(po), jnp.asarray(ad),
                    jnp.asarray(nm))
            self.stats["pack_s"] += _time.perf_counter() - t0
            self.stats["pack_calls"] += 1
            dev = self._dispatch_fused(base, list(wids[c0:c1]), nb, sp)
            pending.append((cnt, dev))
        return pending

    def collect_batch(self, token, states: List[TreeState]
                      ) -> List[Tuple[TreeState, float, bool]]:
        """Blocking half of ``check_batch``: unpack each chunk's ONE packed
        readback, then walk each state's candidate slots in order and commit
        the first that raises the total (and passes the assembly gate) —
        identical accept semantics to the reference's sequential loop
        (model_refine.py:175-249)."""
        import time as _time
        K, pending = token
        results: List[Tuple[TreeState, float, bool]] = [(s, 0.0, False) for s in states]
        for chunk, dev in pending:
            total_m, node_m, wid_m, valid_m, new_total_m = self._collect_fused(
                dev, len(chunk), K)
            t_walk = _time.perf_counter()
            for row, si in enumerate(chunk):
                s = states[si]
                total = total_m[row]
                for k in range(K):
                    if not valid_m[row, k]:
                        continue
                    new_total = new_total_m[row, k]
                    if new_total <= total:
                        continue
                    node = int(node_m[row, k])
                    new_wids = s.wids.copy()
                    new_wids[node] = int(wid_m[row, k])
                    perturbed = s.clone()
                    perturbed.wids = new_wids
                    if (self.can_assemble is not None
                            and not self.can_assemble(perturbed, node)):
                        continue
                    results[si] = (perturbed, float(total - new_total), True)
                    break
            self.stats["walk_s"] += _time.perf_counter() - t_walk
        return results

    def check_batch(self, states: List[TreeState]) -> List[Tuple[TreeState, float, bool]]:
        """Batched check_tree across a fleet of beam candidates.

        Device traffic: ONE fused dispatch per fleet chunk (``_fused_fn``) —
        masked-node scoring, restricted softmax, candidate selection
        (argsort + front-half/top!=current filters + n_check cap) and the
        re-scoring of every candidate swap against the state's ORIGINAL wids
        all run in a single device program; all chunks are dispatched before
        any is collected. Motivation: under gated beam backtracking the
        ~60-75 ms tunnel dispatch latency dominates the refine-on pipeline
        (refine_ab --stats), so dispatches per fleet round go
        1+rounds -> exactly 1, and large fleets' chunks pipeline.
        """
        return self.collect_batch(self.dispatch_batch(states), states)

    def finalize(self, state: TreeState, check_num: int = 10) -> Optional[TreeState]:
        """End-of-search repair: fix non-assemblable nodes by swapping to
        higher-probability same-size fragments; give up when more than 20%
        of nodes are broken or any stays unfixable.
        (reference: model_refine.py:252-299 check_final_tree)

        Requires a ``can_assemble(state, node)`` gate (RDKit); without one
        the tree is returned unchanged.
        """
        if self.can_assemble is None:
            return state
        n = state.n
        broken = [i for i in range(n) if not self.can_assemble(state, i)]
        if not broken:
            return state
        if len(broken) > 0.2 * n:
            return None
        wids = state.wids.copy()
        assigned = np.arange(n)
        logps, _ = self._node_logps(state, wids, assigned)
        total = logps.sum()
        fixed = 0
        for node in broken:
            jobs = [(state, wids, int(node))]
            logits = self._score_nodes(jobs)[0]
            support = self._support(int(self.vocab_sizes[int(wids[node])]))
            order = support[np.argsort(-logits[support])][:check_num]
            for wid in order:
                if wid == wids[node]:
                    continue
                new_wids = wids.copy()
                new_wids[node] = wid
                cand = state.clone()
                cand.wids = new_wids
                if not self.can_assemble(cand, node):
                    continue
                new_logps, _ = self._node_logps(state, new_wids, assigned)
                if new_logps.sum() > total:
                    wids = new_wids
                    total = new_logps.sum()
                    fixed += 1
                    break
        if fixed == len(broken):
            out = state.clone()
            out.wids = wids
            return out
        return None

    def __call__(self, states: List[TreeState]) -> List[TreeState]:
        """ARSampler refine_hook: perturb in place; perturbed trees keep
        their (improved) state and still expand this round."""
        out = []
        for s in states:
            new_s, dlogp, changed = self.check_state(s)
            if changed:
                new_s.logp += dlogp
            out.append(new_s)
        return out
