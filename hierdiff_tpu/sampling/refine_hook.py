"""Beam-search refine perturbation: the check_tree hook.

Rebuild of ``Node2Vec.check_tree`` (models/model_refine.py:175-249): during
beam search, re-score every ASSIGNED node of each candidate tree with the
refine model (mask the node, size-restricted softmax), and if swapping the
lowest-probability mispredicted node to the model's top choice raises the
tree's total log-probability (and passes the optional assembly gate), commit
the swap and skip the tree's expansion this round.

Device work is one batched ``NodeRefine.check_logits`` call per fleet —
every (tree, masked-node) pair across all candidates rides a single jitted
call with bucketed shapes, vs the reference's per-tree per-node loops.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hierdiff_tpu.data.collate import bucket_for
from hierdiff_tpu.data.refine import size_support_indices
from hierdiff_tpu.models.refine import MASK_TOKEN, NodeRefine
from hierdiff_tpu.sampling.ar import TreeState


class RefineHook:
    def __init__(self, model: NodeRefine, params, vocab_sizes: np.ndarray,
                 check_frac: float = 0.1,
                 can_assemble: Optional[Callable[[TreeState, int], bool]] = None):
        """vocab_sizes: heavy-atom count per vocab index (Vocab.mol_sizes)."""
        if model.gated and not model.dynamic_depth:
            # inference-only depth bound (see NodeRefine.dynamic_depth)
            model = model.clone(dynamic_depth=True)
        self.model = model
        self.params = params
        self.vocab_sizes = np.asarray(vocab_sizes)
        self.check_frac = check_frac
        self.can_assemble = can_assemble
        self._fn_cache: Dict[int, Callable] = {}
        self._support_cache: Dict[int, np.ndarray] = {}

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

    def _score_nodes(self, jobs: List[Tuple[TreeState, np.ndarray, int]]) -> np.ndarray:
        """Each job = (state, wids_override, masked_node). One device call.
        Returns logits (K, V).

        The job count is padded to the next power of two: the fleet size
        changes every beam round, and an unpadded batch would trigger a
        fresh XLA compile per distinct K — measured as the dominant cost of
        the refine-on pipeline (one multi-second compile per round through
        the tunnel vs ~ms of actual device work)."""
        from hierdiff_tpu.sampling.lattice import _next_pow2

        nb = bucket_for(max(j[0].n for j in jobs))
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
        return np.asarray(logits)[:k]

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

    def check_batch(self, states: List[TreeState]) -> List[Tuple[TreeState, float, bool]]:
        """Batched check_tree across a fleet of beam candidates.

        Device traffic: ONE ``check_logits`` call scores every (state,
        assigned-node) pair, then one call per swap-attempt round evaluates
        the pending candidate swap of every still-active state — instead of
        the reference's per-tree per-node loops (model_refine.py:175-249)
        and round 1's one call per attempted swap.
        """
        results: List[Tuple[TreeState, float, bool]] = [(s, 0.0, False) for s in states]
        # pass 1: score all assigned nodes of all actionable states
        meta = []          # (state_idx, assigned array)
        jobs = []
        for si, s in enumerate(states):
            assigned = np.nonzero(s.wids >= 0)[0]
            if len(assigned) * self.check_frac <= 1:
                continue
            meta.append((si, assigned, len(jobs)))
            jobs.extend((s, s.wids, int(n)) for n in assigned)
        if not jobs:
            return results
        logits = self._score_nodes(jobs)

        # per state: candidate swap list (lowest-logp first, front half only)
        pending = []       # (si, assigned, wids, total, [(pos_in_assigned, new_wid)])
        for si, assigned, off in meta:
            s = states[si]
            wids = s.wids.copy()
            logps, top = self._logps_from_logits(
                wids, assigned, logits[off: off + len(assigned)])
            total = logps.sum()
            order = np.argsort(logps)
            n_check = int(len(assigned) * self.check_frac)
            cand = [(int(i), int(top[i])) for i in order[:n_check]
                    if i < len(assigned) * 0.5 and top[i] != wids[assigned[i]]]
            if cand:
                pending.append([si, assigned, wids, total, cand])

        # swap-attempt rounds: evaluate the first pending candidate of every
        # active state in one batched call
        while pending:
            jobs = []
            spans = []
            for si, assigned, wids, total, cand in pending:
                pos, new_wid = cand[0]
                new_wids = wids.copy()
                new_wids[int(assigned[pos])] = new_wid
                spans.append((len(jobs), new_wids))
                jobs.extend((states[si], new_wids, int(n)) for n in assigned)
            logits = self._score_nodes(jobs)
            nxt = []
            for (si, assigned, wids, total, cand), (off, new_wids) in zip(pending, spans):
                pos, new_wid = cand.pop(0)
                node = int(assigned[pos])
                new_logps, _ = self._logps_from_logits(
                    new_wids, assigned, logits[off: off + len(assigned)])
                ok = new_logps.sum() > total
                if ok:
                    perturbed = states[si].clone()
                    perturbed.wids = new_wids
                    if self.can_assemble is not None and not self.can_assemble(perturbed, node):
                        ok = False
                    else:
                        results[si] = (perturbed, float(total - new_logps.sum()), True)
                if not ok and cand:
                    nxt.append([si, assigned, wids, total, cand])
            pending = nxt
        return results

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
