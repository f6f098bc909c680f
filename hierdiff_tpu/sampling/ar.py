"""Autoregressive fine-stage sampling: fleet-batched beam search.

Rebuild of the reference beam search (generation/ar_sampling_nosize.py).
The reference steps ONE tree batch at a time (sample_batch_size=1) and
crosses the host/device boundary several times per expansion; here the
entire fleet of beam candidates — across all source molecules — is stepped
by ONE jitted ``EdgeDenoise.ar_step`` call per round (bucketed static
shapes), and only beam bookkeeping, type top-k selection, and the optional
chemistry gate stay on host.

Chemistry hooks (``can_assemble``, refine perturbation) are pluggable: the
RDKit-backed versions live in ``hierdiff_tpu.chem``; without RDKit the gate
is a no-op, which only affects sample validity, not throughput mechanics.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hierdiff_tpu.data.collate import bucket_for
from hierdiff_tpu.models.edge_denoise import EdgeDenoise

Array = jax.Array

UNDISCOVERED_TOKEN = 780


@dataclasses.dataclass
class TreeState:
    """One beam candidate: a partially assembled junction tree."""

    feats: np.ndarray          # (n, F) blur features
    pos: np.ndarray            # (n, 3)
    adj: np.ndarray            # (n, n) with the (0,0) root marker convention
    wids: np.ndarray           # (n,) assigned vocab ids, -1 = blur/unassigned
    logp: float = 0.0
    index: int = 0             # source molecule id
    last_edge: Optional[tuple] = None

    @property
    def n(self) -> int:
        return self.feats.shape[0]

    @property
    def done(self) -> bool:
        return bool(np.all(self.wids >= 0))

    def clone(self) -> "TreeState":
        return TreeState(self.feats.copy(), self.pos.copy(), self.adj.copy(),
                         self.wids.copy(), self.logp, self.index, self.last_edge)


class ARSampler:
    def __init__(self, model: EdgeDenoise, params, beam_size: int = 5,
                 can_assemble: Optional[Callable[[TreeState, int], bool]] = None,
                 refine_hook: Optional[Callable[[List[TreeState]], List[TreeState]]] = None):
        self.model = model
        self.params = params
        self.beam_size = beam_size
        self.can_assemble = can_assemble
        self.refine_hook = refine_hook
        self._step_cache: Dict[int, Callable] = {}

    # --- jitted device step, one compile per node-count bucket -------------

    def _step_fn(self, n: int):
        if n not in self._step_cache:
            model = self.model

            @jax.jit
            def step(params, feats, discovered, vocab_idx, pos, adj, node_mask):
                return model.apply(params, feats, discovered, vocab_idx, pos,
                                   adj, node_mask, method=EdgeDenoise.ar_step)

            self._step_cache[n] = step
        return self._step_cache[n]

    def _batch_step(self, states: Sequence[TreeState]):
        """Pad the fleet to one bucket and run the device step. Packing uses
        the native treekit when available (runtime/treekit.cpp)."""
        nb = bucket_for(max(s.n for s in states))
        from hierdiff_tpu import runtime
        if runtime.treekit_available():
            feats, pos, adj, vocab, disc, nmask = runtime.pack_ar_fleet_native(
                states, nb, undiscovered_token=UNDISCOVERED_TOKEN)
        else:
            b = len(states)
            f = states[0].feats.shape[1]
            feats = np.zeros((b, nb, f), np.float32)
            pos = np.zeros((b, nb, 3), np.float32)
            adj = np.zeros((b, nb, nb), np.float32)
            vocab = np.full((b, nb), UNDISCOVERED_TOKEN, np.int32)
            disc = np.zeros((b, nb), np.int32)
            nmask = np.zeros((b, nb, 1), np.float32)
            for i, s in enumerate(states):
                k = s.n
                feats[i, :k] = s.feats
                pos[i, :k] = s.pos
                adj[i, :k, :k] = s.adj
                assigned = s.wids >= 0
                vocab[i, :k] = np.where(assigned, s.wids, UNDISCOVERED_TOKEN)
                disc[i, :k] = assigned.astype(np.int32)
                nmask[i, :k] = 1.0
        out = self._step_fn(nb)(self.params, jnp.asarray(feats), jnp.asarray(disc),
                                jnp.asarray(vocab), jnp.asarray(pos),
                                jnp.asarray(adj), jnp.asarray(nmask))
        return {k: np.asarray(v) for k, v in out.items()}

    # --- host beam bookkeeping ---------------------------------------------

    def _expand(self, states: List[TreeState]) -> List[TreeState]:
        """One AR round: device step(s) + top-k type beam expansion.

        The fleet is split into at most TWO device calls — small vs large
        molecules — and only when the bucket gap is >=2x: dense-MP cost is
        quadratic in the bucket, so one oversized molecule would otherwise
        drag the whole fleet into the largest bucket, but per-call dispatch
        overhead makes fine-grained per-bucket splits a net loss."""
        max_bucket = bucket_for(max(s.n for s in states))
        small = [s for s in states if bucket_for(s.n) * 2 <= max_bucket]
        large = [s for s in states if bucket_for(s.n) * 2 > max_bucket]
        children: List[TreeState] = []
        for grp in (small, large):
            if grp:
                children.extend(self._expand_group(grp))
        return children

    def _expand_group(self, states: List[TreeState]) -> List[TreeState]:
        out = self._batch_step(states)
        children: List[TreeState] = []
        for i, s in enumerate(states):
            focal = int(out["focal"][i])
            target = int(out["target"][i])
            attached = bool(out["did_attach"][i])
            top_wid = out["top_wid"][i][: self.beam_size]
            top_logp = out["top_logp"][i][: self.beam_size]
            for wid, lp in zip(top_wid, top_logp):
                c = s.clone()
                if attached:
                    # host applies the new edge itself — cheaper than
                    # shipping the (B, N, N) adjacency back every round
                    c.adj[focal, target] = c.adj[target, focal] = 1.0
                    c.adj[0, 0] = max(c.adj[0, 0], 1.0)  # keep root marker
                    c.last_edge = (focal, target)
                else:
                    c.adj[0, 0] = 1.0  # root step: mark node 0 discovered
                    c.last_edge = None
                c.wids[target] = int(wid)
                # reference accumulates -log p as the priority
                # (ar_sampling_nosize.py:180,203)
                c.logp += float(-lp)
                if self.can_assemble is not None and attached:
                    if not self.can_assemble(c, focal):
                        continue
                children.append(c)
        return children

    def sample(self, blur_sets: Sequence[Dict[str, np.ndarray]],
               max_rounds: Optional[int] = None) -> List[Optional[TreeState]]:
        """Assemble junction trees for a batch of coarse samples.

        blur_sets: per molecule {'x': (n,3), 'h': (n,F)} (h integer-rounded
        as in ar_sampling_nosize.py:388). Returns the best completed tree per
        molecule (None on failure).
        """
        beams: Dict[int, List[TreeState]] = {}
        finished: Dict[int, TreeState] = {}
        for idx, jt in enumerate(blur_sets):
            n = jt["h"].shape[0]
            beams[idx] = [TreeState(
                feats=np.asarray(jt["h"], np.float32),
                pos=np.asarray(jt["x"], np.float32),
                adj=np.zeros((n, n), np.float32),
                wids=np.full(n, -1, np.int64),
                index=idx,
            )]
        max_n = max(jt["h"].shape[0] for jt in blur_sets)
        rounds = max_rounds or (max_n + 2)

        for _ in range(rounds):
            active: List[TreeState] = []
            for idx, beam in beams.items():
                if idx in finished:
                    continue
                active.extend(beam)
            if not active:
                break
            if self.refine_hook is not None:
                active = self.refine_hook(active)
            children = self._expand(active)
            # regroup per molecule, keep top beam_size by cumulative -logp
            regroup: Dict[int, List[TreeState]] = {}
            for c in children:
                regroup.setdefault(c.index, []).append(c)
            for idx in list(beams.keys()):
                if idx in finished:
                    continue
                cand = regroup.get(idx, [])
                cand.sort(key=lambda t: t.logp)
                done = [t for t in cand if t.done]
                if done:
                    finished[idx] = done[0]
                    beams[idx] = []
                else:
                    beams[idx] = cand[: self.beam_size]

        return [finished.get(i) for i in range(len(blur_sets))]
