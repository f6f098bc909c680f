"""Round-based autoregressive fine-stage sampling (device step per round).

One jitted ``EdgeDenoise.ar_step`` call expands the whole fleet of popped
beam candidates per search round (bucketed static shapes); beam bookkeeping
runs on host through the shared priority-queue search (sampling/beam.py)
with the reference's semantics (backtracking, per-candidate and final
assembly gates, refine perturbation).

This path is needed when fragment-type choices feed back into the model
inputs — ``vocab_conditioning=True``, or the size variant's fp replacement
(``vocab_fps`` — ar_sampling.py:170-182). For the reference's live
configuration the trajectory is type-independent and the lattice sampler
(sampling/lattice.py) computes every expansion in one device call; prefer it
(GenerationPipeline does).
"""

from __future__ import annotations

import random
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hierdiff_tpu.data.collate import DEFAULT_BUCKETS, bucket_for
from hierdiff_tpu.models.edge_denoise import EdgeDenoise
from hierdiff_tpu.sampling.beam import Expansion, PQBeamSearch, TreeState  # noqa: F401 (TreeState re-export)

UNDISCOVERED_TOKEN = 780


class DeviceExpander:
    """beam.PQBeamSearch expander: one ``ar_step`` device call per fleet
    (split small/large only when the bucket gap is >=2x — dense-MP cost is
    quadratic in the bucket, but per-call dispatch overhead makes
    fine-grained splits a net loss)."""

    def __init__(self, model: EdgeDenoise, params,
                 allowed_fn: Optional[Callable[[np.ndarray], List[np.ndarray]]] = None,
                 buckets: Optional[Sequence[int]] = None):
        if model.gated and not model.dynamic_depth:
            # inference-only depth bound (see EdgeDenoise.dynamic_depth)
            model = model.clone(dynamic_depth=True)
        self.model = model
        self.params = params
        self.allowed_fn = allowed_fn
        self.buckets = tuple(buckets) if buckets else DEFAULT_BUCKETS
        self._step_cache: Dict[tuple, Callable] = {}

    def _step_fn(self, nb: int, with_allowed: bool):
        key = (nb, with_allowed)
        if key not in self._step_cache:
            model = self.model

            @jax.jit
            def step(params, feats, discovered, vocab_idx, pos, adj, node_mask,
                     bucket=None, table=None):
                out = model.apply(params, feats, discovered, vocab_idx, pos,
                                  adj, node_mask, allowed_bucket=bucket,
                                  allowed_table=table, method=EdgeDenoise.ar_step)
                # ONE packed f32 output: each extra returned array costs a
                # separate ~20-30 ms blocking readback through the tunnel
                # (same finding as RefineHook._fused_fn). Columns:
                # [focal, target, did_attach, top_wid*k, top_logp*k].
                return jnp.concatenate(
                    [out["focal"][:, None].astype(jnp.float32),
                     out["target"][:, None].astype(jnp.float32),
                     out["did_attach"][:, None].astype(jnp.float32),
                     out["top_wid"].astype(jnp.float32),
                     out["top_logp"].astype(jnp.float32)], axis=1)

            self._step_cache[key] = step
        return self._step_cache[key]

    def _batch_step(self, states: Sequence[TreeState]):
        """Pad the fleet to one bucket and run the device step. Packing uses
        the native treekit when available (runtime/treekit.cpp).

        The fleet is pow2-padded (the beam fleet size changes every round —
        an unpadded batch would recompile per distinct size) and the step
        returns one packed f32 matrix (single device->host readback)."""
        from hierdiff_tpu.sampling.lattice import _next_pow2

        nb = bucket_for(max(s.n for s in states), self.buckets)
        b = len(states)
        bp = _next_pow2(b)
        from hierdiff_tpu import runtime
        if runtime.treekit_available():
            feats, pos, adj, vocab, disc, nmask = runtime.pack_ar_fleet_native(
                states, nb, undiscovered_token=UNDISCOVERED_TOKEN)
            if bp != b:
                pad = lambda a: np.concatenate(
                    [a, np.zeros((bp - b,) + a.shape[1:], a.dtype)])
                feats, pos, adj, nmask = map(pad, (feats, pos, adj, nmask))
                disc = pad(disc)
                vocab = np.concatenate(
                    [vocab, np.full((bp - b, nb), UNDISCOVERED_TOKEN,
                                    vocab.dtype)])
        else:
            f = states[0].feats.shape[1]
            feats = np.zeros((bp, nb, f), np.float32)
            pos = np.zeros((bp, nb, 3), np.float32)
            adj = np.zeros((bp, nb, nb), np.float32)
            vocab = np.full((bp, nb), UNDISCOVERED_TOKEN, np.int32)
            disc = np.zeros((bp, nb), np.int32)
            nmask = np.zeros((bp, nb, 1), np.float32)
            for i, s in enumerate(states):
                k = s.n
                feats[i, :k] = s.feats
                pos[i, :k] = s.pos
                adj[i, :k, :k] = s.adj
                assigned = s.wids >= 0
                vocab[i, :k] = np.where(assigned, s.wids, UNDISCOVERED_TOKEN)
                disc[i, :k] = assigned.astype(np.int32)
                nmask[i, :k] = 1.0
        args = [jnp.asarray(feats), jnp.asarray(disc), jnp.asarray(vocab),
                jnp.asarray(pos), jnp.asarray(adj), jnp.asarray(nmask)]
        with_allowed = self.allowed_fn is not None
        if with_allowed:
            from hierdiff_tpu.sampling.lattice import build_allowed_arrays
            bucket, table = build_allowed_arrays(
                [s.feats for s in states], self.allowed_fn,
                bp, nb, self.model.out_node_nf)
            # pow2-pad the union table too: its row count varies with batch
            # contents and would otherwise change the jit key every round
            tp = _next_pow2(len(table))
            if tp != len(table):
                table = np.concatenate(
                    [table, np.ones((tp - len(table), table.shape[1]),
                                    table.dtype)])
            args += [jnp.asarray(bucket), jnp.asarray(table)]
        packed = np.asarray(self._step_fn(nb, with_allowed)(self.params, *args))[:b]
        k = (packed.shape[1] - 3) // 2
        return {"focal": packed[:, 0].astype(np.int64),
                "target": packed[:, 1].astype(np.int64),
                "did_attach": packed[:, 2] > 0.5,
                "top_wid": packed[:, 3: 3 + k].astype(np.int64),
                "top_logp": packed[:, 3 + k:]}

    def __call__(self, states: List[TreeState]) -> List[Expansion]:
        max_bucket = bucket_for(max(s.n for s in states), self.buckets)
        small = [(i, s) for i, s in enumerate(states)
                 if bucket_for(s.n, self.buckets) * 2 <= max_bucket]
        large = [(i, s) for i, s in enumerate(states)
                 if bucket_for(s.n, self.buckets) * 2 > max_bucket]
        results: List[Optional[Expansion]] = [None] * len(states)
        for grp in (small, large):
            if not grp:
                continue
            out = self._batch_step([s for _, s in grp])
            for row, (i, s) in enumerate(grp):
                results[i] = Expansion(
                    focal=int(out["focal"][row]),
                    target=int(out["target"][row]),
                    attach=bool(out["did_attach"][row]),
                    cand_wids=out["top_wid"][row],
                    cand_logps=out["top_logp"][row])
        return results  # type: ignore[return-value]


class ARSampler:
    def __init__(self, model: EdgeDenoise, params, beam_size: int = 5,
                 can_assemble: Optional[Callable[[TreeState, int], bool]] = None,
                 refine_hook=None,
                 allowed_fn: Optional[Callable[[np.ndarray], List[np.ndarray]]] = None,
                 vocab_fps: Optional[np.ndarray] = None,
                 retry_final_gate: bool = True,
                 rng: Optional[random.Random] = None,
                 buckets: Optional[Sequence[int]] = None):
        """vocab_fps (V, F): replace a typed node's blur features with the
        fragment's own fp row (size variant, ar_sampling.py:170-182)."""
        self.model = model
        self.params = params
        self.beam_size = beam_size
        self.can_assemble = can_assemble
        self.refine_hook = refine_hook
        self.expander = DeviceExpander(model, params, allowed_fn=allowed_fn,
                                       buckets=buckets)
        self.vocab_fps = vocab_fps
        self.retry_final_gate = retry_final_gate
        self.rng = rng

    def sample(self, blur_sets: Sequence[Dict[str, np.ndarray]],
               max_rounds: Optional[int] = None) -> List[Optional[TreeState]]:
        """Assemble junction trees for a batch of coarse samples.

        blur_sets: per molecule {'x': (n,3), 'h': (n,F)} (h integer-rounded
        as in ar_sampling_nosize.py:388). Returns the best completed tree per
        molecule (None on failure).
        """
        if not blur_sets:
            return []
        init = []
        for idx, jt in enumerate(blur_sets):
            n = jt["h"].shape[0]
            init.append(TreeState(
                feats=np.asarray(jt["h"], np.float32),
                pos=np.asarray(jt["x"], np.float32),
                adj=np.zeros((n, n), np.float32),
                wids=np.full(n, -1, np.int64),
                index=idx))
        feats_for_wid = None
        if self.vocab_fps is not None:
            fps = self.vocab_fps
            feats_for_wid = lambda wid: fps[wid]
        search = PQBeamSearch(
            self.expander, beam_size=self.beam_size,
            can_assemble=self.can_assemble, refine_hook=self.refine_hook,
            rng=self.rng, retry_final_gate=self.retry_final_gate,
            feats_for_wid=feats_for_wid)
        if max_rounds is not None:
            # legacy knob: cap total expansions per molecule instead of rounds
            search.max_expansions_factor = max(1, max_rounds)
        return search.run(init)
