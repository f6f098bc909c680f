"""Refine model: masked-node fragment-type re-scoring over junction trees.

Dense rebuild of the reference ``Node2Vec`` (models/model_refine.py): one
node's identity is masked (token 780, zeroed features) and predicted from a
tri-directional depth-ordered message flow over the tree:

  collect:  leaves -> masked node (deepest layer first)
  reverse:  masked node -> leaves (shallowest first, edges flipped)
  back:     leaves -> masked node again

Each phase applies its own stack of n_layers E_GCL layers at every depth
(reference: model_refine.py:48-71). Depth layers come from on-device BFS; the
vocab softmax is restricted to fragments with the masked node's heavy-atom
count (size_dict support, model_refine.py:104-110).

Used at sampling time to perturb low-probability fragment assignments during
beam search (check_tree / check_final_tree — hosted in sampling/ar.py).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hierdiff_tpu.ops.egnn import torch_linear_init
from hierdiff_tpu.ops.gcl import DenseEGCL, compute_parents
from hierdiff_tpu.ops.graph import bfs_depths
from hierdiff_tpu.ops.masked import masked_cross_entropy, masked_log_softmax

Array = jax.Array

MASK_TOKEN = 780


class NodeRefine(nn.Module):
    """Config mirrors conf/model/refine.yaml."""

    vocab_size: int = 780
    feature_size: int = 8
    hidden_size: int = 256
    n_layers: int = 2
    max_size: int = 26
    gated: bool = True
    max_depth: Optional[int] = None   # static per-phase scan length; None -> N-1
    # inference-only dynamic bound on the phase loops (exact under
    # gated=True, same argument as EdgeDenoise.dynamic_depth); the refine
    # hook flips it on via model.clone(dynamic_depth=True)
    dynamic_depth: bool = False

    def setup(self):
        h = self.hidden_size
        self.v_embedding = nn.Embed(self.vocab_size + 1, h)
        self.f_embedding = nn.Sequential([nn.Dense(h, kernel_init=torch_linear_init), nn.silu, nn.Dense(h, kernel_init=torch_linear_init)])
        self.size_embedding = nn.Embed(self.max_size, h)
        self.projection = nn.Sequential(
            [nn.Dense(3 * h, kernel_init=torch_linear_init), nn.silu,
             nn.Dense(h, kernel_init=torch_linear_init), nn.silu,
             nn.Dense(h, kernel_init=torch_linear_init)])
        mk = lambda name: [
            DenseEGCL(h, edges_in_d=1, attention=True, tanh=True, coords_range=30.0,
                      coord_update=True, edge_update=False, gated=self.gated,
                      name=f"{name}{i}")
            for i in range(self.n_layers)
        ]
        self.gcl_collect = mk("gcl_collect")
        self.gcl_reverse = mk("gcl_reverse")
        self.gcl_back = mk("gcl_back")
        self.output = nn.Sequential([nn.Dense(h, kernel_init=torch_linear_init), nn.silu, nn.Dense(self.vocab_size, kernel_init=torch_linear_init)])

    def _phase(self, phase_name: str, h, x, parent, depth, node_mask, ds, flip: bool,
               start=None, stop=None):
        """nn.scan one directional phase over per-sample depth values ``ds``
        (L, B) (params broadcast across depth steps); each layer is a
        parent-pointer tree_pass (see ops/gcl.py). With ``dynamic_depth``
        (and gated=True) only iterations [start, stop) run — the rest have
        empty active masks and are exact no-ops."""

        if self.dynamic_depth and self.gated and start is not None:
            def cond(mdl, c):
                return c[2] < c[3]

            def body(mdl, c):
                h, x, k, sp = c
                d = jax.lax.dynamic_index_in_dim(ds, k, axis=0, keepdims=False)
                active = (depth == d[:, None]) & (d[:, None] >= 1)
                for layer in getattr(mdl, phase_name):
                    h, x = layer.tree_pass(h, x, parent, active, node_mask,
                                           reverse=flip)
                return (h, x, k + 1, sp)

            h, x, _, _ = nn.while_loop(cond, body, self, (h, x, start, stop))
            return h, x

        def step(mdl, carry, d):
            h, x = carry
            active = (depth == d[:, None]) & (d[:, None] >= 1)
            for layer in getattr(mdl, phase_name):
                h, x = layer.tree_pass(h, x, parent, active, node_mask, reverse=flip)
            return (h, x), ()

        scan = nn.scan(step, variable_broadcast="params", split_rngs={"params": False},
                       in_axes=0, out_axes=0)
        (h, x), _ = scan(self, (h, x), ds)
        return h, x

    def message(self, h: Array, x: Array, adj: Array, center_onehot: Array,
                node_mask: Array) -> Tuple[Array, Array]:
        """Tri-directional depth flow. (reference: model_refine.py:48-71)

        Depth layers are aligned per sample by position-from-deepest, like
        the reference's flat_add_and_concat (model_refine.py:322-343): the
        collect/back phases run each sample's deepest layer in iteration 0;
        the reverse phase reverses the CONCATENATED layer list, so sample
        i's shallowest layer runs at iteration L - maxdepth_i (identical
        results either way for gated=True; exact for gated=False).
        """
        b, n = adj.shape[:2]
        depth = bfs_depths(adj, center_onehot)
        parent = compute_parents(adj, depth)
        maxd = jnp.max(depth, axis=1)                      # (B,)
        steps = self.max_depth or (n - 1)
        ks = jnp.arange(steps, dtype=jnp.int32)
        down = maxd[None, :] - ks[:, None]                 # (L, B) deepest-first
        up = maxd[None, :] - (steps - 1 - ks)[:, None]     # reversed concat order
        # dynamic bounds: down phases are active for k < max(maxd); the
        # reversed phase's active iterations sit at the END of the list,
        # k >= steps - max(maxd)
        kmax = jnp.minimum(jnp.max(maxd), steps).astype(jnp.int32)
        zero = jnp.zeros((), jnp.int32)
        steps_c = jnp.full((), steps, jnp.int32)
        h, x = self._phase("gcl_collect", h, x, parent, depth, node_mask, down,
                           flip=False, start=zero, stop=kmax)
        h, x = self._phase("gcl_reverse", h, x, parent, depth, node_mask, up,
                           flip=True, start=steps_c - kmax, stop=steps_c)
        h, x = self._phase("gcl_back", h, x, parent, depth, node_mask, down,
                           flip=False, start=zero, stop=kmax)
        return h, x

    def encode(self, feats: Array, vocab: Array, size: Array, node_mask: Array) -> Array:
        """(reference: model_refine.py:85-90)"""
        emb = jnp.concatenate([
            self.v_embedding(vocab.astype(jnp.int32)),
            self.f_embedding(feats),
            self.size_embedding(jnp.clip(size, 0, self.max_size - 1).astype(jnp.int32)),
        ], axis=-1)
        return self.projection(emb) * node_mask

    def logits_at(self, h: Array, idx: Array, val: Array) -> Array:
        """Vocab logits at node idx given its degree ``val``.
        (reference: model_refine.py:98-100)"""
        from hierdiff_tpu.ops.masked import onehot_take
        sel = onehot_take(h, idx)
        return self.output(jnp.concatenate([sel, val[:, None]], axis=-1))

    def __call__(self, batch: Dict[str, Array]) -> Dict[str, Array]:
        """Training loss: masked-node type CE on the size-restricted support.
        (reference: model_refine.py:73-111)
        Batch: feats (B,N,F) [masked node zeroed], vocab (B,N) [masked node =
        MASK_TOKEN], size (B,N), pos, adj (B,N,N), node_mask (B,N,1),
        predict_idx (B,), label (B,), val (B,), size_support (B,V).
        """
        h = self.encode(batch["feats"], batch["vocab"], batch["size"], batch["node_mask"])
        center = (jnp.arange(h.shape[1])[None, :] == batch["predict_idx"][:, None]).astype(jnp.float32)
        h, x = self.message(h, batch["pos"], batch["adj"], center, batch["node_mask"])
        logits = self.logits_at(h, batch["predict_idx"], batch["val"])
        support = batch["size_support"]
        ce = masked_cross_entropy(logits, batch["label"], support)
        pred = jnp.argmax(jnp.where(support > 0, logits, -jnp.inf), axis=1)
        acc = jnp.mean((pred == batch["label"]).astype(jnp.float32))
        return {"loss": jnp.mean(ce), "accuracy": acc, "logits": logits}

    def check_logits(self, feats: Array, vocab: Array, size: Array, pos: Array,
                     adj: Array, node_mask: Array, pad_idx: Array, val: Array) -> Array:
        """Raw vocab logits at a masked node — the device kernel behind
        check_node (reference: model_refine.py:115-173). The caller masks the
        node (vocab=MASK_TOKEN at pad_idx) and restricts support host-side."""
        h = self.encode(feats, vocab, size, node_mask)
        center = (jnp.arange(h.shape[1])[None, :] == pad_idx[:, None]).astype(jnp.float32)
        h, x = self.message(h, pos, adj, center, node_mask)
        return self.logits_at(h, pad_idx, val)

    def check_logp(self, feats: Array, vocab: Array, size: Array, pos: Array,
                   adj: Array, node_mask: Array, pad_idx: Array, val: Array) -> Array:
        """(B, V) log-softmax over the full vocabulary at a masked node."""
        logits = self.check_logits(feats, vocab, size, pos, adj, node_mask, pad_idx, val)
        return masked_log_softmax(logits, jnp.ones_like(logits))
