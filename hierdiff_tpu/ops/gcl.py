"""Dense masked E_GCL: the fine-stage message-passing layer.

TPU reformulation of the reference layer (models/egnn/gcl.py): directed
dense adjacency (B, N, N) instead of edge lists, aggregation onto the TARGET
(col) axis — messages flow along edge direction i->j into j (reference:
gcl.py:118-129 "for directed graph"). Supports the reference's options that
are actually used: recurrent residual, optional attention, tanh-bounded
coordinate update (coords_range=30), optional edge-feature update.

Two execution paths share the same parameters:

- ``__call__``: dense (B, N, N) masked pass — used for the fully-connected
  and discovered-subgraph passes.
- ``tree_pass``: parent-pointer pass for depth-sequential MP over TREES.
  One BFS depth layer toward a target has exactly one "near" neighbor per
  active node (junction trees are trees), so the layer is a GATHER of each
  active node's parent + a one-hot scatter-matmul — O(N·H^2) MLP work per
  depth instead of the O(N^2·H^2) dense-mask formulation. This is what makes
  the autoregressive sampler's depth scans affordable at N=96.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hierdiff_tpu.ops.egnn import torch_linear_init, xavier_scaled_init

Array = jax.Array


def coord2radial_dense(x: Array) -> Tuple[Array, Array]:
    """radial (B,N,N,1) = |x_i - x_j|^2 ; diff normalized by (|.|+1).
    (reference: gcl.py:203-210)
    """
    diff = x[:, :, None, :] - x[:, None, :, :]
    radial = jnp.sum(diff**2, axis=-1, keepdims=True)
    norm = jnp.sqrt(radial + 1e-8)
    return radial, diff / (norm + 1.0)


def compute_parents(adj: Array, depth: Array) -> Array:
    """Parent pointer toward the BFS source: for each node i, the neighbor j
    with depth[j] == depth[i] - 1; i itself when no such neighbor exists
    (target node, unreachable nodes, padding). adj (B,N,N), depth (B,N)."""
    n = adj.shape[1]
    ok = adj * (depth[:, None, :] == depth[:, :, None] - 1) * (depth[:, :, None] >= 1)
    has = jnp.sum(ok, axis=2) > 0
    parent = jnp.argmax(ok, axis=2).astype(jnp.int32)
    self_idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], parent.shape)
    return jnp.where(has, parent, self_idx)


class DenseEGCL(nn.Module):
    """One fine-stage E_GCL pass (dense or tree-gather execution).

    Dense inputs: h (B,N,H), x (B,N,3), dir_mask (B,N,N,1) — 1 where a
    directed edge i->j is active; edge_attr None | (B,N,N,E).
    """

    hidden_nf: int
    edges_in_d: int = 0
    attention: bool = False
    tanh: bool = True
    coords_range: float = 30.0
    coord_update: bool = True
    edge_update: bool = False
    recurrent: bool = True
    # When True (default), the node h-update only applies to nodes with at
    # least one incoming active edge. The reference updates EVERY node each
    # depth iteration (h += node_mlp([h, 0]) even with no edges,
    # gcl.py:118-129), which makes results depend on the ragged batch
    # composition (number of depth iterations = batch max depth). Gating
    # makes depth-scanned passes batch-composition-independent and lets
    # zero layers be true no-ops; set False to mimic the reference exactly.
    gated: bool = True
    # 'bfloat16' runs the (B,N,N,H) message/coord/edge pipeline in bf16
    # (doubled VPU width — same lever as the coarse stage's default bf16
    # inference path, BASELINE.md) with f32 row-sum accumulation and f32
    # node/residual state. None = exact f32 (reference numerics; default).
    compute_dtype: Optional[str] = None

    @property
    def _dt(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else None

    def setup(self):
        h = self.hidden_nf
        dt = self._dt
        # decomposed first message layer: cat([h_src, h_dst, radial, e]) @ W
        self.mes_src = nn.Dense(h, kernel_init=torch_linear_init, dtype=dt, name="mes_src")
        self.mes_dst = nn.Dense(h, use_bias=False, kernel_init=torch_linear_init, dtype=dt, name="mes_dst")
        self.mes_rad = nn.Dense(h, use_bias=False, kernel_init=torch_linear_init, dtype=dt, name="mes_rad")
        if self.edges_in_d > 0:
            self.mes_e = nn.Dense(h, use_bias=False, kernel_init=torch_linear_init, dtype=dt, name="mes_e")
        self.mes_out = nn.Dense(h, kernel_init=torch_linear_init, dtype=dt, name="mes_out")
        if self.attention:
            self.att = nn.Dense(1, kernel_init=torch_linear_init, dtype=dt, name="att")
        if self.coord_update:
            self.coord_in = nn.Dense(h, kernel_init=torch_linear_init, dtype=dt, name="coord_in")
            self.coord_head = nn.Dense(1, use_bias=False,
                                       kernel_init=xavier_scaled_init(0.001), dtype=dt, name="coord_head")
        self.node_in = nn.Dense(h, kernel_init=torch_linear_init, name="node_in")
        self.node_out = nn.Dense(h, kernel_init=torch_linear_init, name="node_out")
        if self.edge_update:
            self.edge_in = nn.Dense(h, kernel_init=torch_linear_init, dtype=dt, name="edge_in")
            self.edge_out = nn.Dense(h, kernel_init=torch_linear_init, dtype=dt, name="edge_out")

    # --- shared sub-computations (any aligned leading shape) ---------------

    def message(self, pre_src: Array, pre_dst: Array, radial: Array,
                edge_attr: Optional[Array]) -> Array:
        """m = MLP([h_src, h_dst, radial, e]); pre_* are already through
        mes_src/mes_dst (so dense callers can broadcast without forming the
        N^2 concat). (reference: gcl.py:91-107)"""
        pre = pre_src + pre_dst + self.mes_rad(radial)
        if self.edges_in_d > 0 and edge_attr is not None:
            pre = pre + self.mes_e(edge_attr)
        m = nn.silu(pre)
        m = nn.silu(self.mes_out(m))
        if self.attention:
            m = m * nn.sigmoid(self.att(m))
        return m

    def coord_scalar(self, m: Array) -> Array:
        s = self.coord_head(nn.silu(self.coord_in(m)))
        if self.tanh:
            s = jnp.tanh(s) * self.coords_range
        return s

    def node_update(self, h: Array, agg: Array, recv: Optional[Array]) -> Array:
        """h += node_mlp([h, agg]), optionally gated to receivers.
        (reference: gcl.py:118-129)"""
        out = self.node_out(nn.silu(self.node_in(jnp.concatenate([h, agg], axis=-1))))
        if self.gated and recv is not None:
            out = out * recv
        return h + out if self.recurrent else out

    # --- dense path ---------------------------------------------------------

    def __call__(self, h: Array, x: Array, dir_mask: Array,
                 edge_attr: Optional[Array] = None,
                 node_mask: Optional[Array] = None):
        if dir_mask.ndim == 3:
            dir_mask = dir_mask[..., None]
        radial, coord_diff = coord2radial_dense(x)
        pre_src = self.mes_src(h)[:, :, None, :]
        pre_dst = self.mes_dst(h)[:, None, :, :]
        m = self.message(pre_src, pre_dst, radial, edge_attr)
        # with compute_dtype the whole (B,N,N,H) pipeline above ran in bf16;
        # keep the mask in the same dtype so the product doesn't promote,
        # and accumulate the row-sums in f32
        m = m * dir_mask.astype(m.dtype)

        if self.coord_update:
            # x_j += sum_i (x_i - x_j)/(d+1) * phi(m_ij) (reference: gcl.py:131-155)
            scal = self.coord_scalar(m).astype(x.dtype)
            trans = coord_diff * scal * dir_mask
            x = x + jnp.sum(trans, axis=1)

        agg = jnp.sum(m, axis=1, dtype=jnp.float32)
        recv = (jnp.sum(dir_mask, axis=1) > 0).astype(h.dtype) if self.gated else None
        h = self.node_update(h.astype(jnp.float32), agg, recv)

        if node_mask is not None:
            h = h * node_mask
            x = x * node_mask

        if self.edge_update:
            # e' = edge_mlp([m, radial, e]) (reference: gcl.py:109-115)
            eu = jnp.concatenate(
                [m, radial.astype(m.dtype)]
                + ([edge_attr.astype(m.dtype)] if edge_attr is not None else []),
                axis=-1)
            eu = nn.silu(self.edge_in(eu))
            eu = self.edge_out(eu) * dir_mask.astype(m.dtype)
            return h, x, eu
        return h, x

    # --- tree path ----------------------------------------------------------

    def tree_pass(self, h: Array, x: Array, parent: Array, active: Array,
                  node_mask: Optional[Array] = None, reverse: bool = False):
        """One BFS depth layer over a tree via parent pointers.

        parent (B,N) int32: each node's neighbor one step closer to the BFS
        source (self-index if none). active (B,N): nodes whose edge is in
        this layer. ``reverse=False``: messages active->parent (collect);
        ``reverse=True``: parent->active, received at the active node.

        The message/coord/node math is identical to the dense path restricted
        to those edges; duplicated radial (edges_in_d=1 passes the squared
        distance twice) matches the reference's
        ``edge_attr = sum((x0-x1)^2)`` convention (edge_denoise.py:155).
        """
        b, n, hd = h.shape
        act = active.astype(h.dtype)[..., None]             # (B,N,1)
        # parent gather as a one-hot matmul: take_along_axis lowers to a
        # catastrophically slow scalar gather on TPU (measured 32 ms/pass at
        # B=256,N=24,H=256 — 250x the FLOP cost); the one-hot contraction
        # runs on the MXU. precision=HIGHEST keeps the selection bit-exact
        # (each output row sums exactly one 1.0*h product).
        onehot_parent = jax.nn.one_hot(parent, n, dtype=h.dtype)     # (B,N,N)
        sel = lambda t: jax.lax.dot_general(
            onehot_parent, t, (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST)
        h_par = sel(h)
        x_par = sel(x)

        if reverse:
            src_h, dst_h = h_par, h
            diff = x_par - x                                 # x_src - x_dst
        else:
            src_h, dst_h = h, h_par
            diff = x - x_par
        radial = jnp.sum(diff**2, axis=-1, keepdims=True)
        coord_diff = diff / (jnp.sqrt(radial + 1e-8) + 1.0)

        e = radial if self.edges_in_d > 0 else None
        m = self.message(self.mes_src(src_h), self.mes_dst(dst_h), radial, e) * act

        onehot_par = onehot_parent * act                    # (B,N,N)

        if reverse:
            # receivers are the active nodes themselves — pure gather
            if self.coord_update:
                x = x + coord_diff * self.coord_scalar(m) * act
            recv = act if self.gated else None
            h = self.node_update(h, m, recv)
        else:
            # receivers are parents — one-hot scatter-matmul on the MXU
            if self.coord_update:
                trans = coord_diff * self.coord_scalar(m) * act
                x = x + jnp.einsum("bnc,bnj->bjc", trans, onehot_par)
            agg = jnp.einsum("bnh,bnj->bjh", m, onehot_par)
            recv = (jnp.einsum("bnj->bj", onehot_par) > 0).astype(h.dtype)[..., None] if self.gated else None
            h = self.node_update(h, agg, recv)

        if node_mask is not None:
            h = h * node_mask
            x = x * node_mask
        return h, x
