"""Dense masked E(3)-equivariant GNN for padded fragment point clouds.

TPU-first reformulation of the reference EGNN
(endiffusion/models/layers/egnn_new.py): instead of materializing B*N^2 edge
index lists and scatter-adds, everything is a dense (B, N, N, ...) tensor with
an edge mask, so message passing is batched matmuls (MXU) plus masked
reductions over the neighbor axis (VPU) — no gathers or scatters at all.

The pairwise first linear layer is decomposed: ``cat([h_i, h_j, e]) @ W`` is
computed as ``h @ W_src  (+bcast)  h @ W_dst  (+)  e @ W_e`` which avoids ever
writing the (B, N, N, 2H+e) concatenated tensor to HBM — the largest
intermediate is the (B, N, N, H) message tensor itself.

Semantics intentionally match the reference exactly (same MLP shapes,
attention gating, residuals, normalization_factor, tanh coordinate bound,
per-block re-computed distances) so trained behavior is comparable.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


# torch nn.Linear default init (kaiming_uniform(a=sqrt(5)) == uniform with
# variance fan_in/3). The reference trained with this scale; hotter inits
# (lecun_normal) push the fine-stage trunk into activation blow-up because
# raw squared distances feed the edge MLPs (no normalization there).
torch_linear_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def xavier_scaled_init(gain: float):
    """Xavier-uniform scaled by ``gain`` (for near-zero coordinate heads,
    reference: egnn_new.py:80-81)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[1]
        a = gain * jnp.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -a, a)

    return init


def _mm(a: Array, w: Array, dtype, out_dtype=None) -> Array:
    """Matmul with optional reduced-precision operands.

    With ``dtype='bfloat16'`` the MXU takes bf16 operands (accumulation is
    f32 either way); ``out_dtype`` keeps the OUTPUT in reduced precision so
    the downstream elementwise pipeline runs at doubled VPU width — the
    profiled sampler spends >90% of its device time in the fused
    (B, N, N, H) elementwise chains, not the matmuls. ``None`` keeps full
    f32 (exact reference numerics).
    """
    if dtype is None:
        return a @ w
    return jnp.dot(a.astype(dtype), w.astype(dtype),
                   preferred_element_type=out_dtype or jnp.float32)


def _masked_rowsum(m: Array, edge_mask: Array) -> Array:
    """sum_j m[b,i,j,:] * edge_mask[b,i,j] via dot_general (batch (b,i),
    contract j). m (B,N,N,C), edge_mask (B,N,N,1) or (B,N,N) -> (B,N,C) f32.

    Precision: f32 m needs HIGHEST so the 0/1-mask products are not
    truncated to bf16 operands (exact f32-sum semantics). bf16 m uses
    DEFAULT — the operands are already bf16 (products exact, f32
    accumulation via preferred_element_type), so HIGHEST adds nothing
    (measured a no-op on TPU: identical trace and wall clock, round-3
    roofline A/B). The fusion's 18-24% time share is intrinsic — it
    re-reads the (B,N,N,H) message tensor from HBM."""
    mask = edge_mask[..., 0] if edge_mask.ndim == 4 else edge_mask
    prec = (jax.lax.Precision.HIGHEST if m.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    return jax.lax.dot_general(
        mask.astype(m.dtype), m, (((2,), (2,)), ((0, 1), (0, 1))),
        precision=prec,
        preferred_element_type=jnp.float32)


def sinusoids_embedding(radial: Array, max_res: float = 30.0,
                        min_res: float = 30.0 / 2000.0,
                        div_factor: int = 4) -> Array:
    """Sinusoidal distance embedding of squared distances.

    (..., 1) radial -> (..., 2*n_frequencies) [sin, cos] features of
    sqrt(d^2 + 1e-8) at geometric frequencies; defaults give 12 dims.
    Gradients are stopped, matching the reference's ``.detach()``.
    (reference: egnn_new.py:245-258 SinusoidsEmbeddingNew)
    """
    import math

    n_freq = int(math.log(max_res / min_res, div_factor)) + 1
    freqs = jnp.asarray(
        2.0 * math.pi * (float(div_factor) ** jnp.arange(n_freq)) / max_res,
        radial.dtype)
    x = jnp.sqrt(radial + 1e-8)
    emb = x * freqs                       # (..., 1) * (n,) -> (..., n)
    return jax.lax.stop_gradient(
        jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1))


def coord2diff_dense(x: Array, norm_constant: float = 1.0):
    """Pairwise squared distances and normalized difference vectors.

    x: (B, N, 3) -> radial (B, N, N, 1), diff (B, N, N, 3) where
    diff[b,i,j] = (x_i - x_j) / (|x_i - x_j| + norm_constant).
    (reference: egnn_new.py:260-266)
    """
    diff = x[:, :, None, :] - x[:, None, :, :]
    radial = jnp.sum(diff**2, axis=-1, keepdims=True)
    norm = jnp.sqrt(radial + 1e-8)
    return radial, diff / (norm + norm_constant)


def _edge_proj(e: Array, w_e: Array, dtype) -> Array:
    """e @ w_e for the tiny edge-feature channel (E=2: radial + distances0).

    A K=2 matmul wastes the MXU (the contraction dim pads to the systolic
    width); an explicit per-channel broadcast-sum runs on the VPU alongside
    the adds it feeds into.
    """
    E = e.shape[-1]
    if E == 0:      # plain-GNN mode (in_edge_nf=0): no edge-feature channel
        return jnp.zeros(e.shape[:-1] + (w_e.shape[1],), e.dtype)
    if E <= 4:
        out = e[..., 0, None] * w_e[0]
        for k in range(1, E):
            out = out + e[..., k, None] * w_e[k]
        return out
    return _mm(e, w_e, dtype)


class DenseGCL(nn.Module):
    """Invariant graph conv layer over dense masked edges.

    m_ij = silu(Dense(silu(PairDense(h_i, h_j, e_ij))))      # edge MLP
    m_ij *= sigmoid(att(m_ij))                               # optional gate
    agg_i = sum_j m_ij * edge_mask / normalization_factor    # masked row-sum
    h_i  += Dense(silu(Dense(cat[h_i, agg_i])))              # node MLP
    (reference: egnn_new.py:8-70)

    Parameters are declared raw (not via nn.Dense) so the fused Pallas
    inference kernel (ops/egnn_pallas.py) can consume the identical arrays.
    """

    hidden_nf: int
    normalization_factor: float = 100.0
    aggregation_method: str = "sum"
    attention: bool = False
    use_pallas: bool = False   # fused inference kernel (ops/egnn_pallas.py)
    # fused TRAINING path: custom VJP whose backward rematerializes the edge
    # pipeline in VMEM (egnn_pallas.gcl_vjp) — the bwd-dot/spill fix named
    # by the round-4 training roofline (BASELINE.md)
    pallas_vjp: bool = False
    # XLA-level edge rematerialization (VERDICT r4 #7): jax.checkpoint
    # around ONLY the (B,N,N,H) edge-message chain, so AD saves the small
    # (B,N,·) inputs instead of ~3 (B,N,N,H) silu/gate pre-activations per
    # GCL (~600 MB each at bucket 48 / batch 256 f32) — the spill traffic
    # the round-4 roofline measured interleaved with the wgrad dots. Bwd
    # recomputes the edge MLP (+~1/3 of fwd FLOPs) from h/params instead of
    # reading the saved chain from HBM. Unlike block-level `remat`, the
    # node MLP / coordinate residuals are still saved.
    remat_edges: bool = False
    compute_dtype: Optional[str] = None  # e.g. 'bfloat16'; None = f32 matmuls

    def _params(self, h_dim: int, e_dim: int):
        hnf = self.hidden_nf
        init = torch_linear_init
        zeros = nn.initializers.zeros
        # e_dim == 0 (plain-GNN mode): variance_scaling divides by fan_in
        w_e_init = init if e_dim > 0 else zeros
        p = {
            "edge_in": {
                "w_src": self.param("edge_in_w_src", init, (h_dim, hnf)),
                "w_dst": self.param("edge_in_w_dst", init, (h_dim, hnf)),
                "w_e": self.param("edge_in_w_e", w_e_init, (e_dim, hnf)),
                "bias": self.param("edge_in_bias", zeros, (hnf,)),
            },
            "edge_out": {"kernel": self.param("edge_out_kernel", init, (hnf, hnf)),
                          "bias": self.param("edge_out_bias", zeros, (hnf,))},
            "node_in": {"kernel": self.param("node_in_kernel", init, (2 * hnf, hnf)),
                         "bias": self.param("node_in_bias", zeros, (hnf,))},
            "node_out": {"kernel": self.param("node_out_kernel", init, (hnf, hnf)),
                          "bias": self.param("node_out_bias", zeros, (hnf,))},
        }
        if self.attention:
            p["att"] = {"kernel": self.param("att_kernel", init, (hnf, 1)),
                        "bias": self.param("att_bias", zeros, (1,))}
        return p

    @nn.compact
    def __call__(self, h: Array, edge_attr: Array, node_mask: Array, edge_mask: Array) -> Array:
        p = self._params(h.shape[-1], edge_attr.shape[-1])
        if (self.pallas_vjp and self.aggregation_method == "sum"
                and not self.is_initializing()):
            from hierdiff_tpu.ops.egnn_pallas import gcl_vjp
            return gcl_vjp(self.normalization_factor, self.attention,
                           self.compute_dtype)(h, edge_attr, edge_mask,
                                               node_mask, p)
        if (self.use_pallas and self.aggregation_method == "sum"
                and not self.is_initializing()):
            from hierdiff_tpu.ops.egnn_pallas import fused_gcl
            return fused_gcl(h, edge_attr, edge_mask, node_mask, p,
                             self.normalization_factor, self.attention,
                             compute_dtype=self.compute_dtype)

        dt = self.compute_dtype
        # with compute_dtype set, the whole (B,N,N,H) edge pipeline runs in
        # that dtype (double VPU width for the adds/silu/gate chain — the
        # profiled hot path); accumulations back to f32 at the rowsum
        act = jnp.dtype(dt) if dt is not None else None
        cast = (lambda v: v.astype(act)) if act is not None else (lambda v: v)
        attention = self.attention

        def edge_agg(h_, pe, edge_attr_, edge_mask_):
            ei = pe["edge_in"]
            mij = (_mm(h_, ei["w_src"], dt, act)[:, :, None, :]
                   + _mm(h_, ei["w_dst"], dt, act)[:, None, :, :]
                   + cast(_edge_proj(edge_attr_, ei["w_e"], dt)) + cast(ei["bias"]))
            mij = nn.silu(mij)
            mij = nn.silu(_mm(mij, pe["edge_out"]["kernel"], dt, act)
                          + cast(pe["edge_out"]["bias"]))
            if attention:
                att = nn.sigmoid(_mm(mij, pe["att"]["kernel"], dt, act)
                                 + cast(pe["att"]["bias"]))
                mij = mij * att
            # masked neighbor-sum as a dot_general contraction over j with
            # the mask as the vector operand: the profiled sampler spent 92%
            # of its device time in VPU multiply_reduce fusions doing this
            # same sum — the MXU contraction replaces both the mask-multiply
            # and the reduce
            return _masked_rowsum(mij, edge_mask_)

        if self.remat_edges and not self.is_initializing():
            edge_agg = jax.checkpoint(edge_agg)
        pe = {k: p[k] for k in (("edge_in", "edge_out", "att") if attention
                                else ("edge_in", "edge_out"))}
        agg = edge_agg(h, pe, edge_attr, edge_mask)
        if self.aggregation_method == "sum":
            agg = agg / self.normalization_factor
        elif self.aggregation_method == "mean":
            denom = jnp.maximum(jnp.sum(edge_mask, axis=2), 1.0)
            agg = agg / denom
        else:
            raise ValueError(self.aggregation_method)

        out = _mm(jnp.concatenate([h, agg], axis=-1), p["node_in"]["kernel"], dt) + p["node_in"]["bias"]
        out = nn.silu(out)
        out = _mm(out, p["node_out"]["kernel"], dt) + p["node_out"]["bias"]
        h = h + out
        return h * node_mask


class DenseEquivariantUpdate(nn.Module):
    """Coordinate update: x_i += sum_j (x_i-x_j)/(d+c) * phi(h_i,h_j,e_ij).

    phi ends in a zero-ish-init scalar head, optionally tanh-bounded by
    ``coords_range``. (reference: egnn_new.py:73-110)
    """

    hidden_nf: int
    normalization_factor: float = 100.0
    aggregation_method: str = "sum"
    tanh: bool = False
    coords_range: float = 10.0
    use_pallas: bool = False
    remat_edges: bool = False   # see DenseGCL.remat_edges
    compute_dtype: Optional[str] = None

    def _params(self, h_dim: int, e_dim: int):
        hnf = self.hidden_nf
        init = torch_linear_init
        zeros = nn.initializers.zeros
        return {
            "coord_in": {
                "w_src": self.param("coord_in_w_src", init, (h_dim, hnf)),
                "w_dst": self.param("coord_in_w_dst", init, (h_dim, hnf)),
                "w_e": self.param("coord_in_w_e", init, (e_dim, hnf)),
                "bias": self.param("coord_in_bias", zeros, (hnf,)),
            },
            "coord_mid": {"kernel": self.param("coord_mid_kernel", init, (hnf, hnf)),
                           "bias": self.param("coord_mid_bias", zeros, (hnf,))},
            "coord_head": {"kernel": self.param("coord_head_kernel",
                                                 xavier_scaled_init(0.001), (hnf, 1))},
        }

    @nn.compact
    def __call__(self, h: Array, x: Array, coord_diff: Array, edge_attr: Array,
                 node_mask: Array, edge_mask: Array) -> Array:
        p = self._params(h.shape[-1], edge_attr.shape[-1])
        if (self.use_pallas and self.aggregation_method == "sum"
                and not self.is_initializing()):
            from hierdiff_tpu.ops.egnn_pallas import fused_coord_update
            return fused_coord_update(h, edge_attr, coord_diff, x, edge_mask,
                                      node_mask, p, self.normalization_factor,
                                      self.tanh, self.coords_range,
                                      compute_dtype=self.compute_dtype)
        dt = self.compute_dtype
        act = jnp.dtype(dt) if dt is not None else None
        cast = (lambda v: v.astype(act)) if act is not None else (lambda v: v)
        use_tanh, coords_range = self.tanh, self.coords_range

        def coord_agg(h_, p_, coord_diff_, edge_attr_, edge_mask_):
            ci = p_["coord_in"]
            inp = (_mm(h_, ci["w_src"], dt, act)[:, :, None, :]
                   + _mm(h_, ci["w_dst"], dt, act)[:, None, :, :]
                   + cast(_edge_proj(edge_attr_, ci["w_e"], dt)) + cast(ci["bias"]))
            inp = nn.silu(inp)
            inp = nn.silu(_mm(inp, p_["coord_mid"]["kernel"], dt, act)
                          + cast(p_["coord_mid"]["bias"]))
            # the scalar head returns to f32: it multiplies coordinate
            # differences, and equivariant position updates are the
            # precision-critical path
            scalar = _mm(inp, p_["coord_head"]["kernel"], dt) if dt is not None \
                else inp @ p_["coord_head"]["kernel"]
            if use_tanh:
                scalar = jnp.tanh(scalar) * coords_range
            # masked neighbor-sum on the MXU (see _masked_rowsum)
            return _masked_rowsum(coord_diff_ * scalar, edge_mask_)

        if self.remat_edges and not self.is_initializing():
            coord_agg = jax.checkpoint(coord_agg)
        agg = coord_agg(h, p, coord_diff, edge_attr, edge_mask)
        if self.aggregation_method == "sum":
            agg = agg / self.normalization_factor
        elif self.aggregation_method == "mean":
            denom = jnp.maximum(jnp.sum(edge_mask, axis=2), 1.0)
            agg = agg / denom
        else:
            raise ValueError(self.aggregation_method)
        return (x + agg) * node_mask


class DenseEquivariantBlock(nn.Module):
    """inv_sublayers x DenseGCL + one coordinate update, with per-block
    recomputed distances appended to the block-input distance channel.
    (reference: egnn_new.py:113-152)
    """

    hidden_nf: int
    n_layers: int = 2
    attention: bool = True
    tanh: bool = False
    coords_range: float = 15.0
    norm_constant: float = 1.0
    normalization_factor: float = 100.0
    aggregation_method: str = "sum"
    use_pallas: bool = False
    pallas_vjp: bool = False
    remat_edges: bool = False   # see DenseGCL.remat_edges
    compute_dtype: Optional[str] = None
    sin_embedding: bool = False

    @nn.compact
    def __call__(self, h: Array, x: Array, distances0: Array, node_mask: Array, edge_mask: Array):
        radial, coord_diff = coord2diff_dense(x, self.norm_constant)
        if self.sin_embedding:
            # per-block distances sinusoid-embedded before the concat
            # (reference: egnn_new.py:143-145); distances0 arrives embedded
            radial = sinusoids_embedding(radial)
        edge_attr = jnp.concatenate([radial, distances0], axis=-1)
        for i in range(self.n_layers):
            h = DenseGCL(
                self.hidden_nf,
                normalization_factor=self.normalization_factor,
                aggregation_method=self.aggregation_method,
                attention=self.attention,
                use_pallas=self.use_pallas,
                pallas_vjp=self.pallas_vjp,
                remat_edges=self.remat_edges,
                compute_dtype=self.compute_dtype,
                name=f"gcl_{i}",
            )(h, edge_attr, node_mask, edge_mask)
        x = DenseEquivariantUpdate(
            self.hidden_nf,
            normalization_factor=self.normalization_factor,
            aggregation_method=self.aggregation_method,
            tanh=self.tanh,
            coords_range=self.coords_range,
            use_pallas=self.use_pallas,
            remat_edges=self.remat_edges,
            compute_dtype=self.compute_dtype,
            name="gcl_equiv",
        )(h, x, coord_diff, edge_attr, node_mask, edge_mask)
        return h * node_mask, x


class DenseEGNN(nn.Module):
    """Full EGNN: embed -> n_layers equivariant blocks -> project out.

    Inputs are dense padded: h (B, N, in_nf), x (B, N, 3), node_mask
    (B, N, 1), edge_mask (B, N, N, 1). Returns updated (h, x).
    (reference: egnn_new.py:155-205)
    """

    hidden_nf: int = 256
    out_node_nf: Optional[int] = None
    n_layers: int = 6
    inv_sublayers: int = 2
    attention: bool = True
    tanh: bool = True
    coords_range: float = 30.0
    norm_constant: float = 1.0
    normalization_factor: float = 100.0
    aggregation_method: str = "sum"
    remat: bool = False
    remat_edges: bool = False   # see DenseGCL.remat_edges
    use_pallas: bool = False
    pallas_vjp: bool = False
    compute_dtype: Optional[str] = None
    sin_embedding: bool = False

    @nn.compact
    def __call__(self, h: Array, x: Array, node_mask: Array, edge_mask: Array):
        out_nf = self.out_node_nf if self.out_node_nf is not None else h.shape[-1]
        distances0, _ = coord2diff_dense(x, norm_constant=1.0)
        if self.sin_embedding:
            # top-level distances embedded ONCE from the input coordinates
            # and fed unchanged to every block (reference: egnn_new.py:196-198)
            distances0 = sinusoids_embedding(distances0)
        h = nn.Dense(self.hidden_nf, kernel_init=torch_linear_init, name="embedding")(h)
        coords_range_layer = float(self.coords_range) / self.n_layers
        block_cls = DenseEquivariantBlock
        if self.remat:
            block_cls = nn.remat(DenseEquivariantBlock, static_argnums=())
        for i in range(self.n_layers):
            h, x = block_cls(
                self.hidden_nf,
                n_layers=self.inv_sublayers,
                attention=self.attention,
                tanh=self.tanh,
                coords_range=coords_range_layer,
                norm_constant=self.norm_constant,
                normalization_factor=self.normalization_factor,
                aggregation_method=self.aggregation_method,
                use_pallas=self.use_pallas,
                pallas_vjp=self.pallas_vjp,
                remat_edges=self.remat_edges,
                compute_dtype=self.compute_dtype,
                sin_embedding=self.sin_embedding,
                name=f"e_block_{i}",
            )(h, x, distances0, node_mask, edge_mask)
        h = nn.Dense(out_nf, kernel_init=torch_linear_init, name="embedding_out")(h)
        return h * node_mask, x


class DenseGNN(nn.Module):
    """Plain (non-equivariant) GNN: embed -> n_layers DenseGCL with no edge
    features -> project out. The reference's ``gnn_dynamics`` backbone
    (egnn_new.py:208-242, selected by ``mode: gnn_dynamics`` in
    conf/model/ddpmgblur.yaml:32); coordinates ride in the node features.

    Reference parity notes: the torch GNN is called WITHOUT an edge mask
    (en_dynamics.py:92 passes only node_mask) over the cached edge list that
    includes self-edges (en_dynamics.py:124-143), so aggregation here uses
    an all-ones edge mask including the diagonal and padded pairs — the
    caller masks node features, exactly like the reference.
    """

    hidden_nf: int = 256
    out_node_nf: Optional[int] = None
    n_layers: int = 4
    attention: bool = False
    normalization_factor: float = 100.0
    aggregation_method: str = "sum"
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, h: Array, node_mask: Array):
        b, n, _ = h.shape
        out_nf = self.out_node_nf if self.out_node_nf is not None else h.shape[-1]
        edge_attr = jnp.zeros((b, n, n, 0), h.dtype)
        ones = jnp.ones((b, n, n, 1), h.dtype)
        h = nn.Dense(self.hidden_nf, kernel_init=torch_linear_init,
                     name="embedding")(h)
        for i in range(self.n_layers):
            h = DenseGCL(
                self.hidden_nf,
                normalization_factor=self.normalization_factor,
                aggregation_method=self.aggregation_method,
                attention=self.attention,
                compute_dtype=self.compute_dtype,
                name=f"gcl_{i}",
            )(h, edge_attr, node_mask, ones)
        h = nn.Dense(out_nf, kernel_init=torch_linear_init,
                     name="embedding_out")(h)
        return h * node_mask
