"""EGNN dynamics: the eps-prediction network of the coarse diffusion model.

Dense-masked equivalent of the reference wrapper
(endiffusion/models/module/en_dynamics.py): appends the diffusion time (and
optional global context) as extra node channels, runs the EGNN, converts the
coordinate output to a CoM-free velocity, and returns cat([vel, h_out]).

No flattening to (B*N, ...) and no cached edge-index lists — the fully
connected graph is just the (B, N, N, 1) edge mask built by the collator.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from hierdiff_tpu.ops.egnn import DenseEGNN
from hierdiff_tpu.ops.masked import remove_mean_with_mask

Array = jax.Array


class EGNNDynamics(nn.Module):
    """eps_theta(z_t, t): (B, N, 3 + h_nf) -> (B, N, 3 + h_nf).

    (reference: en_dynamics.py:49-122)
    """

    in_node_nf: int  # h feature dims EXCLUDING time/context channels
    context_node_nf: int = 0
    n_dims: int = 3
    hidden_nf: int = 256
    n_layers: int = 6
    inv_sublayers: int = 2
    attention: bool = True
    tanh: bool = True
    coords_range: float = 30.0
    norm_constant: float = 0.0
    normalization_factor: float = 10.0
    aggregation_method: str = "sum"
    condition_time: bool = True
    remat: bool = False
    remat_edges: bool = False   # see ops.egnn.DenseGCL.remat_edges
    use_pallas: bool = False
    pallas_vjp: bool = False
    compute_dtype: Optional[str] = None
    # reference knobs off in the live config but constructor-reachable
    # (conf/model/ddpmgblur.yaml:32,35): 'egnn_dynamics' | 'gnn_dynamics'
    mode: str = "egnn_dynamics"
    sin_embedding: bool = False

    @nn.compact
    def __call__(
        self,
        t: Array,
        xh: Array,
        node_mask: Array,
        edge_mask: Array,
        context: Optional[Array] = None,
        mol_shape: Optional[int] = None,
    ) -> Array:
        b, n, dims = xh.shape
        h_dims = dims - self.n_dims
        node_mask = node_mask.astype(xh.dtype)
        if edge_mask.ndim == 3:
            edge_mask = edge_mask[..., None]
        edge_mask = edge_mask.astype(xh.dtype)

        xh = xh * node_mask
        x = xh[:, :, : self.n_dims]
        if h_dims == 0:
            h = jnp.ones((b, n, 1), xh.dtype)
        else:
            h = xh[:, :, self.n_dims:]

        if self.condition_time:
            # t: scalar or (B,) or (B,1) -> (B, N, 1)
            t_b = jnp.broadcast_to(jnp.reshape(t, (-1, 1, 1)), (b, n, 1)).astype(h.dtype)
            h = jnp.concatenate([h, t_b], axis=-1)

        if context is not None and self.context_node_nf > 0:
            h = jnp.concatenate([h, context.reshape(b, n, self.context_node_nf)], axis=-1)

        egnn_in = self.in_node_nf + self.context_node_nf + (1 if self.condition_time else 0)
        assert h.shape[-1] == egnn_in, (h.shape, egnn_in)

        if self.mode == "gnn_dynamics":
            # plain-GNN dynamics (reference: en_dynamics.py:25-30,90-94):
            # coordinates become node features, the net predicts
            # [vel, h_final] directly; x_final freeze (mol_shape) does not
            # apply — the reference only implements it on the egnn branch
            from hierdiff_tpu.ops.egnn import DenseGNN
            out = DenseGNN(
                hidden_nf=self.hidden_nf,
                out_node_nf=self.n_dims + egnn_in,
                n_layers=self.n_layers,
                attention=self.attention,
                normalization_factor=self.normalization_factor,
                aggregation_method=self.aggregation_method,
                compute_dtype=self.compute_dtype,
                name="gnn",
            )(jnp.concatenate([x, h], axis=-1), node_mask)
            vel = out[:, :, : self.n_dims] * node_mask
            h_final = out[:, :, self.n_dims:]
        elif self.mode == "egnn_dynamics":
            h_final, x_final = self._egnn(h, x, node_mask, edge_mask)
            if mol_shape is not None:
                # freeze pocket coordinates beyond the molecule rows
                # (reference: en_dynamics.py:83-88)
                x_final = jnp.concatenate(
                    [x_final[:, :mol_shape], x[:, mol_shape:]], axis=1)
            vel = (x_final - x) * node_mask
        else:
            raise ValueError(f"Wrong mode {self.mode}")

        if context is not None and self.context_node_nf > 0:
            h_final = h_final[:, :, : -self.context_node_nf]
        if self.condition_time:
            h_final = h_final[:, :, :-1]

        # NaN guard (reference: en_dynamics.py:109-111). PER-SAMPLE instead
        # of the reference's whole-batch any(): bit-identical when no NaN
        # occurs, only zeroes the offending molecule when one does, and —
        # critically for scaling — keeps the reduction shard-local. The
        # batch-global any() forced XLA to emit a scalar pred all-reduce
        # inside EVERY reverse step when the batch is sharded over a mesh
        # (a cross-chip sync per step; see tests/test_weak_scaling.py).
        bad = jnp.any(jnp.isnan(vel), axis=(1, 2), keepdims=True)
        vel = jnp.where(bad, jnp.zeros_like(vel), vel)
        vel = remove_mean_with_mask(vel, node_mask)

        if h_dims == 0:
            return vel
        return jnp.concatenate([vel, h_final], axis=2)

    def _egnn(self, h, x, node_mask, edge_mask):
        egnn_in = (self.in_node_nf + self.context_node_nf
                   + (1 if self.condition_time else 0))
        return DenseEGNN(
            hidden_nf=self.hidden_nf,
            out_node_nf=egnn_in,
            n_layers=self.n_layers,
            inv_sublayers=self.inv_sublayers,
            attention=self.attention,
            tanh=self.tanh,
            coords_range=self.coords_range,
            norm_constant=self.norm_constant,
            normalization_factor=self.normalization_factor,
            aggregation_method=self.aggregation_method,
            remat=self.remat,
            remat_edges=self.remat_edges,
            use_pallas=self.use_pallas,
            pallas_vjp=self.pallas_vjp,
            compute_dtype=self.compute_dtype,
            sin_embedding=self.sin_embedding,
            name="egnn",
        )(h, x, node_mask, edge_mask)
