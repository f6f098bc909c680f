"""Device-side graph utilities: BFS depths and depth-layer masks.

The reference builds ragged per-depth edge lists on the host
(data_utils/data_diffuse.py:60-79) for every batch. Here BFS distances are
computed ON DEVICE by frontier expansion (N matmul steps over the dense
adjacency), and each depth layer's directed mask is derived on the fly inside
the scan — nothing ragged ever crosses the host boundary, which is what makes
the autoregressive sampling step a single jitted call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def bfs_depths(adj: Array, start_onehot: Array) -> Array:
    """BFS distance from ``start`` over a symmetric dense adjacency.

    adj: (B, N, N) 0/1; start_onehot: (B, N). Returns (B, N) int32 depths,
    -1 for unreachable nodes (including everything when start_onehot is all
    zero — the root-step case).
    """
    n = adj.shape[1]
    depth0 = jnp.where(start_onehot > 0, 0, -1).astype(jnp.int32)

    def body(d, carry):
        depth, frontier = carry
        nbr = jnp.einsum("bij,bj->bi", adj, frontier) > 0
        new = nbr & (depth < 0)
        depth = jnp.where(new, d, depth)
        return depth, new.astype(adj.dtype)

    depth, _ = jax.lax.fori_loop(1, n, body, (depth0, start_onehot.astype(adj.dtype)))
    return depth


def depth_layer_mask(adj: Array, depth: Array, d: Array) -> Array:
    """Directed mask of the BFS layer at distance ``d``: edges from nodes at
    depth d to their depth-(d-1) neighbors (far -> near), shape (B, N, N)."""
    di = depth[:, :, None]
    dj = depth[:, None, :]
    return adj * (di == d) * (dj == d - 1) * (dj >= 0)


def circle_mask(b: int, n: int, dtype=jnp.float32) -> Array:
    """The reference's "circle" layer: a self-loop on node 0 of each sample.
    (reference: edge_denoise.py:151-152)"""
    m = jnp.zeros((b, n, n), dtype)
    return m.at[:, 0, 0].set(1.0)
