"""Gaussian KL / entropy losses for the masked diffusion VLB.

(reference: endiffusion/loss/criterion.py)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from hierdiff_tpu.ops.masked import sum_except_batch

Array = jax.Array


def gaussian_entropy(mu: Array, sigma: Array) -> Array:
    """Entropy of N(mu, sigma^2), summed over non-batch dims.
    (reference: criterion.py:9-14)
    """
    zeros = jnp.zeros_like(mu)
    return sum_except_batch(zeros + 0.5 * jnp.log(2 * math.pi * sigma**2) + 0.5)


def gaussian_kl(q_mu: Array, q_sigma: Array, p_mu: Array, p_sigma: Array, node_mask: Array) -> Array:
    """KL(q || p) between diagonal Gaussians, masked and summed per batch.
    (reference: criterion.py:16-33)
    """
    kl = jnp.log(p_sigma / q_sigma) + 0.5 * (q_sigma**2 + (q_mu - p_mu) ** 2) / (p_sigma**2) - 0.5
    return sum_except_batch(kl * node_mask.astype(kl.dtype))


def gaussian_kl_for_dimension(q_mu: Array, q_sigma: Array, p_mu: Array, p_sigma: Array, d: Array) -> Array:
    """KL between isotropic Gaussians on a d-dimensional subspace.

    ``q_sigma``/``p_sigma`` are per-batch scalars (shape (B,)); ``d`` the
    subspace dimension per batch element. (reference: criterion.py:36-50)
    """
    mu_norm2 = sum_except_batch((q_mu - p_mu) ** 2)
    return d * jnp.log(p_sigma / q_sigma) + 0.5 * (d * q_sigma**2 + mu_norm2) / (p_sigma**2) - 0.5 * d
