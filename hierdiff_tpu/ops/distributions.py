"""Node-count prior: categorical over the fragment-count histogram.

(reference: endiffusion/models/distributions.py:62-102)
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class DistributionNodes:
    """Categorical prior over molecule fragment counts.

    Built from a histogram {n_nodes: count}. Sampling returns integer node
    counts; ``log_prob`` evaluates counts' log-probability. Host-side numpy
    for the sampler (it feeds bucketing decisions on the host), JAX for
    ``log_prob`` so it composes into jitted likelihoods.
    """

    def __init__(self, histogram: Mapping[int, float]):
        items = sorted(histogram.items())
        self.n_nodes = np.array([k for k, _ in items], dtype=np.int32)
        prob = np.array([v for _, v in items], dtype=np.float64)
        self.prob = (prob / prob.sum()).astype(np.float32)
        # dense lookup table over node counts for log_prob
        max_n = int(self.n_nodes.max())
        dense = np.zeros(max_n + 1, dtype=np.float32)
        dense[self.n_nodes] = self.prob
        self._dense_prob = jnp.asarray(dense)

    @property
    def entropy(self) -> float:
        return float(-np.sum(self.prob * np.log(self.prob + 1e-30)))

    def sample(self, key: Array, n_samples: int = 1) -> np.ndarray:
        """Sample node counts (host numpy array of ints)."""
        idx = jax.random.choice(key, len(self.n_nodes), shape=(n_samples,), p=jnp.asarray(self.prob))
        return np.asarray(self.n_nodes[np.asarray(idx)])

    def sample_np(self, rng: np.random.Generator, n_samples: int = 1) -> np.ndarray:
        """Pure-numpy sampler for host-side pipelines."""
        idx = rng.choice(len(self.n_nodes), size=n_samples, p=self.prob / self.prob.sum())
        return self.n_nodes[idx]

    def log_prob(self, batch_n_nodes: Array) -> Array:
        return jnp.log(self._dense_prob[batch_n_nodes] + 1e-30)
