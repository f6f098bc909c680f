"""Coarse-stage ancestral sampler: 1000 reverse steps as ONE lax.scan.

The reference runs a Python loop of 1000 sequential EGNN forwards with a
host round-trip per step (diffusion_qm9.py:375-384). Here the whole reverse
process is a single jitted ``lax.scan``: gamma is precomputed on the T+1 grid
(valid because t always lands on the grid — cf. noise_model.py:158-160), so
each step is pure device compute. Batches of heterogeneous molecule sizes run
in lockstep via node masks.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hierdiff_tpu.models.diffusion import CoarseDiffusion
from hierdiff_tpu.ops.masked import remove_mean_with_mask, sample_combined_noise

Array = jax.Array


def make_masks_for_counts(counts: np.ndarray, max_n: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
    """Node mask (B, N, 1) and fully-connected no-self-loop edge mask (B, N, N)
    for a batch of molecule sizes. (reference: diffusion_qm9.py:349-359)
    """
    b = len(counts)
    n = int(max_n if max_n is not None else max(counts))
    node_mask = np.zeros((b, n, 1), np.float32)
    edge_mask = np.zeros((b, n, n), np.float32)
    for i, c in enumerate(counts):
        c = int(c)
        node_mask[i, :c] = 1.0
        edge_mask[i, :c, :c] = 1.0 - np.eye(c)
    return node_mask, edge_mask


@partial(jax.jit, static_argnames=("model", "unroll", "steps", "packed"))
def sample_coarse(
    model: CoarseDiffusion,
    params,
    rng: Array,
    node_mask: Array,
    edge_mask: Array,
    context: Optional[Array] = None,
    unroll: int = 1,
    steps: Optional[int] = None,
    packed: bool = False,
) -> Tuple[Array, Array]:
    """Draw (x, h) ~ p(x, h) for a batch of masked point clouds.

    Returns x (B, N, 3) CoM-free coordinates and h (B, N, h_nf) blur features
    (unnormalized, zeroed outside the mask). (reference: diffusion_qm9.py:348-395)

    ``steps`` (default ``model.timesteps``) subsamples the reverse chain to a
    DDPM subsequence: p(z_s | z_t) is evaluated at strided (s, t) grid pairs.
    Exact under the VDM algebra — ``sample_zs_stats`` takes arbitrary
    gamma_s < gamma_t (sigma_and_alpha_t_given_s holds for any s < t) — so
    fewer steps trade sample fidelity for a proportional wall-clock cut, a
    knob the reference's fixed 1000-step loop does not expose.
    """
    b, n = node_mask.shape[:2]
    T = model.timesteps
    steps = T if steps is None else min(steps, T)
    rng, rng_init = jax.random.split(rng)

    apply = lambda method, *a, **k: model.apply(params, *a, method=method, **k)

    gamma_grid = apply(CoarseDiffusion.gamma_grid)  # (T+1,)

    z = sample_combined_noise(rng_init, node_mask, model.n_dims, model.in_node_nf)

    # integer time ladder T = t_0 > t_1 > ... > t_steps = 0 (strided grid)
    ladder = jnp.round(jnp.linspace(T, 0, steps + 1)).astype(jnp.int32)
    t_arr, s_arr = ladder[:-1], ladder[1:]

    def step(z, ts):
        t_int, s_int = ts
        gamma_s = jnp.broadcast_to(gamma_grid[s_int], (b, 1))
        gamma_t = jnp.broadcast_to(gamma_grid[t_int], (b, 1))
        t_norm = jnp.broadcast_to(t_int.astype(jnp.float32) / T, (b, 1))
        mu, sigma = apply(
            CoarseDiffusion.sample_zs_stats, z, gamma_s, gamma_t,
            node_mask, edge_mask, t_norm, context)
        eps = sample_combined_noise(
            jax.random.fold_in(rng, s_int), node_mask, model.n_dims, model.in_node_nf)
        z_new = mu + sigma * eps
        # re-project x to the CoM-free subspace every step
        # (reference: diffusion_qm9.py:340-344)
        zx = remove_mean_with_mask(z_new[:, :, : model.n_dims], node_mask)
        z_new = jnp.concatenate([zx, z_new[:, :, model.n_dims:]], axis=2)
        return z_new, ()

    z, _ = jax.lax.scan(step, z, (t_arr, s_arr), unroll=unroll)

    mu_x, sigma_x = apply(CoarseDiffusion.sample_x_given_z0_stats, z, node_mask, edge_mask, context)
    eps = sample_combined_noise(jax.random.fold_in(rng, T), node_mask, model.n_dims, model.in_node_nf)
    xh = mu_x + sigma_x * eps
    x = xh[:, :, : model.n_dims]
    h = z[:, :, model.n_dims:]  # h taken from z0 (reference: diffusion_qm9.py:308)
    x, h = apply(CoarseDiffusion.unnormalize, x, h, node_mask)
    if packed:
        # one (B, N, 3+F) output = ONE tunnel readback instead of two
        # (~20-30 ms saved per returned array; see sampling/lattice.py)
        return jnp.concatenate([x, h], axis=-1)
    return x, h


@partial(jax.jit, static_argnames=("model",))
def _seg_init(model: CoarseDiffusion, params, rng: Array, node_mask: Array):
    """Segmented-chain phase 1: z_T ~ N(0, I) on the masked support.
    Splits rng exactly like ``sample_coarse`` so the segmented chain draws
    the IDENTICAL noise stream (init from rng_init, per-step from
    fold_in(rng, s))."""
    rng, rng_init = jax.random.split(rng)
    z = sample_combined_noise(rng_init, node_mask, model.n_dims, model.in_node_nf)
    return z, rng


@partial(jax.jit, static_argnames=("model", "unroll"))
def _seg_scan(model: CoarseDiffusion, params, rng: Array, z: Array,
              node_mask: Array, edge_mask: Array, t_arr: Array, s_arr: Array,
              context: Optional[Array] = None, unroll: int = 1) -> Array:
    """Segmented-chain phase 2: ``len(t_arr)`` reverse steps of the ladder.

    The step body is byte-for-byte the ``sample_coarse`` scan body (same ops,
    same rng fold by s), with the (t, s) ladder values passed as DYNAMIC
    inputs of static length — one compiled program serves every segment, so
    a 1000-step chunk becomes ~steps/seg small device programs between which
    the fine stage's fused-check dispatches can slot on the single-chip FIFO
    queue (stage-1/2 overlap; see pipeline.CoarseChunkProgram)."""
    b = node_mask.shape[0]
    T = model.timesteps
    apply = lambda method, *a, **k: model.apply(params, *a, method=method, **k)
    gamma_grid = apply(CoarseDiffusion.gamma_grid)  # (T+1,)

    def step(z, ts):
        t_int, s_int = ts
        gamma_s = jnp.broadcast_to(gamma_grid[s_int], (b, 1))
        gamma_t = jnp.broadcast_to(gamma_grid[t_int], (b, 1))
        t_norm = jnp.broadcast_to(t_int.astype(jnp.float32) / T, (b, 1))
        mu, sigma = apply(
            CoarseDiffusion.sample_zs_stats, z, gamma_s, gamma_t,
            node_mask, edge_mask, t_norm, context)
        eps = sample_combined_noise(
            jax.random.fold_in(rng, s_int), node_mask, model.n_dims, model.in_node_nf)
        z_new = mu + sigma * eps
        zx = remove_mean_with_mask(z_new[:, :, : model.n_dims], node_mask)
        z_new = jnp.concatenate([zx, z_new[:, :, model.n_dims:]], axis=2)
        return z_new, ()

    z, _ = jax.lax.scan(step, z, (t_arr, s_arr), unroll=unroll)
    return z


@partial(jax.jit, static_argnames=("model", "packed"))
def _seg_final(model: CoarseDiffusion, params, rng: Array, z: Array,
               node_mask: Array, edge_mask: Array,
               context: Optional[Array] = None, packed: bool = False):
    """Segmented-chain phase 3: x ~ p(x | z_0), unnormalize, pack."""
    apply = lambda method, *a, **k: model.apply(params, *a, method=method, **k)
    T = model.timesteps
    mu_x, sigma_x = apply(CoarseDiffusion.sample_x_given_z0_stats, z,
                          node_mask, edge_mask, context)
    eps = sample_combined_noise(jax.random.fold_in(rng, T), node_mask,
                                model.n_dims, model.in_node_nf)
    xh = mu_x + sigma_x * eps
    x = xh[:, :, : model.n_dims]
    h = z[:, :, model.n_dims:]
    x, h = apply(CoarseDiffusion.unnormalize, x, h, node_mask)
    if packed:
        return jnp.concatenate([x, h], axis=-1)
    return x, h


class CoarseChunkProgram:
    """One coarse chunk's reverse chain as a SEQUENCE of small device
    programs (init -> seg-scan x K -> final) instead of ``sample_coarse``'s
    single monolithic scan.

    Why: on one chip the XLA execution queue is FIFO — during stage-1/2
    overlap a fine-stage fused-check dispatched behind a monolithic
    multi-second 1000-step chunk scan waits for ALL of it, so refine rounds
    crawl during the coarse window and the overlap nets ~0 (measured:
    round-5 overlap A/B, 32.8 vs 33.1 mol/s). With ~``seg``-step segments
    the queue wait drops to the in-flight segment budget (~2 x seg_time),
    letting fine rounds interleave at fine granularity. Segment state chains
    device-to-device (no readbacks); only the final packed (B,N,3+F) array
    is read back, same as the monolithic path.

    Noise stream: identical to ``sample_coarse`` (init noise from the same
    split, per-step noise keyed by the ladder's s values, final x noise by
    T) — segmentation changes program BOUNDARIES only, not any per-step
    math. Bit-equality with the monolithic program is pinned in
    tests/test_beam.py::test_segmented_coarse_matches_monolithic.

    ``advance()`` dispatches the next program without blocking; ``pending``
    holds dispatched-not-yet-ready futures (prune() drops ready ones) so a
    feeder can bound the device queue depth. ``result`` is the final packed
    future once everything is dispatched.
    """

    def __init__(self, model: CoarseDiffusion, params, rng: Array,
                 node_mask, edge_mask, context=None,
                 steps: Optional[int] = None, seg: int = 128,
                 unroll: int = 1, packed: bool = True):
        T = model.timesteps
        steps = T if steps is None else min(steps, T)
        ladder = np.round(np.linspace(T, 0, steps + 1)).astype(np.int32)
        t_arr, s_arr = ladder[:-1], ladder[1:]
        seg = max(1, min(int(seg), steps))
        self._slices = [(t_arr[i:i + seg], s_arr[i:i + seg])
                        for i in range(0, steps, seg)]
        self.model, self.params = model, params
        self.node_mask = jnp.asarray(node_mask)
        self.edge_mask = jnp.asarray(edge_mask)
        self.context = context
        self.unroll, self.packed = unroll, packed
        self.z, self.rng = _seg_init(model, params, rng, self.node_mask)
        self._i = 0
        self._out = None
        self.pending = [self.z]

    @staticmethod
    def _ready(fut) -> bool:
        return getattr(fut, "is_ready", lambda: False)()

    def prune(self) -> int:
        """Drop completed futures; return the in-flight (unready) count."""
        self.pending = [f for f in self.pending if not self._ready(f)]
        return len(self.pending)

    @property
    def dispatched_all(self) -> bool:
        return self._out is not None

    @property
    def result(self):
        return self._out

    def advance(self) -> None:
        """Dispatch the next segment (or the final program). Non-blocking."""
        if self._out is not None:
            return
        if self._i < len(self._slices):
            t, s = self._slices[self._i]
            self._i += 1
            self.z = _seg_scan(self.model, self.params, self.rng, self.z,
                               self.node_mask, self.edge_mask,
                               jnp.asarray(t), jnp.asarray(s),
                               self.context, self.unroll)
            self.pending.append(self.z)
            return
        self._out = _seg_final(self.model, self.params, self.rng, self.z,
                               self.node_mask, self.edge_mask, self.context,
                               self.packed)
        try:
            self._out.copy_to_host_async()
        except Exception:
            pass
        self.pending.append(self._out)


@partial(jax.jit, static_argnames=("model", "steps"))
def sample_coarse_pocket(
    model: CoarseDiffusion,
    params,
    rng: Array,
    node_mask: Array,
    edge_mask: Array,
    protein_feat: Array,
    protein_pos: Array,
    protein_node_mask: Array,
    protein_edge_mask: Array,
    steps: Optional[int] = None,
) -> Tuple[Array, Array]:
    """Pocket-conditioned sampling: molecule rows diffuse, pocket rows are
    frozen context appended after them. (reference: diffusion_qm9.py:361-384)

    Returns (x, h) for the molecule rows only. ``steps`` strides the reverse
    chain exactly as in :func:`sample_coarse`.
    """
    b, n_mol = node_mask.shape[:2]
    k = protein_pos.shape[1]
    T = model.timesteps
    steps = T if steps is None else min(steps, T)
    rng, rng_init = jax.random.split(rng)

    apply = lambda method, *a, **kw: model.apply(params, *a, method=method, **kw)
    gamma_grid = apply(CoarseDiffusion.gamma_grid)

    pfeat = model.apply(params, protein_feat.astype(jnp.int32),
                        method=lambda m, f: m.pocket_embed(f))
    pocket_xh = jnp.concatenate([protein_pos, pfeat], axis=2)

    nm_cat = jnp.concatenate([node_mask, protein_node_mask], axis=1)
    n_tot = n_mol + k
    em_cat = jnp.zeros((b, n_tot, n_tot))
    em_cat = em_cat.at[:, :n_mol, :n_mol].set(edge_mask)
    em_cat = em_cat.at[:, n_mol:, n_mol:].set(protein_edge_mask)
    if model.pocket_cross_edges:
        cross = node_mask[:, :, 0, None] * protein_node_mask[:, None, :, 0]
        em_cat = em_cat.at[:, :n_mol, n_mol:].set(cross)
        em_cat = em_cat.at[:, n_mol:, :n_mol].set(jnp.transpose(cross, (0, 2, 1)))

    z = sample_combined_noise(rng_init, node_mask, model.n_dims, model.in_node_nf)

    ladder = jnp.round(jnp.linspace(T, 0, steps + 1)).astype(jnp.int32)
    t_arr, s_arr = ladder[:-1], ladder[1:]

    def step(z, ts):
        t_int, s_int = ts
        gamma_s = jnp.broadcast_to(gamma_grid[s_int], (b, 1))
        gamma_t = jnp.broadcast_to(gamma_grid[t_int], (b, 1))
        t_norm = jnp.broadcast_to(t_int.astype(jnp.float32) / T, (b, 1))
        z_cat = jnp.concatenate([z, pocket_xh], axis=1)
        mu, sigma = apply(CoarseDiffusion.sample_zs_stats, z_cat, gamma_s, gamma_t,
                          nm_cat, em_cat, t_norm, None, mol_shape=n_mol)
        eps = sample_combined_noise(jax.random.fold_in(rng, s_int), node_mask,
                                    model.n_dims, model.in_node_nf)
        z_new = mu + sigma * eps
        zx = remove_mean_with_mask(z_new[:, :, : model.n_dims], node_mask)
        return jnp.concatenate([zx, z_new[:, :, model.n_dims:]], axis=2), ()

    z, _ = jax.lax.scan(step, z, (t_arr, s_arr))

    mu_x, sigma_x = apply(CoarseDiffusion.sample_x_given_z0_stats, z, node_mask, edge_mask, None)
    eps = sample_combined_noise(jax.random.fold_in(rng, T), node_mask, model.n_dims, model.in_node_nf)
    xh = mu_x + sigma_x * eps
    x = xh[:, :, : model.n_dims]
    h = z[:, :, model.n_dims:]
    x, h = apply(CoarseDiffusion.unnormalize, x, h, node_mask)
    return x, h
