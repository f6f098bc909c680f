"""Coarse diffusion: loss sanity, KL prior, and end-to-end tiny sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hierdiff_tpu.models.diffusion import CoarseDiffusion
from hierdiff_tpu.ops.masked import mean_zero_max_violation, masking_violation
from hierdiff_tpu.sampling.coarse import make_masks_for_counts, sample_coarse


def tiny_model(**kw):
    defaults = dict(in_node_nf=8, timesteps=50, hidden_nf=32, n_layers=2,
                    inv_sublayers=1, noise_schedule="polynomial_2")
    defaults.update(kw)
    return CoarseDiffusion(**defaults)


def tiny_batch(key, b=4, n=6, h_nf=8):
    counts = np.array([3, 6, 4, 5])[:b]
    node_mask, edge_mask = make_masks_for_counts(counts, n)
    kx, kh = jax.random.split(key)
    x = jax.random.normal(kx, (b, n, 3)) * node_mask
    h = jax.random.normal(kh, (b, n, h_nf)) * node_mask
    return {
        "positions": x,
        "node_feature": h,
        "atom_mask": jnp.asarray(node_mask),
        "edge_mask": jnp.asarray(edge_mask),
    }


def test_loss_finite_and_batched():
    model = tiny_model()
    batch = tiny_batch(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), batch, jax.random.PRNGKey(2), train=True)
    out = model.apply(params, batch, jax.random.PRNGKey(3), train=True)
    assert np.isfinite(float(out["loss"]))
    assert out["nll"].shape == (4,)


def test_eval_loss_uses_t0_always():
    model = tiny_model()
    batch = tiny_batch(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), batch, jax.random.PRNGKey(2), train=True)
    out = model.apply(params, batch, jax.random.PRNGKey(3), train=False)
    assert np.isfinite(float(out["loss"]))
    # eval t is sampled from {1..T}: never zero
    assert np.all(np.asarray(out["t"]) >= 1)


def test_kl_prior_small_for_predefined_schedule():
    model = tiny_model(timesteps=1000)
    batch = tiny_batch(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), batch, jax.random.PRNGKey(2), train=True)
    xh = jnp.concatenate([batch["positions"], batch["node_feature"]], axis=2)
    kl = model.apply(params, xh, batch["atom_mask"], method=CoarseDiffusion.kl_prior)
    assert np.all(np.asarray(kl) < 0.1), np.asarray(kl)


def test_learned_gamma_grid_shape():
    model = tiny_model(noise_schedule="learned", timesteps=50)
    batch = tiny_batch(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), batch, jax.random.PRNGKey(2), train=True)
    grid = model.apply(params, method=CoarseDiffusion.gamma_grid)
    assert grid.shape == (51,)
    g = np.asarray(grid)
    assert np.all(np.diff(g) >= -1e-4)


def test_sampler_shapes_and_masks():
    model = tiny_model(timesteps=20)
    batch = tiny_batch(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), batch, jax.random.PRNGKey(2), train=True)
    counts = np.array([3, 5, 6, 4])
    node_mask, edge_mask = make_masks_for_counts(counts, 6)
    x, h = sample_coarse(model, params, jax.random.PRNGKey(5),
                         jnp.asarray(node_mask), jnp.asarray(edge_mask))
    assert x.shape == (4, 6, 3)
    assert h.shape == (4, 6, 8)
    nm = jnp.asarray(node_mask)
    assert float(masking_violation(x, nm)) < 1e-5
    assert float(masking_violation(h, nm)) < 1e-5
    assert float(mean_zero_max_violation(x, nm)) < 1e-2
    assert np.all(np.isfinite(np.asarray(x)))


def test_grad_flows():
    model = tiny_model(timesteps=20)
    batch = tiny_batch(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), batch, jax.random.PRNGKey(2), train=True)

    def loss_fn(p):
        return model.apply(p, batch, jax.random.PRNGKey(3), train=True)["loss"]

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert total > 0
