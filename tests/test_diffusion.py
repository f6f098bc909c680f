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


def test_pocket_conditioned_loss_and_sampling():
    """Pocket variant: frozen protein rows condition the molecule diffusion."""
    from hierdiff_tpu.sampling.coarse import sample_coarse_pocket

    model = tiny_model(timesteps=10, pocket=True)
    b, n_mol, k = 2, 5, 7
    counts = np.array([4, 5])
    nm, em = make_masks_for_counts(counts, n_mol)
    key = jax.random.PRNGKey(0)
    batch = {
        "positions": jax.random.normal(key, (b, n_mol, 3)) * nm,
        "node_feature": jax.random.normal(key, (b, n_mol, 8)) * nm,
        "atom_mask": jnp.asarray(nm), "edge_mask": jnp.asarray(em),
        "protein_feat": jnp.asarray(np.random.RandomState(0).randint(1, 21, (b, k))),
        "protein_pos": jax.random.normal(jax.random.PRNGKey(1), (b, k, 3)),
        "protein_feat_mask": jnp.ones((b, k, 1)),
        "protein_edge_mask": jnp.asarray(np.broadcast_to(1 - np.eye(k), (b, k, k)).copy()),
    }
    params = model.init(jax.random.PRNGKey(2), batch, jax.random.PRNGKey(3), train=True)
    out = model.apply(params, batch, jax.random.PRNGKey(4), train=True)
    assert np.isfinite(float(out["loss"]))

    x, h = sample_coarse_pocket(
        model, params, jax.random.PRNGKey(5), batch["atom_mask"], batch["edge_mask"],
        batch["protein_feat"], batch["protein_pos"], batch["protein_feat_mask"],
        batch["protein_edge_mask"])
    assert x.shape == (b, n_mol, 3) and h.shape == (b, n_mol, 8)
    assert np.all(np.isfinite(np.asarray(x)))
    from hierdiff_tpu.ops.masked import masking_violation
    assert float(masking_violation(x, batch["atom_mask"])) < 1e-5

    # conditioning matters: a different pocket changes the sample
    x2, _ = sample_coarse_pocket(
        model, params, jax.random.PRNGKey(5), batch["atom_mask"], batch["edge_mask"],
        batch["protein_feat"], batch["protein_pos"] + 5.0, batch["protein_feat_mask"],
        batch["protein_edge_mask"])
    assert np.abs(np.asarray(x) - np.asarray(x2)).max() > 1e-4

    # steps=T reproduces the full chain bit-exactly (the strided ladder
    # degenerates to the reference schedule); steps<T runs and stays masked
    x_full, h_full = sample_coarse_pocket(
        model, params, jax.random.PRNGKey(5), batch["atom_mask"], batch["edge_mask"],
        batch["protein_feat"], batch["protein_pos"], batch["protein_feat_mask"],
        batch["protein_edge_mask"], steps=model.timesteps)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x_full))
    x5, _ = sample_coarse_pocket(
        model, params, jax.random.PRNGKey(5), batch["atom_mask"], batch["edge_mask"],
        batch["protein_feat"], batch["protein_pos"], batch["protein_feat_mask"],
        batch["protein_edge_mask"], steps=5)
    assert np.all(np.isfinite(np.asarray(x5)))
    assert float(masking_violation(x5, batch["atom_mask"])) < 1e-5


def test_elem_mode():
    """node_coarse_type='elem': 3 integer feature dims, no continuous dims."""
    model = CoarseDiffusion(in_node_nf=3, int_nf=3, cont_nf=0, timesteps=20,
                            hidden_nf=32, n_layers=2, noise_schedule="polynomial_2")
    counts = np.array([3, 5])
    node_mask, edge_mask = make_masks_for_counts(counts, 5)
    key = jax.random.PRNGKey(0)
    batch = {
        "positions": jax.random.normal(key, (2, 5, 3)) * node_mask,
        "node_feature": jax.random.normal(jax.random.PRNGKey(1), (2, 5, 3)) * node_mask,
        "atom_mask": jnp.asarray(node_mask), "edge_mask": jnp.asarray(edge_mask),
    }
    params = model.init(jax.random.PRNGKey(2), batch, jax.random.PRNGKey(3), train=True)
    out = model.apply(params, batch, jax.random.PRNGKey(4), train=True)
    assert np.isfinite(float(out["loss"]))
    x, h = sample_coarse(model, params, jax.random.PRNGKey(5),
                         jnp.asarray(node_mask), jnp.asarray(edge_mask))
    assert h.shape == (2, 5, 3) and np.all(np.isfinite(np.asarray(x)))


def test_sampling_determinism():
    """Same rng key -> bit-identical samples (scan + fold_in RNG discipline)."""
    model = tiny_model(timesteps=20)
    batch = tiny_batch(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), batch, jax.random.PRNGKey(2), train=True)
    counts = np.array([3, 5, 6, 4])
    nm, em = make_masks_for_counts(counts, 6)
    x1, h1 = sample_coarse(model, params, jax.random.PRNGKey(9), jnp.asarray(nm), jnp.asarray(em))
    x2, h2 = sample_coarse(model, params, jax.random.PRNGKey(9), jnp.asarray(nm), jnp.asarray(em))
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    x3, _ = sample_coarse(model, params, jax.random.PRNGKey(10), jnp.asarray(nm), jnp.asarray(em))
    assert np.abs(np.asarray(x1) - np.asarray(x3)).max() > 1e-6


def test_strided_sampler():
    """steps=T reproduces the full chain bit-for-bit; a strided chain
    (steps=10 of T=50) stays finite, masked, and CoM-free — the VDM
    posterior algebra is exact for any s < t pair."""
    from hierdiff_tpu.ops.masked import masking_violation, mean_zero_max_violation
    from hierdiff_tpu.sampling.coarse import sample_coarse

    model = tiny_model()
    _, batch = None, tiny_batch(jax.random.PRNGKey(0))
    nm, em = batch["atom_mask"], batch["edge_mask"]
    params = model.init(jax.random.PRNGKey(1), batch, jax.random.PRNGKey(2), train=True)

    x_full, h_full = sample_coarse(model, params, jax.random.PRNGKey(3), nm, em)
    x_T, h_T = sample_coarse(model, params, jax.random.PRNGKey(3), nm, em, steps=50)
    np.testing.assert_array_equal(np.asarray(x_full), np.asarray(x_T))
    np.testing.assert_array_equal(np.asarray(h_full), np.asarray(h_T))

    x10, h10 = sample_coarse(model, params, jax.random.PRNGKey(3), nm, em, steps=10)
    assert np.isfinite(np.asarray(x10)).all() and np.isfinite(np.asarray(h10)).all()
    assert float(masking_violation(x10, nm)) == 0.0
    assert float(mean_zero_max_violation(x10, nm)) < 1e-2
    # strided chain is a different sampler: output differs from the full one
    assert not np.allclose(np.asarray(x10), np.asarray(x_full))


def test_packed_sampler_matches_tuple():
    """packed=True (the pipeline's one-readback hand-off) is bit-identical
    to the (x, h) tuple return."""
    model = tiny_model(timesteps=20)
    batch = tiny_batch(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), batch, jax.random.PRNGKey(2), train=True)
    counts = np.array([3, 5, 6, 4])
    nm, em = make_masks_for_counts(counts, 6)
    nm, em = jnp.asarray(nm), jnp.asarray(em)
    x, h = sample_coarse(model, params, jax.random.PRNGKey(9), nm, em)
    xh = sample_coarse(model, params, jax.random.PRNGKey(9), nm, em, packed=True)
    np.testing.assert_array_equal(np.asarray(xh[..., :3]), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(xh[..., 3:]), np.asarray(h))
