"""Distributed tests on the virtual 8-device CPU mesh (SURVEY §4: replaces
the reference's nonexistent DDP tests with real ones)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from hierdiff_tpu.parallel import (TrainState, make_mesh, make_train_step,
                                   replicate, shard_batch)


@pytest.fixture(scope="module")
def setup():
    from hierdiff_tpu.models.diffusion import CoarseDiffusion
    from hierdiff_tpu.sampling.coarse import make_masks_for_counts

    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    model = CoarseDiffusion(in_node_nf=8, timesteps=20, hidden_nf=32, n_layers=2,
                            noise_schedule="polynomial_2")
    b, n = 16, 6
    rng = np.random.default_rng(0)
    counts = rng.integers(3, n + 1, size=b)
    nm, em = make_masks_for_counts(counts, n)
    batch = {
        "positions": jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32)) * nm,
        "node_feature": jnp.asarray(rng.standard_normal((b, n, 8)).astype(np.float32)) * nm,
        "atom_mask": jnp.asarray(nm), "edge_mask": jnp.asarray(em),
    }
    params = model.init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1), train=True)

    def loss_fn(p, b_, r):
        out = model.apply(p, b_, r, train=True)
        return out["loss"], {}

    return model, params, batch, loss_fn


def test_eight_device_train_step_matches_single(setup):
    """DP gradient all-reduce over the mesh == single-device step."""
    model, params, batch, loss_fn = setup
    tx = optax.sgd(1e-3)

    # single device
    s1 = TrainState.create(params, tx)
    step1 = make_train_step(loss_fn, mesh=None, donate_state=False)
    s1, m1 = step1(s1, batch, jax.random.PRNGKey(5))

    # 8-device mesh
    mesh = make_mesh()
    s8 = TrainState.create(params, tx)
    s8 = replicate(s8, mesh)
    sharded = shard_batch(batch, mesh)
    step8 = make_train_step(loss_fn, mesh=mesh, donate_state=False)
    s8, m8 = step8(s8, sharded, jax.random.PRNGKey(5))

    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]), rtol=1e-4)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l8 = jax.tree_util.tree_leaves(s8.params)
    for a, b_ in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-5)


def test_multi_device_sampling(setup):
    """Data-parallel sampling: shard the masks over the mesh."""
    from hierdiff_tpu.sampling.coarse import sample_coarse

    model, params, batch, _ = setup
    mesh = make_mesh()
    nm = shard_batch(batch["atom_mask"], mesh)
    em = shard_batch(batch["edge_mask"], mesh)
    p = replicate(params, mesh)
    x, h = sample_coarse(model, p, jax.random.PRNGKey(7), nm, em)
    assert np.all(np.isfinite(np.asarray(x)))
    # output stays sharded over the data axis
    assert len(x.sharding.device_set) == 8
