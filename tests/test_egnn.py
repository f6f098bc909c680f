"""EGNN symmetry tests: E(3) equivariance, permutation, mask independence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hierdiff_tpu.models.dynamics import EGNNDynamics
from hierdiff_tpu.ops.egnn import DenseEGNN, coord2diff_dense


def small_egnn():
    return DenseEGNN(hidden_nf=32, out_node_nf=5, n_layers=2, inv_sublayers=2,
                     attention=True, tanh=True, coords_range=30.0,
                     norm_constant=0.0, normalization_factor=10.0)


def batch(key, b=3, n=6, h_nf=5):
    kh, kx = jax.random.split(key)
    h = jax.random.normal(kh, (b, n, h_nf))
    x = jax.random.normal(kx, (b, n, 3))
    counts = [4, 6, 3][:b]
    node_mask = np.zeros((b, n, 1), np.float32)
    edge_mask = np.zeros((b, n, n, 1), np.float32)
    for i, c in enumerate(counts):
        node_mask[i, :c] = 1
        edge_mask[i, :c, :c, 0] = 1 - np.eye(c)
    node_mask = jnp.asarray(node_mask)
    edge_mask = jnp.asarray(edge_mask)
    return h * node_mask, x * node_mask, node_mask, edge_mask


def random_rotation(key):
    seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
    a = np.random.RandomState(seed).randn(3, 3)
    q, r = np.linalg.qr(a)
    q = q @ np.diag(np.sign(np.diag(r)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return jnp.asarray(q.astype(np.float32))


def test_coord2diff_dense():
    x = jnp.array([[[0.0, 0, 0], [3.0, 4.0, 0]]])
    radial, diff = coord2diff_dense(x, norm_constant=1.0)
    np.testing.assert_allclose(float(radial[0, 0, 1, 0]), 25.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(diff[0, 0, 1]), np.array([-3, -4, 0]) / 6.0, rtol=1e-4)


def test_egnn_rotation_equivariance():
    model = small_egnn()
    h, x, nm, em = batch(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), h, x, nm, em)
    R = random_rotation(jax.random.PRNGKey(2))

    h1, x1 = model.apply(params, h, x, nm, em)
    h2, x2 = model.apply(params, h, x @ R, nm, em)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1 @ R), atol=2e-4)


def test_egnn_translation_equivariance():
    model = small_egnn()
    h, x, nm, em = batch(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), h, x, nm, em)
    t = jnp.array([1.5, -2.0, 0.7])
    h1, x1 = model.apply(params, h, x, nm, em)
    h2, x2 = model.apply(params, h, (x + t) * nm, nm, em)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(x2), np.asarray((x1 + t) * nm), atol=2e-4)


def test_egnn_permutation_equivariance():
    model = small_egnn()
    h, x, nm, em = batch(jax.random.PRNGKey(0), b=1, n=6)
    nm = jnp.ones_like(nm[:1])
    em = jnp.asarray(1.0 - np.eye(6))[None, :, :, None]
    params = model.init(jax.random.PRNGKey(1), h, x, nm, em)
    perm = np.random.RandomState(0).permutation(6)
    h1, x1 = model.apply(params, h, x, nm, em)
    h2, x2 = model.apply(params, h[:, perm], x[:, perm], nm, em)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h1[:, perm]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1[:, perm]), atol=2e-4)


def test_egnn_padding_independence():
    """Padded vs unpadded batches must agree on real nodes."""
    model = small_egnn()
    key = jax.random.PRNGKey(3)
    h = jax.random.normal(key, (1, 4, 5))
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 3))
    nm4 = jnp.ones((1, 4, 1))
    em4 = jnp.asarray(1.0 - np.eye(4))[None, :, :, None]
    params = model.init(jax.random.PRNGKey(1), h, x, nm4, em4)
    h1, x1 = model.apply(params, h, x, nm4, em4)

    # pad to 9 nodes
    hp = jnp.zeros((1, 9, 5)).at[:, :4].set(h)
    xp = jnp.zeros((1, 9, 3)).at[:, :4].set(x)
    nm9 = jnp.zeros((1, 9, 1)).at[:, :4].set(1.0)
    em9 = jnp.zeros((1, 9, 9, 1)).at[:, :4, :4, 0].set(1.0 - np.eye(4))
    h2, x2 = model.apply(params, hp, xp, nm9, em9)
    np.testing.assert_allclose(np.asarray(h2[:, :4]), np.asarray(h1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(x2[:, :4]), np.asarray(x1), atol=1e-4)


def test_dynamics_output_is_com_free_and_equivariant():
    dyn = EGNNDynamics(in_node_nf=5, hidden_nf=32, n_layers=2)
    h, x, nm, em = batch(jax.random.PRNGKey(0))
    xh = jnp.concatenate([x, h], axis=2)
    t = jnp.full((3, 1), 0.3)
    params = dyn.init(jax.random.PRNGKey(1), t, xh, nm, em)
    out = dyn.apply(params, t, xh, nm, em)
    assert out.shape == xh.shape
    vel = out[:, :, :3]
    # velocity is CoM-free per molecule
    np.testing.assert_allclose(np.asarray(jnp.sum(vel * nm, axis=1)), 0.0, atol=1e-4)

    # rotation equivariance of vel, invariance of h-out
    R = random_rotation(jax.random.PRNGKey(2))
    xh_rot = jnp.concatenate([x @ R, h], axis=2)
    out_r = dyn.apply(params, t, xh_rot, nm, em)
    np.testing.assert_allclose(np.asarray(out_r[:, :, :3]), np.asarray(vel @ R), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_r[:, :, 3:]), np.asarray(out[:, :, 3:]), atol=2e-4)

    # translation invariance (vel unchanged: x_final - x cancels the shift)
    xh_t = jnp.concatenate([(x + jnp.array([1.0, 2.0, 3.0])) * nm, h], axis=2)
    out_t = dyn.apply(params, t, xh_t, nm, em)
    np.testing.assert_allclose(np.asarray(out_t[:, :, :3]), np.asarray(vel), atol=2e-4)


def test_egnn_bf16_compute_matches_f32():
    """compute_dtype='bfloat16' keeps params/outputs f32 and tracks the f32
    path within bf16 operand-rounding error (accumulation stays f32)."""
    m32 = small_egnn()
    m16 = DenseEGNN(hidden_nf=32, out_node_nf=5, n_layers=2, inv_sublayers=2,
                    attention=True, tanh=True, coords_range=30.0,
                    norm_constant=0.0, normalization_factor=10.0,
                    compute_dtype="bfloat16")
    h, x, nm, em = batch(jax.random.PRNGKey(3))
    params = m32.init(jax.random.PRNGKey(0), h, x, nm, em)
    h32, x32 = m32.apply(params, h, x, nm, em)
    h16, x16 = m16.apply(params, h, x, nm, em)  # identical param tree
    assert h16.dtype == jnp.float32 and x16.dtype == jnp.float32
    scale_h = float(jnp.max(jnp.abs(h32))) + 1e-6
    scale_x = float(jnp.max(jnp.abs(x32))) + 1e-6
    assert float(jnp.max(jnp.abs(h16 - h32))) / scale_h < 0.05
    assert float(jnp.max(jnp.abs(x16 - x32))) / scale_x < 0.05


def test_egnn_remat_edges_matches_plain():
    """remat_edges (jax.checkpoint around only the (B,N,N,H) edge chain —
    VERDICT r4 #7) is numerically transparent: forward outputs are
    BIT-identical (the checkpointed fn computes the same primal), and
    gradients agree to recompute-fusion reassociation noise."""
    m0 = small_egnn()
    m1 = DenseEGNN(hidden_nf=32, out_node_nf=5, n_layers=2, inv_sublayers=2,
                   attention=True, tanh=True, coords_range=30.0,
                   norm_constant=0.0, normalization_factor=10.0,
                   remat_edges=True)
    h, x, nm, em = batch(jax.random.PRNGKey(5))
    params = m0.init(jax.random.PRNGKey(0), h, x, nm, em)

    h0, x0 = m0.apply(params, h, x, nm, em)
    h1, x1 = m1.apply(params, h, x, nm, em)   # identical param tree
    np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
    np.testing.assert_array_equal(np.asarray(x0), np.asarray(x1))

    def loss(m):
        def f(p):
            ho, xo = m.apply(p, h, x, nm, em)
            return jnp.sum(ho**2) + jnp.sum(xo**2)
        return f

    g0 = jax.jit(jax.grad(loss(m0)))(params)
    g1 = jax.jit(jax.grad(loss(m1)))(params)
    rel = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b)))
        / (float(jnp.max(jnp.abs(a))) + 1e-6), g0, g1)
    assert max(jax.tree_util.tree_leaves(rel)) < 1e-5
