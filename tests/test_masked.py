"""Masked-op unit tests: CoM projection, masked noise, likelihoods."""

import jax
import jax.numpy as jnp
import numpy as np

from hierdiff_tpu.ops import masked as M


def random_batch(key, b=4, n=7, d=3):
    kx, km = jax.random.split(key)
    x = jax.random.normal(kx, (b, n, d))
    counts = np.array([3, 5, 7, 2])[:b]
    mask = np.zeros((b, n, 1), np.float32)
    for i, c in enumerate(counts):
        mask[i, :c] = 1
    return x * mask, jnp.asarray(mask), counts


def test_remove_mean_with_mask_zeroes_masked_mean():
    x, mask, counts = random_batch(jax.random.PRNGKey(0))
    y = M.remove_mean_with_mask(x, mask)
    # masked sum per batch is ~0
    s = np.asarray(jnp.sum(y * mask, axis=1))
    np.testing.assert_allclose(s, 0.0, atol=1e-5)
    # padded rows stay zero
    assert float(M.masking_violation(y, mask)) < 1e-6


def test_com_free_noise_statistics():
    key = jax.random.PRNGKey(1)
    mask = jnp.ones((4096, 6, 1))
    z = M.sample_com_free_gaussian_with_mask(key, (4096, 6, 3), mask)
    assert float(M.mean_zero_max_violation(z, mask)) < 1e-4
    # variance on the subspace: E[x^2] = (N-1)/N per coordinate
    var = float(jnp.mean(z**2))
    np.testing.assert_allclose(var, 5.0 / 6.0, atol=0.02)


def test_combined_noise_blocks():
    key = jax.random.PRNGKey(2)
    x, mask, _ = random_batch(key)
    z = M.sample_combined_noise(key, mask, 3, 8)
    assert z.shape == (4, 7, 11)
    assert float(M.mean_zero_max_violation(z[:, :, :3], mask)) < 1e-4
    assert float(M.masking_violation(z, mask)) < 1e-7


def test_gaussian_log_likelihoods_match_numpy():
    key = jax.random.PRNGKey(3)
    x, mask, counts = random_batch(key)
    ll = np.asarray(M.standard_gaussian_log_likelihood_with_mask(x, mask))
    expect = []
    xn = np.asarray(x)
    mn = np.asarray(mask)
    for i in range(x.shape[0]):
        v = (-0.5 * xn[i] ** 2 - 0.5 * np.log(2 * np.pi)) * mn[i]
        expect.append(v.sum())
    np.testing.assert_allclose(ll, expect, rtol=1e-5)


def test_subspace_dimensionality():
    _, mask, counts = random_batch(jax.random.PRNGKey(4))
    d = np.asarray(M.subspace_dimensionality(mask, 3))
    np.testing.assert_allclose(d, (counts - 1) * 3)


def test_cdf_standard_gaussian():
    from scipy.stats import norm
    x = jnp.linspace(-3, 3, 13)
    np.testing.assert_allclose(np.asarray(M.cdf_standard_gaussian(x)), norm.cdf(np.asarray(x)), atol=1e-6)
