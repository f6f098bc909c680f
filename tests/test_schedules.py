"""Schedule & gamma-algebra unit tests against closed forms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hierdiff_tpu.ops import schedules as S


def test_polynomial_schedule_monotone_and_bounded():
    a2 = S.polynomial_schedule(1000, s=1e-4, power=2.0)
    assert a2.shape == (1001,)
    assert np.all(np.diff(a2) <= 1e-12)
    assert 0 < a2[-1] < a2[0] <= 1.0


def test_cosine_schedule_monotone():
    a2 = S.cosine_beta_schedule(1000)
    assert np.all(np.diff(a2) <= 1e-12)
    assert a2[0] <= 1.0 and a2[-1] > 0


def test_gamma_table_matches_alpha_sigma_identity():
    # gamma = log(sigma^2/alpha^2)  =>  sigmoid(-gamma) = alpha^2
    for sched in ["cosine", "polynomial_2"]:
        g = S.gamma_table(sched, 1000)
        if sched == "cosine":
            a2 = S.cosine_beta_schedule(1000)
        else:
            a2 = S.polynomial_schedule(1000, s=1e-4, power=2.0)
        alpha2_from_gamma = jax.nn.sigmoid(-jnp.asarray(g))
        np.testing.assert_allclose(np.asarray(alpha2_from_gamma), a2, rtol=2e-4)


def test_predefined_schedule_lookup_rounds_t():
    m = S.PredefinedNoiseSchedule(noise_schedule="polynomial_2", timesteps=100)
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 1)))
    t = jnp.array([[0.0], [1.0]])
    g = m.apply(variables, t)
    table = S.gamma_table("polynomial_2", 100)
    np.testing.assert_allclose(np.asarray(g).ravel(), [table[0], table[-1]], rtol=1e-6)


def test_gamma_network_monotone_and_endpoints():
    net = S.GammaNetwork()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 1)))
    t = jnp.linspace(0, 1, 101)[:, None]
    g = np.asarray(net.apply(params, t)).ravel()
    assert np.all(np.diff(g) >= -1e-5), "gamma must be monotone increasing"
    # endpoints pinned to gamma_0/gamma_1 params (init -5, 10)
    np.testing.assert_allclose(g[0], -5.0, atol=1e-4)
    np.testing.assert_allclose(g[-1], 10.0, atol=1e-4)


def test_transition_coefficients_identity():
    # alpha_t = alpha_{t|s} * alpha_s ; sigma2_{t|s} = sigma_t^2 - alpha_{t|s}^2 sigma_s^2
    gamma_s = jnp.array([-4.0, 0.0, 3.0])
    gamma_t = jnp.array([-3.0, 1.0, 5.0])
    s2_ts, s_ts, a_ts = S.sigma_and_alpha_t_given_s(gamma_t, gamma_s)
    alpha_s = S.alpha_from_gamma(gamma_s)
    alpha_t = S.alpha_from_gamma(gamma_t)
    sigma_s = S.sigma_from_gamma(gamma_s)
    sigma_t = S.sigma_from_gamma(gamma_t)
    np.testing.assert_allclose(np.asarray(a_ts * alpha_s), np.asarray(alpha_t), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s2_ts), np.asarray(sigma_t**2 - a_ts**2 * sigma_s**2), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(s_ts**2), np.asarray(s2_ts), rtol=1e-5)


def test_snr():
    g = jnp.array([-2.0, 0.0, 2.0])
    np.testing.assert_allclose(np.asarray(S.snr(g)), np.exp([-(-2.0), 0.0, -2.0]), rtol=1e-5)
    # alpha^2/sigma^2 == exp(-gamma)
    np.testing.assert_allclose(
        np.asarray(S.alpha_from_gamma(g) ** 2 / S.sigma_from_gamma(g) ** 2),
        np.asarray(S.snr(g)), rtol=1e-5)


def test_positive_linear_is_positive():
    layer = S.PositiveLinear(4)
    params = layer.init(jax.random.PRNGKey(0), jnp.ones((1, 3)))
    # increasing any input coordinate must not decrease any output (positive W)
    x0 = jnp.zeros((1, 3))
    x1 = x0.at[0, 1].set(1.0)
    y0 = layer.apply(params, x0)
    y1 = layer.apply(params, x1)
    assert np.all(np.asarray(y1 - y0) >= 0)
