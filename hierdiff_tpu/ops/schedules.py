"""Noise schedules: closed-form gamma tables and the learned VDM GammaNetwork.

gamma(t) is the VDM log-SNR negated: sigma^2 = sigmoid(gamma), alpha^2 =
sigmoid(-gamma). Predefined schedules are precomputed numpy tables indexed by
round(t*T) — a TPU-friendly gather that also makes the 1000-step reverse scan
trivially cheap. (reference: endiffusion/models/noise_model.py)
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def clip_noise_schedule(alphas2: np.ndarray, clip_value: float = 0.001) -> np.ndarray:
    """Clip per-step alpha ratios for sampling stability.
    (reference: noise_model.py:21-33)
    """
    alphas2 = np.concatenate([np.ones(1), alphas2], axis=0)
    alphas_step = alphas2[1:] / alphas2[:-1]
    alphas_step = np.clip(alphas_step, a_min=clip_value, a_max=1.0)
    return np.cumprod(alphas_step, axis=0)


def polynomial_schedule(timesteps: int, s: float = 1e-4, power: float = 3.0) -> np.ndarray:
    """alpha^2 schedule (1 - x^power)^2 with precision floor.
    (reference: noise_model.py:36-50)
    """
    steps = timesteps + 1
    x = np.linspace(0, steps, steps)
    alphas2 = (1 - np.power(x / steps, power)) ** 2
    alphas2 = clip_noise_schedule(alphas2, clip_value=0.001)
    precision = 1 - 2 * s
    return precision * alphas2 + s


def cosine_beta_schedule(timesteps: int, s: float = 0.008, raise_to_power: float = 1.0) -> np.ndarray:
    """Nichol-Dhariwal cosine cumulative alpha^2. (reference: noise_model.py:53-68)"""
    steps = timesteps + 2
    x = np.linspace(0, steps, steps)
    alphas_cumprod = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    betas = np.clip(betas, a_min=0, a_max=0.999)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    if raise_to_power != 1:
        alphas_cumprod = np.power(alphas_cumprod, raise_to_power)
    return alphas_cumprod


def gamma_table(noise_schedule: str, timesteps: int, precision: float = 1e-4) -> np.ndarray:
    """gamma = -(log alpha^2 - log sigma^2) lookup over T+1 grid points.
    (reference: noise_model.py:125-156)
    """
    if noise_schedule == "cosine":
        alphas2 = cosine_beta_schedule(timesteps)
    elif "polynomial" in noise_schedule:
        splits = noise_schedule.split("_")
        assert len(splits) == 2, noise_schedule
        power = float(splits[1])
        alphas2 = polynomial_schedule(timesteps, s=precision, power=power)
    else:
        raise ValueError(noise_schedule)
    sigmas2 = 1 - alphas2
    return -(np.log(alphas2) - np.log(sigmas2)).astype(np.float32)


class PredefinedNoiseSchedule(nn.Module):
    """Table lookup gamma(t) for t in [0,1], rounded to the T-grid.
    (reference: noise_model.py:125-160)
    """

    noise_schedule: str
    timesteps: int
    precision: float = 1e-4

    def setup(self):
        self.gamma = self.variable(
            "constants", "gamma",
            lambda: jnp.asarray(gamma_table(self.noise_schedule, self.timesteps, self.precision)),
        )

    def __call__(self, t: Array) -> Array:
        t_int = jnp.round(t * self.timesteps).astype(jnp.int32)
        return self.gamma.value[t_int]


class PositiveLinear(nn.Module):
    """Linear layer with softplus-constrained positive weights (monotone nets).
    (reference: noise_model.py:75-105)
    """

    features: int
    weight_init_offset: float = -2.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1]

        def init_w(key, shape, dtype=jnp.float32):
            # kaiming-uniform equivalent, then shifted negative so softplus(w)
            # starts small (reference: noise_model.py:92-96)
            bound = math.sqrt(1.0 / shape[0]) if shape[0] > 0 else 0.0
            w = jax.random.uniform(key, shape, dtype, -bound * math.sqrt(3.0), bound * math.sqrt(3.0))
            return w + self.weight_init_offset

        w = self.param("kernel", init_w, (in_features, self.features))
        b_bound = 1.0 / math.sqrt(in_features) if in_features > 0 else 0.0
        b = self.param(
            "bias",
            lambda key, shape, dtype=jnp.float32: jax.random.uniform(key, shape, dtype, -b_bound, b_bound),
            (self.features,),
        )
        return x @ jax.nn.softplus(w) + b


class GammaNetwork(nn.Module):
    """Learned monotone gamma(t) (VDM), normalized to [gamma_0, gamma_1].
    (reference: noise_model.py:163-200)
    """

    @nn.compact
    def __call__(self, t: Array) -> Array:
        squeeze_out = t.ndim == 1
        if squeeze_out:
            t = t[:, None]
        l1 = PositiveLinear(1, name="l1")
        l2 = PositiveLinear(1024, name="l2")
        l3 = PositiveLinear(1, name="l3")
        gamma_0 = self.param("gamma_0", lambda *_: jnp.array([-5.0]))
        gamma_1 = self.param("gamma_1", lambda *_: jnp.array([10.0]))

        def gamma_tilde(tt):
            l1_t = l1(tt)
            return l1_t + l3(jax.nn.sigmoid(l2(l1_t)))

        zeros = jnp.zeros_like(t)
        ones = jnp.ones_like(t)
        g0, g1, gt = gamma_tilde(zeros), gamma_tilde(ones), gamma_tilde(t)
        normalized = (gt - g0) / (g1 - g0)
        gamma = gamma_0 + (gamma_1 - gamma_0) * normalized
        if squeeze_out:
            gamma = gamma[:, 0]
        return gamma


# --- gamma-derived algebra (pure functions of gamma values) ---------------


def sigma_from_gamma(gamma: Array) -> Array:
    """sigma = sqrt(sigmoid(gamma)). (reference: diffusion_qm9.py:148-150)"""
    return jnp.sqrt(jax.nn.sigmoid(gamma))


def alpha_from_gamma(gamma: Array) -> Array:
    """alpha = sqrt(sigmoid(-gamma)). (reference: diffusion_qm9.py:152-154)"""
    return jnp.sqrt(jax.nn.sigmoid(-gamma))


def snr(gamma: Array) -> Array:
    """SNR = alpha^2 / sigma^2 = exp(-gamma). (reference: diffusion_qm9.py:156-158)"""
    return jnp.exp(-gamma)


def sigma_and_alpha_t_given_s(gamma_t: Array, gamma_s: Array):
    """Transition coefficients for q(z_t | z_s), numerically-stable form.

    sigma^2_{t|s} = -expm1(softplus(gamma_s) - softplus(gamma_t))
    alpha_{t|s}   = exp(0.5*(logsigmoid(-gamma_t) - logsigmoid(-gamma_s)))
    (reference: diffusion_qm9.py:181-204)
    """
    sigma2_t_given_s = -jnp.expm1(jax.nn.softplus(gamma_s) - jax.nn.softplus(gamma_t))
    log_alpha2_t = jax.nn.log_sigmoid(-gamma_t)
    log_alpha2_s = jax.nn.log_sigmoid(-gamma_s)
    alpha_t_given_s = jnp.exp(0.5 * (log_alpha2_t - log_alpha2_s))
    return sigma2_t_given_s, jnp.sqrt(sigma2_t_given_s), alpha_t_given_s


def inflate(array: Array, target_ndim: int) -> Array:
    """Reshape (B,) or (B,1,...) to broadcast against a (B, ...) target.
    (reference: diffusion_qm9.py:140-146)
    """
    return array.reshape(array.shape[0], *([1] * (target_ndim - 1)))
