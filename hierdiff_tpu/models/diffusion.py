"""Coarse-stage E(3)-equivariant denoising diffusion (VDM-style EDM).

Pure-functional JAX rebuild of the reference LightningModule
(endiffusion/train_module/diffusion_qm9.py). The gamma/alpha/sigma algebra,
masked normalization, KL prior, eps-loss with SNR weighting, and the t=0
discretized integer likelihood are reproduced term-for-term; the training
estimator supports both the sampled-t path (t0_always=False) and the
low-variance two-pass eval path (t0_always=True).

One deliberate fix vs the reference: the continuous-h slice of the t=0
likelihood uses ``net_out[..., n_dims+int_nf : n_dims+int_nf+cont_nf]``;
the reference has a stray-colon typo (``diffusion_qm9.py:477``) that selects
``net_out[..., 0:8:11]`` instead. We implement the intended term.

Sampling lives in ``hierdiff_tpu.sampling.coarse`` as a single lax.scan.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hierdiff_tpu.models.dynamics import EGNNDynamics
from hierdiff_tpu.ops.losses import gaussian_kl, gaussian_kl_for_dimension
from hierdiff_tpu.ops.masked import (
    cdf_standard_gaussian,
    remove_mean_with_mask,
    sample_combined_noise,
    subspace_dimensionality,
    sum_except_batch,
)
from hierdiff_tpu.ops.schedules import (
    GammaNetwork,
    PredefinedNoiseSchedule,
    alpha_from_gamma,
    inflate,
    sigma_and_alpha_t_given_s,
    sigma_from_gamma,
    snr,
)

Array = jax.Array


class CoarseDiffusion(nn.Module):
    """EDM over fragment centers: x in R^3 (CoM-free) + h blur features.

    Config mirrors endiffusion/conf/model/ddpmgblur.yaml.
    """

    in_node_nf: int = 8            # 'prop' blur features; 3 for 'elem'
    n_dims: int = 3
    timesteps: int = 1000
    loss_type: str = "vlb"         # 'vlb' | 'l2'
    noise_schedule: str = "learned"  # 'learned' | 'cosine' | 'polynomial_2'
    noise_precision: float = 1e-4
    parametrization: str = "eps"
    norm_values: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    norm_biases: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    int_nf: int = 5                # integer-valued h dims (prop mode)
    cont_nf: int = 3               # continuous h dims (prop mode)
    # dynamics
    hidden_nf: int = 256
    n_layers: int = 6
    inv_sublayers: int = 2
    attention: bool = True
    tanh: bool = True
    coords_range: float = 30.0
    norm_constant: float = 0.0
    normalization_factor: float = 10.0
    aggregation_method: str = "sum"
    condition_time: bool = True
    context_node_nf: int = 0
    remat: bool = False
    remat_edges: bool = False   # see ops.egnn.DenseGCL.remat_edges
    use_pallas: bool = False
    # fused custom-VJP training path (ops/egnn_pallas.gcl_vjp): backward
    # rematerializes the edge pipeline in VMEM instead of saving/re-reading
    # (B,N,N,H) residuals from HBM
    pallas_vjp: bool = False
    compute_dtype: Optional[str] = None  # 'bfloat16' = bf16 matmul operands
    # reference knobs off in the live config but constructor-reachable
    # (ddpmgblur.yaml:32,35 / egnn_new.py:208,245)
    mode: str = "egnn_dynamics"    # 'egnn_dynamics' | 'gnn_dynamics'
    sin_embedding: bool = False    # sinusoidal distance embedding
    pocket: bool = False           # pocket-conditioned (crossdock) variant
    # The reference's pocket edge mask is BLOCK-DIAGONAL (mol-mol +
    # pocket-pocket only, diffusion_qm9.py:714-719, 369-371), which leaves
    # the EGNN unable to pass any message between molecule and pocket — the
    # conditioning is inert there. True (default) adds the mol<->pocket
    # cross edges; False reproduces the reference mask exactly.
    pocket_cross_edges: bool = True

    def setup(self):
        if self.pocket:
            # 21 tokens: padding 0 + 20 residue types
            # (reference: diffusion_qm9.py:55-56)
            self.pocket_embed = nn.Embed(21, self.in_node_nf)
        if self.noise_schedule == "learned":
            assert self.loss_type == "vlb", "learned schedule requires vlb loss"
            self.gamma = GammaNetwork()
        else:
            self.gamma = PredefinedNoiseSchedule(
                noise_schedule=self.noise_schedule,
                timesteps=self.timesteps,
                precision=self.noise_precision,
            )
        self.dynamics = EGNNDynamics(
            in_node_nf=self.in_node_nf,
            context_node_nf=self.context_node_nf,
            n_dims=self.n_dims,
            hidden_nf=self.hidden_nf,
            n_layers=self.n_layers,
            inv_sublayers=self.inv_sublayers,
            attention=self.attention,
            tanh=self.tanh,
            coords_range=self.coords_range,
            norm_constant=self.norm_constant,
            normalization_factor=self.normalization_factor,
            aggregation_method=self.aggregation_method,
            condition_time=self.condition_time,
            remat=self.remat,
            remat_edges=self.remat_edges,
            use_pallas=self.use_pallas,
            pallas_vjp=self.pallas_vjp,
            compute_dtype=self.compute_dtype,
            mode=self.mode,
            sin_embedding=self.sin_embedding,
        )

    # --- schedule access ---------------------------------------------------

    def gamma_of(self, t: Array) -> Array:
        """gamma at normalized times t in [0, 1]; output shape = t.shape."""
        return self.gamma(t)

    def gamma_grid(self) -> Array:
        """gamma at the T+1 grid points t = i/T — precomputed once per sample
        call so learned-gamma sampling is a table lookup inside the scan.
        (cf. reference rounding: noise_model.py:158-160)"""
        ts = jnp.arange(self.timesteps + 1, dtype=jnp.float32) / self.timesteps
        return self.gamma(ts[:, None])[:, 0]

    # --- network -----------------------------------------------------------

    def phi(self, xh: Array, t: Array, node_mask: Array, edge_mask: Array,
            context: Optional[Array] = None, mol_shape: Optional[int] = None) -> Array:
        return self.dynamics(t, xh, node_mask, edge_mask, context, mol_shape)

    # --- normalization -----------------------------------------------------

    def normalize(self, x: Array, h: Array, node_mask: Array):
        """(reference: diffusion_qm9.py:165-172)"""
        x = x / self.norm_values[0]
        delta_log_px = -subspace_dimensionality(node_mask, self.n_dims) * math.log(self.norm_values[0])
        h = (h - self.norm_biases[1]) / self.norm_values[1] * node_mask.astype(h.dtype)
        return x, h, delta_log_px

    def unnormalize(self, x: Array, h: Array, node_mask: Array):
        """(reference: diffusion_qm9.py:174-179)"""
        x = x * self.norm_values[0]
        h = (h * self.norm_values[1] + self.norm_biases[1]) * node_mask.astype(h.dtype)
        return x, h

    # --- loss terms --------------------------------------------------------

    def kl_prior(self, xh: Array, node_mask: Array) -> Array:
        """KL(q(z_T|x) || N(0,I)); near zero for a sane schedule.
        (reference: diffusion_qm9.py:206-234)
        """
        b = xh.shape[0]
        ones = jnp.ones((b, 1), xh.dtype)
        gamma_T = self.gamma_of(ones)
        alpha_T = inflate(alpha_from_gamma(gamma_T), xh.ndim)
        mu_T = alpha_T * xh
        mu_T_x, mu_T_h = mu_T[:, :, : self.n_dims], mu_T[:, :, self.n_dims:]
        sigma_T = sigma_from_gamma(gamma_T)          # (B, 1)
        sigma_T_x = sigma_T.reshape(b)               # per-batch scalar for x
        sigma_T_h = inflate(sigma_T, mu_T_h.ndim)

        kl_h = gaussian_kl(mu_T_h, jnp.broadcast_to(sigma_T_h, mu_T_h.shape),
                           jnp.zeros_like(mu_T_h), jnp.ones_like(mu_T_h), node_mask)
        d = subspace_dimensionality(node_mask, self.n_dims)
        kl_x = gaussian_kl_for_dimension(mu_T_x, sigma_T_x, jnp.zeros_like(mu_T_x),
                                         jnp.ones(b, xh.dtype), d=d)
        return kl_x + kl_h

    def compute_error(self, net_out: Array, eps: Array, train: bool) -> Array:
        """Sum-of-squares eps error; l2 training divides by dims.
        (reference: diffusion_qm9.py:250-258)
        """
        error = sum_except_batch((eps - net_out) ** 2)
        if train and self.loss_type == "l2":
            denom = (self.n_dims + self.in_node_nf) * net_out.shape[1]
            error = error / denom
        return error

    def log_constants_p_x_given_z0(self, node_mask: Array) -> Array:
        """(reference: diffusion_qm9.py:260-274)"""
        n = jnp.sum(node_mask.astype(jnp.float32).squeeze(2), axis=1)
        dof_x = (n - 1.0) * self.n_dims
        gamma_0 = self.gamma_of(jnp.zeros((node_mask.shape[0], 1), jnp.float32))
        log_sigma_x = 0.5 * gamma_0.reshape(-1)
        return dof_x * (-log_sigma_x - 0.5 * math.log(2 * math.pi))

    def log_constants_p_h_given_z0(self, node_mask: Array) -> Array:
        """(reference: diffusion_qm9.py:276-290)"""
        n = jnp.sum(node_mask.astype(jnp.float32).squeeze(2), axis=1)
        dof_h = n * self.in_node_nf
        gamma_0 = self.gamma_of(jnp.zeros((node_mask.shape[0], 1), jnp.float32))
        log_sigma_h = 0.5 * gamma_0.reshape(-1)
        return dof_h * (-log_sigma_h - 0.5 * math.log(2 * math.pi))

    def log_pxh_given_z0_without_constants(
        self, h: Array, z_t: Array, gamma_0: Array, eps: Array, net_out: Array,
        node_mask: Array, epsilon: float = 1e-10, train: bool = False,
    ) -> Array:
        """t=0 reconstruction term: Gaussian on x and continuous h, discretized
        Gaussian CDF on integer h dims. (reference: diffusion_qm9.py:460-525)
        """
        nd, inf, cnf = self.n_dims, self.int_nf, self.cont_nf
        z_h_int = z_t[:, :, nd : nd + inf]
        eps_x, net_x = eps[:, :, :nd], net_out[:, :, :nd]
        eps_h = eps[:, :, nd + inf : nd + inf + cnf]
        net_h = net_out[:, :, nd + inf : nd + inf + cnf]

        sigma_0 = inflate(sigma_from_gamma(gamma_0), z_t.ndim)
        sigma_0_int = sigma_0 * self.norm_values[2]

        log_p_x = -0.5 * self.compute_error(net_x, eps_x, train)
        log_p_h_cont = -0.5 * self.compute_error(net_h, eps_h, train)

        h_integer = jnp.round(h[:, :, :inf] * self.norm_values[2] + self.norm_biases[2])
        estimated = z_h_int * self.norm_values[2] + self.norm_biases[2]
        centered = h_integer - estimated
        log_ph_integer = jnp.log(
            cdf_standard_gaussian((centered + 0.5) / sigma_0_int)
            - cdf_standard_gaussian((centered - 0.5) / sigma_0_int)
            + epsilon
        )
        log_ph_integer = sum_except_batch(log_ph_integer * node_mask.astype(log_ph_integer.dtype))
        return log_p_x + log_p_h_cont + log_ph_integer

    # --- main estimators ---------------------------------------------------

    def compute_loss(self, rng: Array, x: Array, h: Array, node_mask: Array,
                     edge_mask: Array, context: Optional[Array], t0_always: bool,
                     train: bool, mol_shape: Optional[int] = None,
                     t_int: Optional[Array] = None, eps: Optional[Array] = None,
                     eps0: Optional[Array] = None) -> Tuple[Array, Dict[str, Array]]:
        """VLB / l2 estimator; ``mol_shape`` freezes the pocket tail.
        ``t_int``/``eps``/``eps0`` override the internal sampling
        (deterministic tests, reference golden parity).
        (reference: diffusion_qm9.py:530-673)"""
        b = x.shape[0]
        rng_t, rng_eps, rng_eps0 = jax.random.split(rng, 3)
        lowest_t = 1 if t0_always else 0
        if t_int is None:
            t_int = jax.random.randint(rng_t, (b, 1), lowest_t, self.timesteps + 1)
        t_int = t_int.astype(jnp.float32)
        s_int = t_int - 1
        t_is_zero = (t_int == 0).astype(jnp.float32)
        s = s_int / self.timesteps
        t = t_int / self.timesteps

        # split off frozen pocket rows (reference: diffusion_qm9.py:553-557)
        full_node_mask, full_edge_mask = node_mask, edge_mask
        if mol_shape is not None:
            x_fix, h_fix = x[:, mol_shape:], h[:, mol_shape:]
            x, h = x[:, :mol_shape], h[:, :mol_shape]
            node_mask = full_node_mask[:, :mol_shape]
        else:
            x_fix = h_fix = None

        gamma_s = self.gamma_of(s)
        gamma_t = self.gamma_of(t)
        alpha_t = inflate(alpha_from_gamma(gamma_t), x.ndim)
        sigma_t = inflate(sigma_from_gamma(gamma_t), x.ndim)

        if eps is None:
            eps = sample_combined_noise(rng_eps, node_mask, self.n_dims, self.in_node_nf)
        xh = jnp.concatenate([x, h], axis=2)
        z_t = alpha_t * xh + sigma_t * eps

        if x_fix is not None:
            xh_fix = jnp.concatenate([x_fix, h_fix], axis=2)
            z_in = jnp.concatenate([z_t, xh_fix], axis=1)
        else:
            z_in = z_t
        net_out = self.phi(z_in, t, full_node_mask, full_edge_mask, context,
                           mol_shape=mol_shape)
        if mol_shape is not None:
            net_out = net_out[:, :mol_shape]
        error = self.compute_error(net_out, eps, train)

        if train and self.loss_type == "l2":
            snr_weight = jnp.ones_like(error)
        else:
            snr_weight = (snr(gamma_s - gamma_t) - 1.0).reshape(b)
        loss_t_larger_than_zero = 0.5 * snr_weight * error

        neg_log_constants = -self.log_constants_p_x_given_z0(node_mask)
        neg_log_constants = neg_log_constants - self.log_constants_p_h_given_z0(node_mask)
        if train and self.loss_type == "l2":
            neg_log_constants = jnp.zeros_like(neg_log_constants)

        kl_prior = self.kl_prior(xh, node_mask)

        if t0_always:
            estimator_loss_terms = self.timesteps * loss_t_larger_than_zero
            t_zeros = jnp.zeros_like(s)
            gamma_0 = self.gamma_of(t_zeros)
            alpha_0 = inflate(alpha_from_gamma(gamma_0), x.ndim)
            sigma_0 = inflate(sigma_from_gamma(gamma_0), x.ndim)
            eps_0 = eps0 if eps0 is not None else sample_combined_noise(
                rng_eps0, node_mask, self.n_dims, self.in_node_nf)
            z_0 = alpha_0 * xh + sigma_0 * eps_0
            z0_in = jnp.concatenate([z_0, xh_fix], axis=1) if x_fix is not None else z_0
            net_out0 = self.phi(z0_in, t_zeros, full_node_mask, full_edge_mask,
                                context, mol_shape=mol_shape)
            if mol_shape is not None:
                net_out0 = net_out0[:, :mol_shape]
            loss_term_0 = -self.log_pxh_given_z0_without_constants(
                h, z_0, gamma_0, eps_0, net_out0, node_mask, train=train)
            loss = kl_prior + estimator_loss_terms + neg_log_constants + loss_term_0
        else:
            loss_term_0 = -self.log_pxh_given_z0_without_constants(
                h, z_t, gamma_t, eps, net_out, node_mask, train=train)
            t_is_not_zero = 1.0 - t_is_zero
            loss_t = loss_term_0 * t_is_zero.squeeze(-1) + t_is_not_zero.squeeze(-1) * loss_t_larger_than_zero
            if train and self.loss_type == "l2":
                estimator_loss_terms = loss_t
            else:
                estimator_loss_terms = (self.timesteps + 1) * loss_t
            loss = kl_prior + estimator_loss_terms + neg_log_constants

        return loss, {"t": t_int.squeeze(-1), "error": error}

    def nll(self, rng: Array, x: Array, h: Array, node_mask: Array, edge_mask: Array,
            context: Optional[Array] = None, train: bool = True,
            mol_shape: Optional[int] = None) -> Tuple[Array, Dict[str, Array]]:
        """Normalized NLL (training: 1-pass estimator; eval: t0_always).
        (reference: diffusion_qm9.py:675-699)
        """
        nm_mol = node_mask if mol_shape is None else node_mask[:, :mol_shape]
        x_n, h_n, delta_log_px = self.normalize(
            x[:, :mol_shape] if mol_shape is not None else x,
            h[:, :mol_shape] if mol_shape is not None else h, nm_mol)
        if mol_shape is not None:
            x = jnp.concatenate([x_n, x[:, mol_shape:]], axis=1)
            h = jnp.concatenate([h_n, h[:, mol_shape:]], axis=1)
        else:
            x, h = x_n, h_n
        if train and self.loss_type == "l2":
            delta_log_px = jnp.zeros_like(delta_log_px)
        loss, info = self.compute_loss(rng, x, h, node_mask, edge_mask, context,
                                       t0_always=not train, train=train,
                                       mol_shape=mol_shape)
        return loss - delta_log_px, info

    def __call__(self, batch: Dict[str, Any], rng: Array, train: bool = True) -> Dict[str, Array]:
        """Batch loss, mirroring the reference forward.
        (reference: diffusion_qm9.py:701-751)
        Expects: positions (B,N,3), node_feature (B,N,h_nf),
        atom_mask (B,N,1), edge_mask (B,N,N) or (B,N,N,1), optional context.
        """
        x = batch["positions"]
        node_mask = batch["atom_mask"].astype(x.dtype)
        edge_mask = batch["edge_mask"]
        h = batch["node_feature"]
        if h.shape[-1] != self.in_node_nf:
            raise ValueError(
                f"node_feature has {h.shape[-1]} channels but model was built "
                f"with in_node_nf={self.in_node_nf}")
        context = batch.get("context") if self.context_node_nf > 0 else None

        mol_shape = None
        if self.pocket:
            # concat frozen pocket rows after the molecule rows
            # (reference: diffusion_qm9.py:701-726)
            mol_shape = x.shape[1]
            x = jnp.concatenate([x, batch["protein_pos"]], axis=1)
            pfeat = self.pocket_embed(batch["protein_feat"].astype(jnp.int32))
            h = jnp.concatenate([h, pfeat], axis=1)
            pmask = batch["protein_feat_mask"].astype(x.dtype)
            node_mask = jnp.concatenate([node_mask, pmask], axis=1)
            n_tot = x.shape[1]
            em = jnp.zeros((x.shape[0], n_tot, n_tot), x.dtype)
            em = em.at[:, :mol_shape, :mol_shape].set(edge_mask)
            em = em.at[:, mol_shape:, mol_shape:].set(batch["protein_edge_mask"].astype(x.dtype))
            if self.pocket_cross_edges:
                cross = node_mask[:, :mol_shape, 0, None] * pmask[:, None, :, 0]
                em = em.at[:, :mol_shape, mol_shape:].set(cross)
                em = em.at[:, mol_shape:, :mol_shape].set(jnp.transpose(cross, (0, 2, 1)))
            edge_mask = em

        x = remove_mean_with_mask(x, node_mask, fix_size=mol_shape)
        nll, info = self.nll(rng, x, h, node_mask, edge_mask, context, train=train,
                             mol_shape=mol_shape)
        return {"loss": jnp.mean(nll), "nll": nll, **info}

    # --- reverse-process kernels (used by the sampler's lax.scan) ----------

    def sample_zs_stats(self, z_t: Array, gamma_s: Array, gamma_t: Array,
                        node_mask: Array, edge_mask: Array, t: Array,
                        context: Optional[Array] = None, mol_shape: Optional[int] = None):
        """mu and sigma of p(z_s | z_t). (reference: diffusion_qm9.py:312-337)"""
        sigma2_ts, sigma_ts, alpha_ts = sigma_and_alpha_t_given_s(gamma_t, gamma_s)
        sigma2_ts = inflate(sigma2_ts, z_t.ndim)
        sigma_ts = inflate(sigma_ts, z_t.ndim)
        alpha_ts = inflate(alpha_ts, z_t.ndim)
        sigma_s = inflate(sigma_from_gamma(gamma_s), z_t.ndim)
        sigma_t = inflate(sigma_from_gamma(gamma_t), z_t.ndim)

        eps_t = self.phi(z_t, t, node_mask, edge_mask, context, mol_shape)
        if mol_shape is not None:
            # slice to molecule rows BEFORE the CoM projection so the pocket
            # tail never enters the mean (reference: diffusion_qm9.py:324-331)
            eps_t = eps_t[:, :mol_shape]
            z_t = z_t[:, :mol_shape]
            node_mask = node_mask[:, :mol_shape]
        eps_x = remove_mean_with_mask(eps_t[:, :, : self.n_dims], node_mask)
        eps_t = jnp.concatenate([eps_x, eps_t[:, :, self.n_dims:]], axis=2)
        mu = z_t / alpha_ts - (sigma2_ts / alpha_ts / sigma_t) * eps_t
        sigma = sigma_ts * sigma_s / sigma_t
        return mu, sigma

    def sample_x_given_z0_stats(self, z0: Array, node_mask: Array, edge_mask: Array,
                                context: Optional[Array] = None):
        """mu and sigma of p(x | z_0). (reference: diffusion_qm9.py:294-310)"""
        b = z0.shape[0]
        zeros = jnp.zeros((b, 1), z0.dtype)
        gamma_0 = self.gamma_of(zeros)
        sigma_x = inflate(snr(-0.5 * gamma_0), z0.ndim)
        net_out = self.phi(z0, zeros, node_mask, edge_mask, context)
        sigma_0 = inflate(sigma_from_gamma(gamma_0), z0.ndim)
        alpha_0 = inflate(alpha_from_gamma(gamma_0), z0.ndim)
        mu_x = (z0 - sigma_0 * net_out) / alpha_0
        return mu_x, sigma_x
