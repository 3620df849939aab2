"""Conditional variational-DDPM math over padded batches.

Pure-functional re-design of the reference ``ConditionalDDPM`` math
(conditional_model.py:44-540) and shared pieces of ``EnVariationalDiffusion``
(en_diffusion.py).  All functions take explicit PRNG keys and operate on
``NodeBatch``-style padded arrays; batch-indexed gammas are ``[B]`` arrays
broadcast as ``[B, 1, 1]``.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from diffndm_tpu.config import DiffusionConfig
from diffndm_tpu.diffusion import schedules as S
from diffndm_tpu.diffusion.schedules import GammaSchedule
from diffndm_tpu.ops.segment import (masked_mean, remove_mean_ligand,
                                     sum_except_batch)

# eps_fn(xh_lig, xh_pocket, t, lig_mask, pocket_mask) -> (eps_lig, eps_pocket)
EpsFn = Callable[..., Tuple[jnp.ndarray, jnp.ndarray]]


def _b11(v: jnp.ndarray) -> jnp.ndarray:
    """[B] -> [B, 1, 1] for broadcasting over nodes/features."""
    return v.reshape(-1, 1, 1)


class CondDiffusion(NamedTuple):
    """Immutable bundle of schedule + normalization settings.

    simple=True selects the SimpleConditionalDDPM variant
    (conditional_model.py:1807-1851): no zero-COM subspace projection,
    full-dimensional likelihood, pocket COM pre-subtracted by the caller.
    """

    schedule: GammaSchedule
    cfg: DiffusionConfig
    atom_nf: int
    residue_nf: int
    n_dims: int = 3
    simple: bool = False

    def _project(self, out_x, pocket_x, lig_mask, pocket_mask):
        if self.simple:  # identity remove_mean (conditional_model.py:1822-1826)
            return (out_x * lig_mask[..., None],
                    pocket_x * pocket_mask[..., None])
        return remove_mean_ligand(out_x, pocket_x, lig_mask, pocket_mask)

    # -- normalization (en_diffusion.py:885-917) ---------------------------
    def normalize_xh(self, xh: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        nx, nh = self.cfg.norm_values
        bh = self.cfg.norm_biases[1]
        x = xh[..., :self.n_dims] / nx
        h = (xh[..., self.n_dims:] - bh) / nh
        return jnp.concatenate([x, h], -1) * mask[..., None]

    def unnormalize_xh(self, xh: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        nx, nh = self.cfg.norm_values
        bh = self.cfg.norm_biases[1]
        x = xh[..., :self.n_dims] * nx
        h = xh[..., self.n_dims:] * nh + bh
        return jnp.concatenate([x, h], -1) * mask[..., None]

    # -- schedule shortcuts ------------------------------------------------
    def gamma_int(self, step: jnp.ndarray) -> jnp.ndarray:
        return self.schedule.at_step(step)

    def alpha(self, gamma):
        return S.alpha(gamma)

    def sigma(self, gamma):
        return S.sigma(gamma)

    # -- q(z_t | x) --------------------------------------------------------
    def noised_representation(self, key, xh_lig, xh_pocket, lig_mask,
                              pocket_mask, gamma_t):
        """Noise the ligand at gamma_t and re-centre both parts on the noisy
        ligand COM (conditional_model.py:188-219).

        gamma_t: [B].  Returns (z_t_lig, xh_pocket_shifted, eps_lig).
        """
        a, s = _b11(self.alpha(gamma_t)), _b11(self.sigma(gamma_t))
        eps = jax.random.normal(key, xh_lig.shape, xh_lig.dtype)
        eps = eps * lig_mask[..., None]
        z_t = a * xh_lig + s * eps
        zx, px = self._project(z_t[..., :self.n_dims],
                               xh_pocket[..., :self.n_dims],
                               lig_mask, pocket_mask)
        z_t = jnp.concatenate([zx, z_t[..., self.n_dims:]], -1)
        xh_pocket = jnp.concatenate([px, xh_pocket[..., self.n_dims:]], -1)
        return z_t, xh_pocket, eps

    def sample_normal_zero_com(self, key, mu_lig, xh_pocket, sigma, lig_mask,
                               pocket_mask, fix_noise: bool = False):
        """z ~ N(mu, sigma), then project coordinates to the ligand-COM-free
        subspace (conditional_model.py:165-186).

        sigma: [B] or [B,1,1].  fix_noise=True uses zero noise (the mean) —
        the deterministic branch the reference left NotImplemented; needed
        for golden-value tests.
        """
        if fix_noise:
            eps = jnp.zeros_like(mu_lig)
        else:
            eps = jax.random.normal(key, mu_lig.shape, mu_lig.dtype)
        eps = eps * lig_mask[..., None]
        sigma = _b11(jnp.asarray(sigma).reshape(mu_lig.shape[0], -1)[:, 0])
        out = mu_lig + sigma * eps
        ox, px = self._project(out[..., :self.n_dims],
                               xh_pocket[..., :self.n_dims],
                               lig_mask, pocket_mask)
        out = jnp.concatenate([ox, out[..., self.n_dims:]], -1)
        xh_pocket = jnp.concatenate([px, xh_pocket[..., self.n_dims:]], -1)
        return out, xh_pocket

    # -- single reverse step (conditional_model.py:483-540) ---------------
    def sample_p_zs_given_zt(self, key, s_norm, t_norm, z_lig, xh_pocket,
                             lig_mask, pocket_mask, eps_fn: EpsFn,
                             adjust_fn=None, fix_noise: bool = False,
                             noise_scale: float = 1.0):
        """One denoising step t -> s with *normalized* times in [0, 1]
        ([B] or scalar) — gamma lookup rounds t*T like the reference
        (en_diffusion.py:1193-1195), so sampling with timesteps != T works.

        adjust_fn: optional policy z_t -> adjustment added to eps_hat (the
        AdjustNet hook, conditional_model.py:509-516); returns
        (z_s, xh_pocket, log_prob_adjust, eps_lig_pre_adjustment).

        noise_scale: OPTIONAL low-temperature sampling (beyond the
        reference, SampleConfig.noise_scale): the posterior mean is kept
        exact and only the injected noise is scaled — a standard
        sample-quality/diversity trade.  1.0 = reference parity (the
        scaling branch is not even traced).
        """
        b = z_lig.shape[0]
        s_norm = jnp.broadcast_to(s_norm, (b,))
        t_norm = jnp.broadcast_to(t_norm, (b,))
        gamma_s = self.schedule(s_norm)
        gamma_t = self.schedule(t_norm)

        sig2_ts, sig_ts, alpha_ts = S.sigma_and_alpha_t_given_s(
            gamma_t, gamma_s)
        sigma_s, sigma_t = self.sigma(gamma_s), self.sigma(gamma_t)

        eps_lig, _ = eps_fn(z_lig, xh_pocket, t_norm, lig_mask, pocket_mask)
        eps_pre = eps_lig

        log_prob_adjust = jnp.zeros(())
        if adjust_fn is not None:
            adjustment = adjust_fn(z_lig)
            # log-prob proxy: -0.5 * mean((adjustment - eps_hat)^2)
            # (conditional_model.py:509-511)
            log_prob_adjust = -0.5 * jnp.mean((adjustment - eps_lig) ** 2)
            eps_lig = eps_lig + adjustment

        mu = (z_lig / _b11(alpha_ts)
              - _b11(sig2_ts / alpha_ts / sigma_t) * eps_lig)
        sigma = sig_ts * sigma_s / sigma_t
        if noise_scale != 1.0:
            sigma = sigma * noise_scale
        z_s, xh_pocket = self.sample_normal_zero_com(
            key, mu, xh_pocket, sigma, lig_mask, pocket_mask, fix_noise)
        return z_s, xh_pocket, log_prob_adjust, eps_pre

    def sample_p_zt_given_zs(self, key, z_s_lig, xh_pocket, lig_mask,
                             pocket_mask, gamma_t, gamma_s,
                             fix_noise: bool = False):
        """Forward re-noising s -> t used by RePaint resampling
        (conditional_model.py:470-481)."""
        _, sig_ts, alpha_ts = S.sigma_and_alpha_t_given_s(gamma_t, gamma_s)
        mu = _b11(alpha_ts) * z_s_lig
        return self.sample_normal_zero_com(key, mu, xh_pocket, sig_ts,
                                           lig_mask, pocket_mask, fix_noise)

    # -- x0 prediction -----------------------------------------------------
    def xh_given_zt_and_epsilon(self, z_t, eps, gamma_t):
        """EDM eq. (7) (conditional_model.py:449-455); gamma_t: [B]."""
        a, s = _b11(self.alpha(gamma_t)), _b11(self.sigma(gamma_t))
        return z_t / a - eps * s / a

    def to_x0(self, z_t_lig, xh_pocket, t_norm, lig_mask, pocket_mask,
              eps_fn: EpsFn):
        """One-step x0 projection used by guidance lookahead
        (conditional_model.py:456-468): predict eps at t and roll to z0."""
        b = z_t_lig.shape[0]
        t_norm = jnp.broadcast_to(t_norm, (b,))
        gamma_t = self.schedule(t_norm)
        eps_lig, _ = eps_fn(z_t_lig, xh_pocket, t_norm, lig_mask, pocket_mask)
        z0 = self.xh_given_zt_and_epsilon(z_t_lig, eps_lig, gamma_t)
        return z0

    def sample_p_xh_given_z0(self, key, z0_lig, xh_pocket, lig_mask,
                             pocket_mask, eps_fn: EpsFn,
                             fix_noise: bool = False):
        """Final decode x,h ~ p(x,h|z0) (conditional_model.py:135-160).

        Returns (x_lig, h_lig_onehot, x_pocket, h_pocket) unnormalized;
        ligand types are hard one-hot argmax.
        """
        b = z0_lig.shape[0]
        gamma_0 = self.gamma_int(jnp.zeros((b,), jnp.int32))
        sigma_x = S.snr(-0.5 * gamma_0)  # sqrt(sigma0^2/alpha0^2)
        t_zeros = jnp.zeros((b,))
        eps_lig, _ = eps_fn(z0_lig, xh_pocket, t_zeros, lig_mask, pocket_mask)
        mu_x = self.xh_given_zt_and_epsilon(z0_lig, eps_lig, gamma_0)
        xh_lig, xh_pocket = self.sample_normal_zero_com(
            key, mu_x, xh_pocket, sigma_x, lig_mask, pocket_mask, fix_noise)

        nx, nh = self.cfg.norm_values
        bh = self.cfg.norm_biases[1]
        x_lig = xh_lig[..., :self.n_dims] * nx
        # NOTE: types decoded from z0 (not the re-noised sample), matching
        # conditional_model.py:151-152.
        h_lig = z0_lig[..., self.n_dims:] * nh + bh
        x_pocket = xh_pocket[..., :self.n_dims] * nx
        h_pocket = xh_pocket[..., self.n_dims:] * nh + bh

        h_onehot = jax.nn.one_hot(jnp.argmax(h_lig, axis=-1), self.atom_nf,
                                  dtype=x_lig.dtype)
        ml = lig_mask[..., None]
        return (x_lig * ml, h_onehot * ml, x_pocket * pocket_mask[..., None],
                h_pocket * pocket_mask[..., None])

    # -- loss terms (conditional_model.py:44-134, :238-367) ----------------
    def subspace_dimensionality(self, num_nodes):
        if self.simple:  # full-dimensional space (conditional_model.py:1818-1820)
            return num_nodes * self.n_dims
        return (num_nodes - 1) * self.n_dims

    def kl_prior(self, xh_lig, lig_mask, num_nodes):
        """KL(q(z_T|x) || N(0,1)) for the ligand
        (conditional_model.py:44-80)."""
        b = xh_lig.shape[0]
        gamma_T = self.gamma_int(
            jnp.full((b,), self.schedule.timesteps, jnp.int32))
        alpha_T = _b11(self.alpha(gamma_T))
        mu = alpha_T * xh_lig
        mu_x, mu_h = mu[..., :self.n_dims], mu[..., self.n_dims:]
        sigma_T = self.sigma(gamma_T)  # [B]

        def gaussian_kl(mu_norm2, q_sigma, d):
            return (d * jnp.log(1.0 / q_sigma)
                    + 0.5 * (d * q_sigma ** 2 + mu_norm2) - 0.5 * d)

        kl_h = gaussian_kl(sum_except_batch(mu_h ** 2, lig_mask), sigma_T,
                           d=1.0)
        kl_x = gaussian_kl(sum_except_batch(mu_x ** 2, lig_mask), sigma_T,
                           d=self.subspace_dimensionality(num_nodes))
        return kl_x + kl_h

    def log_constants_p_x_given_z0(self, num_nodes):
        """(en_diffusion.py:172-184)"""
        gamma_0 = self.gamma_int(jnp.zeros((), jnp.int32))
        dof = self.subspace_dimensionality(num_nodes)
        log_sigma_x = 0.5 * gamma_0
        return dof * (-log_sigma_x - 0.5 * jnp.log(2 * jnp.pi))

    def log_pxh_given_z0_without_constants(self, lig_h_onehot, z0_lig,
                                           eps_lig, net_lig, lig_mask,
                                           gamma_0, epsilon=1e-10):
        """L0 reconstruction terms (conditional_model.py:82-134).

        lig_h_onehot: *normalized* one-hot features of the clean ligand.
        gamma_0: [B].  Returns (log_p_x, log_p_h), each [B].
        """
        nh = self.cfg.norm_values[1]
        bh = self.cfg.norm_biases[1]
        z_h = z0_lig[..., self.n_dims:]
        eps_x = eps_lig[..., :self.n_dims]
        net_x = net_lig[..., :self.n_dims]

        sq = (eps_x - net_x) ** 2
        if self.cfg.virtual_node_idx is not None:
            vmask = 1.0 - lig_h_onehot[..., self.cfg.virtual_node_idx:
                                       self.cfg.virtual_node_idx + 1]
            sq = sq * vmask
        log_p_x = -0.5 * sum_except_batch(sq, lig_mask)

        sigma_0_cat = _b11(self.sigma(gamma_0)) * nh
        onehot = lig_h_onehot * nh + bh
        est = z_h * nh + bh
        centered = est - 1.0

        def cdf(v):
            return 0.5 * (1.0 + jax.lax.erf(v / math.sqrt(2)))

        # fp32 rounding can make the CDF difference slightly negative when
        # both tails saturate; clamp before the log
        cdf_diff = (cdf((centered + 0.5) / sigma_0_cat)
                    - cdf((centered - 0.5) / sigma_0_cat))
        log_ph_prop = jnp.log(jnp.maximum(cdf_diff, 0.0) + epsilon)
        log_z = jax.nn.logsumexp(log_ph_prop, axis=-1, keepdims=True)
        log_probs = log_ph_prop - log_z
        log_p_h = sum_except_batch(log_probs * onehot, lig_mask)
        return log_p_x, log_p_h


def init_ligand_from_pocket(key, core: CondDiffusion, pocket_x, pocket_h,
                            lig_mask, pocket_mask):
    """Initial z_lig ~ N(pocket COM, 1) projected to zero ligand COM
    (conditional_model.py:918-930). Pocket must already be normalized."""
    b, nl = lig_mask.shape
    mu_x = masked_mean(pocket_x, pocket_mask, axis=1, keepdims=True)
    mu = jnp.concatenate(
        [jnp.broadcast_to(mu_x, (b, nl, core.n_dims)),
         jnp.zeros((b, nl, core.atom_nf), pocket_x.dtype)], -1)
    mu = mu * lig_mask[..., None]
    xh0_pocket = jnp.concatenate([pocket_x, pocket_h], -1)
    return core.sample_normal_zero_com(
        key, mu, xh0_pocket, jnp.ones((b,)), lig_mask, pocket_mask)


def assert_mean_zero(x, mask, eps=1e-10, tol=1e-2):
    """Host-side invariant check (en_diffusion.py:930-935); returns relative
    COM error for use in tests (never call inside jit)."""
    import numpy as np

    x = np.asarray(x)
    m = np.asarray(mask)[..., None]
    largest = np.abs(x * m).max()
    err = np.abs((x * m).sum(axis=1)).max()
    return err / (largest + eps) < tol
