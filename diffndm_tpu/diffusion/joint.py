"""Joint (unconditional) E(n) variational diffusion over ligand+pocket.

Re-design of the reference ``EnVariationalDiffusion`` sampling/inpainting
paths (en_diffusion.py:13-842) for mode='joint': BOTH ligand and pocket are
denoised; the zero-COM subspace is the *joint* point cloud
(en_diffusion.py:924-928), and the node-count prior samples
(N_lig, N_pocket) jointly.

Training for the joint model reuses the same loss terms with pocket error
included (en_diffusion.py:339-472); see train/losses.joint_loss_terms.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffndm_tpu.config import DiffusionConfig
from diffndm_tpu.diffusion import schedules as S
from diffndm_tpu.diffusion.core import _b11
from diffndm_tpu.diffusion.schedules import GammaSchedule
from diffndm_tpu.ops.segment import masked_mean, remove_mean_joint
from diffndm_tpu.structs import NodeBatch


class JointDiffusion(NamedTuple):
    """Joint-model math bundle (cf. CondDiffusion for the conditional)."""

    schedule: GammaSchedule
    cfg: DiffusionConfig
    atom_nf: int
    residue_nf: int
    n_dims: int = 3

    def alpha(self, gamma):
        return S.alpha(gamma)

    def sigma(self, gamma):
        return S.sigma(gamma)

    def normalize_xh(self, xh, mask, nf):
        nx, nh = self.cfg.norm_values
        bh = self.cfg.norm_biases[1]
        x = xh[..., :self.n_dims] / nx
        h = (xh[..., self.n_dims:] - bh) / nh
        return jnp.concatenate([x, h], -1) * mask[..., None]

    def unnormalize_xh(self, xh, mask):
        nx, nh = self.cfg.norm_values
        bh = self.cfg.norm_biases[1]
        x = xh[..., :self.n_dims] * nx
        h = xh[..., self.n_dims:] * nh + bh
        return jnp.concatenate([x, h], -1) * mask[..., None]

    # -- joint noise --------------------------------------------------------
    def sample_joint_noise(self, key, lig_mask, pocket_mask):
        """Mean-centred positional noise over the joint cloud + standard
        feature noise (en_diffusion.py:564-583, :937-947)."""
        b, nl = lig_mask.shape
        npk = pocket_mask.shape[1]
        kx, khl, khp = jax.random.split(key, 3)
        zx_l = jax.random.normal(kx, (b, nl, self.n_dims))
        zx_p = jax.random.normal(jax.random.fold_in(kx, 1),
                                 (b, npk, self.n_dims))
        zx_l = zx_l * lig_mask[..., None]
        zx_p = zx_p * pocket_mask[..., None]
        zx_l, zx_p = remove_mean_joint(zx_l, zx_p, lig_mask, pocket_mask)
        zh_l = jax.random.normal(khl, (b, nl, self.atom_nf)) * \
            lig_mask[..., None]
        zh_p = jax.random.normal(khp, (b, npk, self.residue_nf)) * \
            pocket_mask[..., None]
        return (jnp.concatenate([zx_l, zh_l], -1),
                jnp.concatenate([zx_p, zh_p], -1))

    def noised_representation(self, key, xh_lig, xh_pocket, lig_mask,
                              pocket_mask, gamma_t):
        a, s = _b11(self.alpha(gamma_t)), _b11(self.sigma(gamma_t))
        eps_l, eps_p = self.sample_joint_noise(key, lig_mask, pocket_mask)
        return (a * xh_lig + s * eps_l, a * xh_pocket + s * eps_p,
                eps_l, eps_p)

    # -- reverse step (en_diffusion.py:506-562) ----------------------------
    def sample_p_zs_given_zt(self, key, s_norm, t_norm, z_lig, z_pocket,
                             lig_mask, pocket_mask, eps_fn,
                             fix_noise: bool = False):
        b = z_lig.shape[0]
        s_norm = jnp.broadcast_to(s_norm, (b,))
        t_norm = jnp.broadcast_to(t_norm, (b,))
        gamma_s, gamma_t = self.schedule(s_norm), self.schedule(t_norm)
        sig2_ts, sig_ts, alpha_ts = S.sigma_and_alpha_t_given_s(gamma_t,
                                                                gamma_s)
        sigma_s, sigma_t = self.sigma(gamma_s), self.sigma(gamma_t)

        eps_l, eps_p = eps_fn(z_lig, z_pocket, t_norm, lig_mask,
                              pocket_mask)
        coef = _b11(sig2_ts / alpha_ts / sigma_t)
        mu_l = z_lig / _b11(alpha_ts) - coef * eps_l
        mu_p = z_pocket / _b11(alpha_ts) - coef * eps_p
        sigma = _b11(sig_ts * sigma_s / sigma_t)
        if fix_noise:
            n_l = jnp.zeros_like(mu_l)
            n_p = jnp.zeros_like(mu_p)
        else:
            n_l, n_p = self.sample_joint_noise(key, lig_mask, pocket_mask)
        z_l = mu_l + sigma * n_l
        z_p = mu_p + sigma * n_p
        # project joint COM (en_diffusion.py:552-561)
        zx_l, zx_p = remove_mean_joint(z_l[..., :self.n_dims],
                                       z_p[..., :self.n_dims], lig_mask,
                                       pocket_mask)
        z_l = jnp.concatenate([zx_l, z_l[..., self.n_dims:]], -1)
        z_p = jnp.concatenate([zx_p, z_p[..., self.n_dims:]], -1)
        return z_l, z_p

    def sample_p_zt_given_zs(self, key, z_l, z_p, lig_mask, pocket_mask,
                             gamma_t, gamma_s):
        """(en_diffusion.py:482-504)"""
        _, sig_ts, alpha_ts = S.sigma_and_alpha_t_given_s(gamma_t, gamma_s)
        n_l, n_p = self.sample_joint_noise(key, lig_mask, pocket_mask)
        z_l = _b11(alpha_ts) * z_l + _b11(sig_ts) * n_l
        z_p = _b11(alpha_ts) * z_p + _b11(sig_ts) * n_p
        zx_l, zx_p = remove_mean_joint(z_l[..., :self.n_dims],
                                       z_p[..., :self.n_dims], lig_mask,
                                       pocket_mask)
        return (jnp.concatenate([zx_l, z_l[..., self.n_dims:]], -1),
                jnp.concatenate([zx_p, z_p[..., self.n_dims:]], -1))

    def sample_p_xh_given_z0(self, key, z0_l, z0_p, lig_mask, pocket_mask,
                             eps_fn, fix_noise: bool = False):
        """(en_diffusion.py:264-289): decode both parts, argmax types."""
        b = z0_l.shape[0]
        gamma_0 = self.schedule(jnp.zeros((b,)))
        sigma_x = _b11(S.snr(-0.5 * gamma_0))
        eps_l, eps_p = eps_fn(z0_l, z0_p, jnp.zeros((b,)), lig_mask,
                              pocket_mask)
        a0, s0 = _b11(self.alpha(gamma_0)), _b11(self.sigma(gamma_0))
        mu_l = z0_l / a0 - eps_l * s0 / a0
        mu_p = z0_p / a0 - eps_p * s0 / a0
        if fix_noise:
            n_l = jnp.zeros_like(mu_l)
            n_p = jnp.zeros_like(mu_p)
        else:
            n_l, n_p = self.sample_joint_noise(key, lig_mask, pocket_mask)
        xh_l = mu_l + sigma_x * n_l
        xh_p = mu_p + sigma_x * n_p

        nx, nh = self.cfg.norm_values
        bh = self.cfg.norm_biases[1]
        x_l = xh_l[..., :self.n_dims] * nx
        x_p = xh_p[..., :self.n_dims] * nx
        h_l = z0_l[..., self.n_dims:] * nh + bh
        h_p = z0_p[..., self.n_dims:] * nh + bh
        h_l = jax.nn.one_hot(jnp.argmax(h_l, -1), self.atom_nf,
                             dtype=x_l.dtype)
        h_p = jax.nn.one_hot(jnp.argmax(h_p, -1), self.residue_nf,
                             dtype=x_p.dtype)
        ml, mp = lig_mask[..., None], pocket_mask[..., None]
        return x_l * ml, h_l * ml, x_p * mp, h_p * mp


def get_repaint_schedule(resamplings: int, jump_length: int,
                         timesteps: int) -> List[int]:
    """Denoise-run lengths between jumps (en_diffusion.py:658-679)."""
    schedule: List[int] = []
    curr_t = 0
    while curr_t < timesteps:
        if curr_t + jump_length < timesteps:
            if schedule:
                schedule[-1] += jump_length
                schedule.extend([jump_length] * (resamplings - 1))
            else:
                schedule.extend([jump_length] * resamplings)
            curr_t += jump_length
        else:
            residual = timesteps - curr_t
            if schedule:
                schedule[-1] += residual
            else:
                schedule.append(residual)
            curr_t += residual
    return list(reversed(schedule))


class JointSampler:
    """sample() and inpaint() for the joint model
    (en_diffusion.py:585-842)."""

    def __init__(self, core: JointDiffusion, dynamics_module, params):
        self.core = core
        self.module = dynamics_module
        self.params = params
        self._cache = {}

    def _eps_fn(self, params):
        def fn(z_l, z_p, t, lm, pm):
            return self.module.apply(params, z_l, z_p, t, lm, pm)
        return fn

    def _build_sample(self, timesteps):
        core = self.core

        def run(params, key, lig_mask, pocket_mask):
            eps_fn = self._eps_fn(params)
            key, k0 = jax.random.split(key)
            z_l, z_p = core.sample_joint_noise(k0, lig_mask, pocket_mask)

            def step(carry, s):
                z_l, z_p, key = carry
                key, k = jax.random.split(key)
                s_norm = s.astype(jnp.float32) / timesteps
                t_norm = (s.astype(jnp.float32) + 1.0) / timesteps
                z_l, z_p = core.sample_p_zs_given_zt(
                    k, s_norm, t_norm, z_l, z_p, lig_mask, pocket_mask,
                    eps_fn)
                return (z_l, z_p, key), None

            steps = jnp.arange(timesteps - 1, -1, -1)
            (z_l, z_p, key), _ = jax.lax.scan(step, (z_l, z_p, key), steps)
            key, kd = jax.random.split(key)
            x_l, h_l, x_p, h_p = core.sample_p_xh_given_z0(
                kd, z_l, z_p, lig_mask, pocket_mask, eps_fn)
            # CoG drift projection (en_diffusion.py:641-649)
            x_l, x_p = remove_mean_joint(x_l, x_p, lig_mask, pocket_mask)
            return x_l, h_l, x_p, h_p

        return jax.jit(run)

    def sample(self, key, num_nodes_lig, num_nodes_pocket,
               timesteps: Optional[int] = None, lig_pad: int = 8,
               pocket_pad: int = 32) -> Tuple[NodeBatch, NodeBatch]:
        timesteps = timesteps or self.core.schedule.timesteps
        from diffndm_tpu.structs import pad_to

        num_nodes_lig = np.asarray(num_nodes_lig)
        num_nodes_pocket = np.asarray(num_nodes_pocket)
        nl = pad_to(int(num_nodes_lig.max()), lig_pad)
        npk = pad_to(int(num_nodes_pocket.max()), pocket_pad)
        lm = jnp.asarray((np.arange(nl)[None] <
                          num_nodes_lig[:, None]).astype(np.float32))
        pm = jnp.asarray((np.arange(npk)[None] <
                          num_nodes_pocket[:, None]).astype(np.float32))
        ck = (timesteps, nl, npk, lm.shape[0])
        if ck not in self._cache:
            self._cache[ck] = self._build_sample(timesteps)
        x_l, h_l, x_p, h_p = self._cache[ck](self.params, key, lm, pm)
        return (NodeBatch(x=x_l, h=h_l, mask=lm),
                NodeBatch(x=x_p, h=h_p, mask=pm))

    def inpaint(self, key, ligand: NodeBatch, pocket: NodeBatch,
                lig_fixed, pocket_fixed, resamplings: int = 1,
                jump_length: int = 1, timesteps: Optional[int] = None
                ) -> Tuple[NodeBatch, NodeBatch]:
        """Joint RePaint (en_diffusion.py:681-842), host-driven schedule
        over jitted segments (the repaint schedule is data-independent)."""
        core = self.core
        timesteps = timesteps or core.schedule.timesteps
        eps_fn = self._eps_fn(self.params)
        lm, pm = ligand.mask, pocket.mask
        lf = jnp.asarray(lig_fixed, jnp.float32)[..., None]
        pf = jnp.asarray(pocket_fixed, jnp.float32)[..., None]

        xh0_l = core.normalize_xh(ligand.xh, lm, core.atom_nf)
        xh0_p = core.normalize_xh(pocket.xh, pm, core.residue_nf)

        # centre on the COM of the known parts (en_diffusion.py:711-722)
        num = (jnp.sum(xh0_l[..., :3] * lf, 1) + jnp.sum(
            xh0_p[..., :3] * pf, 1))
        den = jnp.maximum(jnp.sum(lf, 1) + jnp.sum(pf, 1), 1e-9)
        mean_known = (num / den)[:, None, :]
        xh0_l = jnp.concatenate(
            [(xh0_l[..., :3] - mean_known) * lm[..., None],
             xh0_l[..., 3:]], -1)
        xh0_p = jnp.concatenate(
            [(xh0_p[..., :3] - mean_known) * pm[..., None],
             xh0_p[..., 3:]], -1)

        key, k0 = jax.random.split(key)
        z_l, z_p = core.sample_joint_noise(k0, lm, pm)

        def fixed_com(a_l, a_p):
            num = (jnp.sum(a_l[..., :3] * lf, 1)
                   + jnp.sum(a_p[..., :3] * pf, 1))
            return (num / den)[:, None, :]

        @jax.jit
        def one_step(key, z_l, z_p, s):
            s_norm = s.astype(jnp.float32) / timesteps
            t_norm = (s.astype(jnp.float32) + 1.0) / timesteps
            gamma_s = core.schedule(jnp.broadcast_to(s_norm,
                                                     (z_l.shape[0],)))
            k1, k2 = jax.random.split(key)
            zl_un, zp_un = core.sample_p_zs_given_zt(
                k1, s_norm, t_norm, z_l, z_p, lm, pm, eps_fn)
            zl_kn, zp_kn, _, _ = core.noised_representation(
                k2, xh0_l, xh0_p, lm, pm, gamma_s)
            d = fixed_com(zl_un, zp_un) - fixed_com(zl_kn, zp_kn)
            zl_kn = jnp.concatenate(
                [(zl_kn[..., :3] + d) * lm[..., None], zl_kn[..., 3:]], -1)
            zp_kn = jnp.concatenate(
                [(zp_kn[..., :3] + d) * pm[..., None], zp_kn[..., 3:]], -1)
            z_l = zl_kn * lf + zl_un * (1 - lf)
            z_p = zp_kn * pf + zp_un * (1 - pf)
            return z_l * lm[..., None], z_p * pm[..., None]

        @jax.jit
        def jump(key, z_l, z_p, s, t):
            gamma_t = core.schedule(
                jnp.broadcast_to(t.astype(jnp.float32) / timesteps,
                                 (z_l.shape[0],)))
            gamma_s = core.schedule(
                jnp.broadcast_to(s.astype(jnp.float32) / timesteps,
                                 (z_l.shape[0],)))
            return core.sample_p_zt_given_zs(key, z_l, z_p, lm, pm,
                                             gamma_t, gamma_s)

        schedule = get_repaint_schedule(resamplings, jump_length, timesteps)
        s = timesteps - 1
        for i, n_steps in enumerate(schedule):
            for _ in range(n_steps):
                key, k = jax.random.split(key)
                z_l, z_p = one_step(k, z_l, z_p, jnp.asarray(s))
                s -= 1
            if i < len(schedule) - 1:
                # jump back: renoise the last denoised level s+1 up to
                # s+1+jump_length, then continue denoising from there
                # (en_diffusion.py:798-816)
                s_denoised = s + 1
                t_next = s_denoised + jump_length
                key, k = jax.random.split(key)
                z_l, z_p = jump(k, z_l, z_p, jnp.asarray(s_denoised),
                                jnp.asarray(t_next))
                s = t_next - 1

        key, kd = jax.random.split(key)
        x_l, h_l, x_p, h_p = core.sample_p_xh_given_z0(kd, z_l, z_p, lm, pm,
                                                       eps_fn)
        x_l, x_p = remove_mean_joint(x_l, x_p, lm, pm)
        return (NodeBatch(x=x_l, h=h_l, mask=lm),
                NodeBatch(x=x_p, h=h_p, mask=pm))
