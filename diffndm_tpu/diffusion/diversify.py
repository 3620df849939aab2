"""Partial noise-denoise diversification — backbone of the evolutionary
optimizer (reference conditional_model.py:369-446, optimize.py:92-147)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from diffndm_tpu.diffusion.core import CondDiffusion
from diffndm_tpu.diffusion.sampler import SampleResult
from diffndm_tpu.ops.segment import masked_mean, remove_mean_ligand
from diffndm_tpu.structs import NodeBatch


def build_diversify_run(core: CondDiffusion, eps_fn_builder,
                        noising_steps: int):
    n_dims = core.n_dims
    T = core.schedule.timesteps

    def run(params, key, lig_x, lig_h, lig_mask, pocket_x, pocket_h,
            pocket_mask):
        eps_fn = eps_fn_builder(params)
        nx, nh = core.cfg.norm_values
        bh = core.cfg.norm_biases[1]
        ml = lig_mask[..., None]
        mp = pocket_mask[..., None]
        b = lig_mask.shape[0]

        l_x = lig_x / nx * ml
        l_h = (lig_h - bh) / nh * ml
        p_x = pocket_x / nx * mp
        p_h = (pocket_h - bh) / nh * mp

        # centre input on ligand COM (conditional forward convention)
        l_x, p_x = remove_mean_ligand(l_x, p_x, lig_mask, pocket_mask)
        xh0_lig = jnp.concatenate([l_x, l_h], -1)
        xh0_pocket = jnp.concatenate([p_x, p_h], -1)

        # partially noise to step `noising_steps` (:369-399)
        key, k_noise = jax.random.split(key)
        gamma_t = core.gamma_int(
            jnp.full((b,), noising_steps, jnp.int32))
        z_lig, xh_pocket, _ = core.noised_representation(
            k_noise, xh0_lig, xh0_pocket, lig_mask, pocket_mask, gamma_t)

        def step(carry, s):
            z, xh_p, key = carry
            key, k1 = jax.random.split(key)
            s_norm = s.astype(jnp.float32) / T
            t_norm = (s.astype(jnp.float32) + 1.0) / T
            z, xh_p, _, _ = core.sample_p_zs_given_zt(
                k1, s_norm, t_norm, z, xh_p, lig_mask, pocket_mask, eps_fn)
            return (z, xh_p, key), None

        key, k_scan = jax.random.split(key)
        steps = jnp.arange(noising_steps - 1, -1, -1)
        (z_lig, xh_pocket, _), _ = jax.lax.scan(
            step, (z_lig, xh_pocket, k_scan), steps)

        key, k_dec = jax.random.split(key)
        x_lig, h_lig, x_pocket, h_pocket = core.sample_p_xh_given_z0(
            k_dec, z_lig, xh_pocket, lig_mask, pocket_mask, eps_fn)

        com_after = masked_mean(x_pocket, pocket_mask, axis=1, keepdims=True)
        shift = masked_mean(pocket_x, pocket_mask, axis=1,
                            keepdims=True) - com_after
        return ((x_lig + shift) * ml, h_lig, (x_pocket + shift) * mp,
                h_pocket)

    return jax.jit(run)


class DiversifySampler:
    def __init__(self, core, dynamics_module, params):
        self.core = core
        self.module = dynamics_module
        self.params = params
        self._cache = {}

    def _eps_builder(self, params):
        def fn(z_lig, xh_pocket, t, lig_mask, pocket_mask):
            return self.module.apply(params, z_lig, xh_pocket, t, lig_mask,
                                     pocket_mask)
        return fn

    def diversify(self, key, ligand: NodeBatch, pocket: NodeBatch,
                  noising_steps: int) -> SampleResult:
        ck = (noising_steps, ligand.x.shape, pocket.x.shape)
        if ck not in self._cache:
            self._cache[ck] = build_diversify_run(
                self.core, self._eps_builder, noising_steps)
        x_lig, h_lig, x_pocket, h_pocket = self._cache[ck](
            self.params, key, ligand.x, ligand.h, ligand.mask, pocket.x,
            pocket.h, pocket.mask)
        return SampleResult(
            ligand=NodeBatch(x=x_lig, h=h_lig, mask=ligand.mask),
            pocket=NodeBatch(x=x_pocket, h=h_pocket, mask=pocket.mask),
            avg_log_prob=jnp.zeros(()), rl_traj=None)
