"""RePaint-style conditional inpainting (fragment-constrained generation).

Re-design of the reference ``ConditionalDDPM.inpaint``
(conditional_model.py:1491-1791) as a nested ``lax.scan``: outer over
timesteps, inner over resampling iterations.  The fixed-substructure mask
``lig_fixed`` is a padded [B, NL] float mask (subset of the ligand mask).

Faithfulness notes:
- centering on the fixed-fragment COM or the pocket COM (:1526-1534);
- the known part is re-noised from the input at gamma_s each iteration,
  with the pocket-drift compensation ``ligand.x + (com_pocket -
  com_pocket_0)`` (:1589-1595);
- fixed-atom COM alignment between known and denoised parts before the
  mask combine (:1600-1612);
- re-noising z_s -> z_t between resampling iterations (:1614-1618);
- optional SPSA hook in a step window (:1573-1586; the reference hard-codes
  it active for 12 <= s <= 16, u < 1 with no CLI flag — here it is a config
  switch) and the ATP pruning hook after the resampling loop (:1629-1778).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffndm_tpu.config import SampleConfig
from diffndm_tpu.diffusion.core import CondDiffusion
from diffndm_tpu.diffusion.sampler import SampleResult
from diffndm_tpu.guidance.atp import atp_prune
from diffndm_tpu.guidance.spsa import spsa_update
from diffndm_tpu.ops.segment import masked_mean, remove_mean_ligand
from diffndm_tpu.structs import NodeBatch



def repaint_combine(core, z_unknown, xh_p, lm, pm, fixed, l_x, l_h,
                    com_p0, gamma_s, gamma_t, k3, k4, u, resamplings):
    """Shared tail of one RePaint (s, u) iteration: re-noise the known
    part from the drift-compensated input, align the fixed-atom COMs,
    combine known/unknown through the fixed mask and re-noise between
    resampling iterations (conditional_model.py:1589-1618).  Used by the
    fused scan AND the host-orchestrated loop (host_inpaint.py) so the
    two paths stay numerically identical by construction."""
    n_dims = core.n_dims
    mlc = lm[..., None]
    mpc = pm[..., None]

    def fixed_mean(x):
        fsum = jnp.maximum(jnp.sum(fixed, axis=1, keepdims=True), 1e-9)
        return jnp.sum(x * fixed, axis=1, keepdims=True) / fsum

    com_pocket = masked_mean(xh_p[..., :n_dims], pm, axis=1, keepdims=True)
    xh_ligand = jnp.concatenate(
        [(l_x + (com_pocket - com_p0)) * mlc, l_h], -1)
    z_known, xh_p, _ = core.noised_representation(
        k3, xh_ligand, xh_p, lm, pm, gamma_s)

    dx = fixed_mean(z_unknown[..., :n_dims]) \
        - fixed_mean(z_known[..., :n_dims])
    z_known = jnp.concatenate(
        [(z_known[..., :n_dims] + dx) * mlc, z_known[..., n_dims:]], -1)
    xh_p = jnp.concatenate(
        [(xh_p[..., :n_dims] + dx) * mpc, xh_p[..., n_dims:]], -1)

    z = (z_known * fixed + z_unknown * (1.0 - fixed)) * mlc

    def renoise(args):
        z_, xh_ = args
        return core.sample_p_zt_given_zs(k4, z_, xh_, lm, pm, gamma_t,
                                         gamma_s)

    return jax.lax.cond(u < resamplings - 1, renoise, lambda a: a,
                        (z, xh_p))


def build_inpaint_run(core: CondDiffusion, eps_fn_builder, cfg: SampleConfig,
                      oracle, timesteps: int, resamplings: int,
                      spsa_enabled: bool, atp_enabled: bool,
                      center: str = "ligand"):
    """Returns a jittable run(params, key, ligand_x, ligand_h, lig_mask,
    lig_fixed, pocket_x, pocket_h, pocket_mask) -> decoded tensors."""
    icfg = cfg.inpaint
    n_dims = core.n_dims

    def run(params, key, lig_x, lig_h, lig_mask, lig_fixed, pocket_x,
            pocket_h, pocket_mask):
        eps_fn = eps_fn_builder(params)
        pocket_mask0 = pocket_mask  # pre-selection masks for frame restore
        nx, nh = core.cfg.norm_values
        bh = core.cfg.norm_biases[1]
        ml = lig_mask[..., None]
        mp = pocket_mask[..., None]
        fixed = (lig_fixed * lig_mask)[..., None]

        # normalize
        l_x = lig_x / nx * ml
        l_h = (lig_h - bh) / nh * ml
        p_x = pocket_x / nx * mp
        p_h = (pocket_h - bh) / nh * mp

        xh0_pocket = jnp.concatenate([p_x, p_h], -1)
        com_pocket_0 = masked_mean(p_x, pocket_mask, axis=1, keepdims=True)

        # initial z ~ N(center, 1) (:1536-1543)
        if center == "ligand":
            fsum = jnp.maximum(jnp.sum(fixed, axis=1, keepdims=True), 1e-9)
            mean_known = jnp.sum(l_x * fixed, axis=1, keepdims=True) / fsum
        elif center == "pocket":
            mean_known = com_pocket_0
        else:
            raise NotImplementedError(center)
        b, nl = lig_mask.shape
        mu = jnp.concatenate(
            [jnp.broadcast_to(mean_known, (b, nl, n_dims)),
             jnp.zeros((b, nl, core.atom_nf))], -1) * ml
        key, k0 = jax.random.split(key)
        z_lig, xh_pocket = core.sample_normal_zero_com(
            k0, mu, xh0_pocket, jnp.ones((b,)), lig_mask, pocket_mask)
        # position-based RNG: keys derive from (run_key, s, u), matching
        # the discipline in sampler.py/host_guided.py so a host-orchestrated
        # RePaint loop derives identical keys
        run_key = key

        # ATP selection can replicate candidates across rows (global
        # top-B); every per-row quantity the loop consumes — masks, the
        # fixed-fragment mask, the clean fragment coords/features, the
        # initial pocket COM and the origin-row map — therefore travels in
        # the scan carry and is gathered at prune events.
        def s_body(carry, s):
            (z, xh_p, lm, pm, fixed_c, l_x_c, l_h_c, com_p0_c,
             row_src) = carry
            k_s = jax.random.fold_in(run_key, s)
            def u_body(ucarry, u):
                z, xh_p = ucarry
                k1, k2, k3, k4 = jax.random.split(
                    jax.random.fold_in(k_s, u), 4)
                s_norm = s.astype(jnp.float32) / timesteps
                t_norm = (s.astype(jnp.float32) + 1.0) / timesteps
                gamma_s = core.schedule(jnp.broadcast_to(s_norm, (b,)))
                gamma_t = core.schedule(jnp.broadcast_to(t_norm, (b,)))

                z_unknown, xh_p, _, _ = core.sample_p_zs_given_zt(
                    k1, s_norm, t_norm, z, xh_p, lm, pm, eps_fn,
                    noise_scale=cfg.noise_scale)

                if spsa_enabled:
                    active = ((s >= icfg.spsa_low) & (s <= icfg.spsa_high)
                              & (u < 1))
                    zeta = cfg.spsa.zeta0 * s.astype(jnp.float32) / \
                        icfg.spsa_zeta_denom
                    # reference quirk: the SPSA update runs on the pre-step
                    # z_t and *replaces* the denoised unknown (:1579-1585);
                    # the inactive branch must KEEP the denoised z_unknown
                    z_unknown, xh_p = jax.lax.cond(
                        active,
                        lambda args: spsa_update(
                            k2, core, eps_fn, oracle, args[0], args[1],
                            lm, pm, t_norm, zeta, cfg.spsa),
                        lambda args: (args[2], args[1]),
                        (z, xh_p, z_unknown))

                z, xh_p = repaint_combine(
                    core, z_unknown, xh_p, lm, pm, fixed_c, l_x_c, l_h_c,
                    com_p0_c, gamma_s, gamma_t, k3, k4, u, resamplings)
                return (z, xh_p), None

            (z, xh_p), _ = jax.lax.scan(
                u_body, (z, xh_p),
                jnp.arange(resamplings, dtype=jnp.int32))

            if atp_enabled:
                k_atp = jax.random.fold_in(k_s, resamplings + 1)
                s_norm = s.astype(jnp.float32) / timesteps
                t_norm = (s.astype(jnp.float32) + 1.0) / timesteps
                active = (s <= icfg.atp_start_step) & \
                         (s % icfg.atp_every == 0)

                def do_atp(args):
                    z_, xh_, lm_, pm_, fx_, lx_, lh_, cp_, rs_ = args
                    z_, xh_, lm_, pm_, sel = atp_prune(
                        k_atp, core, eps_fn, oracle, z_, xh_, lm_, pm_,
                        s_norm, t_norm, s, cfg.atp,
                        noise_scale=cfg.noise_scale)
                    rs = sel % b
                    return (z_, xh_, lm_, pm_, fx_[rs], lx_[rs], lh_[rs],
                            cp_[rs], rs_[rs])

                (z, xh_p, lm, pm, fixed_c, l_x_c, l_h_c, com_p0_c,
                 row_src) = jax.lax.cond(
                    active, do_atp, lambda args: args,
                    (z, xh_p, lm, pm, fixed_c, l_x_c, l_h_c, com_p0_c,
                     row_src))
            return (z, xh_p, lm, pm, fixed_c, l_x_c, l_h_c, com_p0_c,
                    row_src), None

        steps = jnp.arange(timesteps - 1, -1, -1)
        (z_lig, xh_pocket, lig_mask, pocket_mask, fixed, l_x, l_h,
         com_pocket_0, row_src), _ = jax.lax.scan(
            s_body,
            (z_lig, xh_pocket, lig_mask, pocket_mask, fixed, l_x, l_h,
             com_pocket_0, jnp.arange(b)),
            steps)
        ml = lig_mask[..., None]
        mp = pocket_mask[..., None]

        k_dec = jax.random.fold_in(run_key, timesteps + 1)
        x_lig, h_lig, x_pocket, h_pocket = core.sample_p_xh_given_z0(
            k_dec, z_lig, xh_pocket, lig_mask, pocket_mask, eps_fn)

        # back to the original pocket frame (row_src maps replicated rows
        # to their origin pocket)
        com_after = masked_mean(x_pocket, pocket_mask, axis=1, keepdims=True)
        shift = masked_mean(pocket_x, pocket_mask0, axis=1,
                            keepdims=True)[row_src] - com_after
        x_lig = (x_lig + shift) * ml
        x_pocket = (x_pocket + shift) * mp
        return x_lig, h_lig, x_pocket, h_pocket, lig_mask, pocket_mask

    return jax.jit(run)


class InpaintSampler:
    """Wrapper mirroring ConditionalSampler for the inpainting task."""

    def __init__(self, core, dynamics_module, params, cfg: SampleConfig,
                 dataset_info, oracle=None):
        from diffndm_tpu.guidance.oracle import RewardOracle

        self.core = core
        self.module = dynamics_module
        self.params = params
        self.cfg = cfg
        self.dataset_info = dataset_info
        self.oracle = oracle or RewardOracle(dataset_info)
        self._cache = {}

    def _eps_builder(self, params):
        def fn(z_lig, xh_pocket, t, lig_mask, pocket_mask):
            return self.module.apply(params, z_lig, xh_pocket, t, lig_mask,
                                     pocket_mask)
        return fn

    def inpaint(self, key, ligand: NodeBatch, lig_fixed, pocket: NodeBatch,
                timesteps: Optional[int] = None, resamplings: int = 1,
                svdd: bool = False, spsa: Optional[bool] = None,
                center: str = "ligand") -> SampleResult:
        import os

        timesteps = timesteps or self.core.schedule.timesteps
        spsa = self.cfg.spsa.enabled if spsa is None else spsa
        if svdd or spsa:
            from diffndm_tpu.diffusion.host_guided import \
                supports_io_callback

            force_host = os.environ.get("DIFFNDM_HOST_GUIDANCE") == "1"
            if force_host or not supports_io_callback():
                # runtimes without host callbacks (axon tunnel) run the
                # host-orchestrated RePaint loop — identical keys/math
                from diffndm_tpu.diffusion.host_inpaint import \
                    HostGuidedInpainter

                if "host" not in self._cache:
                    self._cache["host"] = HostGuidedInpainter(
                        self.core, self.module, self.params, self.cfg,
                        self.dataset_info, self.oracle)
                host = self._cache["host"]
                host.params = self.params
                x_lig, h_lig, x_pocket, h_pocket, lm_out, pm_out = \
                    host.inpaint(key, ligand, lig_fixed, pocket,
                                 timesteps, resamplings, svdd=svdd,
                                 spsa=spsa, center=center)
                return SampleResult(
                    ligand=NodeBatch(x=x_lig, h=h_lig, mask=lm_out),
                    pocket=NodeBatch(x=x_pocket, h=h_pocket, mask=pm_out),
                    avg_log_prob=jnp.zeros(()), rl_traj=None)
        ck = (timesteps, resamplings, bool(svdd), bool(spsa), center,
              ligand.x.shape, pocket.x.shape)
        if ck not in self._cache:
            self._cache[ck] = build_inpaint_run(
                self.core, self._eps_builder, self.cfg, self.oracle,
                timesteps, resamplings, spsa, svdd, center)
        run = self._cache[ck]
        x_lig, h_lig, x_pocket, h_pocket, lm_out, pm_out = run(
            self.params, key, ligand.x, ligand.h, ligand.mask,
            jnp.asarray(lig_fixed, jnp.float32), pocket.x, pocket.h,
            pocket.mask)
        return SampleResult(
            ligand=NodeBatch(x=x_lig, h=h_lig, mask=lm_out),
            pocket=NodeBatch(x=x_pocket, h=h_pocket, mask=pm_out),
            avg_log_prob=jnp.zeros(()), rl_traj=None)
