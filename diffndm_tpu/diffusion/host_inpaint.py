"""Host-orchestrated guided RePaint inpainting.

Counterpart of HostGuidedSampler (host_guided.py) for the inpainting loop:
on runtimes without host-callback support (axon PJRT tunnel) the fused
``build_inpaint_run`` cannot evaluate chemistry rewards in-graph, so this
module splits the loop at guidance events:

- contiguous no-event timesteps run as one jitted scan (identical math to
  build_inpaint_run's s_body);
- inside the SPSA window each (s, u) iteration splits into a jitted
  denoise, the host-scored SPSA update (HostGuidedSampler machinery), and
  a jitted known/unknown combine;
- ATP events reuse HostGuidedSampler._run_atp_event, with the fragment
  state (lig_fixed, clean coords/features, pocket COM) gathered host-side
  by the selection indices.

Because every key derives from fold_in(run_key, s)/fold_in(k_s, u) — the
same position-based scheme as build_inpaint_run — this loop produces
bitwise-comparable trajectories to the fused path under identical oracles
(see tests/test_host_inpaint.py).

Reference semantics: conditional_model.py:1491-1791 (loop), :1573-1586
(SPSA hook), :1629-1778 (ATP hook).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from diffndm_tpu.diffusion.host_guided import HostGuidedSampler
from diffndm_tpu.diffusion.inpaint import repaint_combine
from diffndm_tpu.ops.segment import masked_mean
from diffndm_tpu.structs import NodeBatch


def _fixed_mean(x, fixed):
    fsum = jnp.maximum(jnp.sum(fixed, axis=1, keepdims=True), 1e-9)
    return jnp.sum(x * fixed, axis=1, keepdims=True) / fsum


class HostGuidedInpainter(HostGuidedSampler):
    """Adds the RePaint-specific jitted building blocks to the host-guided
    machinery; cfg.inpaint holds the guidance cadences."""

    # -- jitted pieces --------------------------------------------------
    def _prep(self, center: str):
        core = self.core
        n_dims = core.n_dims

        def fn(params, key, lig_x, lig_h, lig_mask, lig_fixed, pocket_x,
               pocket_h, pocket_mask):
            nx, nh = core.cfg.norm_values
            bh = core.cfg.norm_biases[1]
            ml = lig_mask[..., None]
            mp = pocket_mask[..., None]
            fixed = (lig_fixed * lig_mask)[..., None]
            l_x = lig_x / nx * ml
            l_h = (lig_h - bh) / nh * ml
            p_x = pocket_x / nx * mp
            p_h = (pocket_h - bh) / nh * mp
            xh0_pocket = jnp.concatenate([p_x, p_h], -1)
            com_pocket_0 = masked_mean(p_x, pocket_mask, axis=1,
                                       keepdims=True)
            if center == "ligand":
                mean_known = _fixed_mean(l_x, fixed)
            else:  # 'pocket' (:1531-1534)
                mean_known = com_pocket_0
            b, nl = lig_mask.shape
            mu = jnp.concatenate(
                [jnp.broadcast_to(mean_known, (b, nl, n_dims)),
                 jnp.zeros((b, nl, core.atom_nf))], -1) * ml
            key, k0 = jax.random.split(key)
            z, xh_p = core.sample_normal_zero_com(
                k0, mu, xh0_pocket, jnp.ones((b,)), lig_mask, pocket_mask)
            return z, xh_p, fixed, l_x, l_h, com_pocket_0, key

        return jax.jit(fn)

    def _denoise_one(self, timesteps: int):
        """The k1 transition of one (s, u) iteration."""
        core = self.core

        def fn(params, run_key, z, xh_p, lm, pm, s, u):
            eps_fn = self._eps_fn(params)
            k1 = jax.random.split(jax.random.fold_in(
                jax.random.fold_in(run_key, s), u), 4)[0]
            s_norm = s.astype(jnp.float32) / timesteps
            t_norm = (s.astype(jnp.float32) + 1.0) / timesteps
            z_unknown, xh_p, _, _ = core.sample_p_zs_given_zt(
                k1, s_norm, t_norm, z, xh_p, lm, pm, eps_fn,
                noise_scale=self.cfg.noise_scale)
            return z_unknown, xh_p

        return jax.jit(fn)

    def _combine_one(self, timesteps: int, resamplings: int):
        """Known-part renoise + COM align + mask combine + inter-iteration
        renoise (build_inpaint_run u_body after the SPSA hook)."""
        core = self.core

        def fn(params, run_key, z_unknown, xh_p, lm, pm, fixed, l_x, l_h,
               com_p0, s, u):
            b = lm.shape[0]
            ks = jax.random.split(jax.random.fold_in(
                jax.random.fold_in(run_key, s), u), 4)
            s_norm = s.astype(jnp.float32) / timesteps
            t_norm = (s.astype(jnp.float32) + 1.0) / timesteps
            gamma_s = core.schedule(jnp.broadcast_to(s_norm, (b,)))
            gamma_t = core.schedule(jnp.broadcast_to(t_norm, (b,)))
            return repaint_combine(core, z_unknown, xh_p, lm, pm, fixed,
                                   l_x, l_h, com_p0, gamma_s, gamma_t,
                                   ks[2], ks[3], u, resamplings)

        return jax.jit(fn)

    def _segment_s(self, timesteps: int, resamplings: int):
        """Full s iterations (all u, NO guidance) for a contiguous step
        range, as one jitted scan — identical to build_inpaint_run's
        s_body minus the hooks."""
        core = self.core

        def fn(params, run_key, z, xh_p, lm, pm, fixed, l_x, l_h, com_p0,
               steps):
            eps_fn = self._eps_fn(params)
            b = lm.shape[0]

            def s_body(carry, s):
                z, xh_p = carry
                k_s = jax.random.fold_in(run_key, s)
                s_norm = s.astype(jnp.float32) / timesteps
                t_norm = (s.astype(jnp.float32) + 1.0) / timesteps
                gamma_s = core.schedule(jnp.broadcast_to(s_norm, (b,)))
                gamma_t = core.schedule(jnp.broadcast_to(t_norm, (b,)))

                def u_body(ucarry, u):
                    z, xh_p = ucarry
                    k1, k2, k3, k4 = jax.random.split(
                        jax.random.fold_in(k_s, u), 4)
                    z_unknown, xh_p2, _, _ = core.sample_p_zs_given_zt(
                        k1, s_norm, t_norm, z, xh_p, lm, pm, eps_fn,
                        noise_scale=self.cfg.noise_scale)
                    z, xh_p2 = repaint_combine(
                        core, z_unknown, xh_p2, lm, pm, fixed, l_x, l_h,
                        com_p0, gamma_s, gamma_t, k3, k4, u, resamplings)
                    return (z, xh_p2), None

                (z, xh_p), _ = jax.lax.scan(
                    u_body, (z, xh_p),
                    jnp.arange(resamplings, dtype=jnp.int32))
                return (z, xh_p), None

            (z, xh_p), _ = jax.lax.scan(s_body, (z, xh_p), steps)
            return z, xh_p

        return jax.jit(fn)

    # -- main loop ------------------------------------------------------
    def inpaint(self, key, ligand: NodeBatch, lig_fixed,
                pocket: NodeBatch, timesteps: int, resamplings: int = 1,
                svdd: bool = False, spsa: bool = False,
                center: str = "ligand"):
        cfg = self.cfg
        icfg = cfg.inpaint
        params = self.params

        prep = self._get(("inp_prep", center), partial(self._prep, center))
        z, xh_p, fixed, l_x, l_h, com_p0, key = prep(
            params, key, ligand.x, ligand.h, ligand.mask,
            jnp.asarray(lig_fixed, jnp.float32), pocket.x, pocket.h,
            pocket.mask)
        run_key = key
        lm, pm = ligand.mask, pocket.mask
        row_src = np.arange(lm.shape[0])

        seg = self._get(("inp_seg", timesteps, resamplings),
                        partial(self._segment_s, timesteps, resamplings))
        den = self._get(("inp_den", timesteps),
                        partial(self._denoise_one, timesteps))
        comb = self._get(("inp_comb", timesteps, resamplings),
                         partial(self._combine_one, timesteps, resamplings))

        def spsa_at(s):
            return spsa and icfg.spsa_low <= s <= icfg.spsa_high

        def atp_at(s):
            return (svdd and s <= icfg.atp_start_step
                    and s % icfg.atp_every == 0)

        events = [s for s in range(timesteps - 1, -1, -1)
                  if spsa_at(s) or atp_at(s)]
        pos = timesteps - 1
        for se in events + [None]:
            lo = se if se is not None else 0
            hi_end = lo if se is not None else -1
            if pos > hi_end:
                steps = jnp.arange(pos, hi_end, -1)
                z, xh_p = seg(params, run_key, z, xh_p, lm, pm, fixed,
                              l_x, l_h, com_p0, steps)
                pos = hi_end
            if se is None:
                break
            s = se
            if spsa_at(s):
                # granular (s, u) iterations with the SPSA hook at u == 0
                # (active for u < 1, conditional_model.py:1575)
                for u in range(resamplings):
                    s_j, u_j = jnp.asarray(s), jnp.asarray(u)
                    z_unknown, xh_p = den(params, run_key, z, xh_p, lm,
                                          pm, s_j, u_j)
                    if u < 1:
                        k2 = jax.random.split(jax.random.fold_in(
                            jax.random.fold_in(run_key, s_j), u_j), 4)[1]
                        zeta = cfg.spsa.zeta0 * s / icfg.spsa_zeta_denom
                        # the SPSA update runs on the PRE-step z and
                        # replaces the denoised unknown (:1579-1585);
                        # _run_spsa_event takes the externally-derived
                        # (s, u)-slot key
                        z_unknown, xh_p = self._run_spsa_event(
                            params, k2, z, xh_p, lm, pm, s, zeta,
                            timesteps)
                    z, xh_p = comb(params, run_key, z_unknown, xh_p, lm,
                                   pm, fixed, l_x, l_h, com_p0, s_j, u_j)
            else:
                # ATP-only step: the whole u-loop is unguided
                z, xh_p = seg(params, run_key, z, xh_p, lm, pm, fixed,
                              l_x, l_h, com_p0, jnp.asarray([s]))
            pos = s - 1
            if atp_at(s):
                k_atp = jax.random.fold_in(
                    jax.random.fold_in(run_key, s), resamplings + 1)
                z, xh_p, lm, pm, sel = self._run_atp_event(
                    params, k_atp, z, xh_p, lm, pm, s, timesteps)
                rs = np.asarray(sel) % len(row_src)
                fixed, l_x, l_h, com_p0 = (fixed[rs], l_x[rs], l_h[rs],
                                           com_p0[rs])
                row_src = row_src[rs]

        k_dec = jax.random.fold_in(run_key, timesteps + 1)
        decode = self._get(("decode", timesteps),
                           partial(self._decode, timesteps))
        com_before = masked_mean(pocket.x, pocket.mask, axis=1,
                                 keepdims=True)[row_src]
        x_lig, h_lig, x_pocket, h_pocket = decode(
            params, k_dec, z, xh_p, lm, pm, com_before)
        return x_lig, h_lig, x_pocket, h_pocket, lm, pm
