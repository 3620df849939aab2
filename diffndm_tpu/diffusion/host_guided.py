"""Host-orchestrated guided sampling.

The fused sampler (diffusion/sampler.py) evaluates chemistry rewards
through ``io_callback`` inside one jitted scan — the design for standard
TPU/CPU runtimes.  Some TPU attachment runtimes (e.g. the axon PJRT
tunnel used here) do not support host callbacks at all; this module
provides the same semantics with the loop split at guidance events:

- one jitted scan covers the head of the trajectory (no guidance there);
- inside the guidance window, jitted single-step / candidate / update
  functions run on device while reward scoring happens between dispatches
  on the host (same RewardOracle, numpy path);
- device<->host traffic is one decode per guidance event — identical to
  what io_callback would transfer.

Use ``supports_io_callback()`` to pick the mode; ConditionalSampler does
this automatically.
"""

from __future__ import annotations

import os
import time
from collections import defaultdict
from contextlib import contextmanager
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffndm_tpu.config import SampleConfig
from diffndm_tpu.diffusion.core import (CondDiffusion,
                                        init_ligand_from_pocket)
from diffndm_tpu.ops.segment import masked_mean, remove_mean_ligand
from diffndm_tpu.structs import NodeBatch


_IO_CALLBACK_OK: Optional[bool] = None


def supports_io_callback() -> bool:
    """Probe whether the runtime supports host callbacks (some PJRT
    attachments, e.g. the axon tunnel, reject them while still reporting
    platform 'tpu'). Result is cached per process."""
    global _IO_CALLBACK_OK
    if _IO_CALLBACK_OK is not None:
        return _IO_CALLBACK_OK
    import os

    if os.environ.get("PALLAS_AXON_POOL_IPS") and \
            jax.default_backend() != "cpu":
        # axon runtime: callbacks unimplemented; skip the probe (the env
        # var alone is not enough — tests re-pin the platform to cpu)
        _IO_CALLBACK_OK = False
        return False
    try:
        from jax.experimental import io_callback

        def f(x):
            return io_callback(lambda v: np.asarray(v) + 1.0,
                               jax.ShapeDtypeStruct((), jnp.float32), x)

        out = jax.jit(f)(jnp.float32(1.0))
        jax.block_until_ready(out)
        _IO_CALLBACK_OK = True
    except Exception:
        _IO_CALLBACK_OK = False
    return _IO_CALLBACK_OK


class _PhaseProfiler:
    """Per-phase wall-clock accounting for the host-guided loop, enabled
    with DIFFNDM_GUIDED_PROFILE=1.  In profile mode each phase blocks on
    its device values so dispatch/fetch/score costs attribute correctly
    (this serialises the pipeline — use only for diagnosis)."""

    def __init__(self, enabled: bool):
        self.enabled = enabled
        self.total = defaultdict(float)
        self.count = defaultdict(int)

    @contextmanager
    def phase(self, name: str, *block_on):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            for v in block_on:
                jax.block_until_ready(v)
            self.total[name] += time.perf_counter() - t0
            self.count[name] += 1

    def block(self, *vals):
        if self.enabled:
            jax.block_until_ready(vals)

    def report(self) -> str:
        lines = ["guided-phase profile (s, calls):"]
        for k in sorted(self.total, key=self.total.get, reverse=True):
            lines.append("  %-16s %8.3f  x%d" % (k, self.total[k],
                                                 self.count[k]))
        lines.append("  %-16s %8.3f" % ("TOTAL",
                                        sum(self.total.values())))
        return "\n".join(lines)


class HostGuidedSampler:
    """Mirrors ConditionalSampler.sample_given_pocket for runtimes
    without host-callback support."""

    def __init__(self, core: CondDiffusion, module, params,
                 cfg: SampleConfig, dataset_info, oracle,
                 adjust_module=None):
        self.core = core
        self.module = module
        self.params = params
        self.cfg = cfg
        self.oracle = oracle
        self.adjust_module = adjust_module
        self._jit_cache = {}
        self.prof = _PhaseProfiler(
            os.environ.get("DIFFNDM_GUIDED_PROFILE") == "1")

    # -- jitted building blocks ----------------------------------------
    def _eps_fn(self, params):
        def fn(z, xh_p, t, lm, pm):
            return self.module.apply(params, z, xh_p, t, lm, pm)
        return fn

    def _fanout_eps_fn(self, params):
        """eps_fn for the guidance fan-out forwards (SPSA k*2B probe
        batches, ATP/hybrid candidate rollouts).  When
        SampleConfig.fanout_row_tile is set, the big batches run with
        their own row tile (params are row-tile-independent — the tile
        only shapes the banded gather/compute schedule).

        Banded mode: the sorted-band window is centred per row *tile*
        (egnn.py win_start), so per-row guaranteed coverage is
        (band_window - row_tile)/2 — a larger tile alone would shrink
        it.  The window is therefore widened by the tile delta, which
        preserves the guaranteed half-width exactly: any window that
        was provably lossless for the trajectory's (W, tile) stays
        provably lossless for the fan-out's (W + dt, tile + dt)."""
        rt = self.cfg.fanout_row_tile
        base_rt = getattr(self.module.cfg, "row_tile", None)
        if not rt or base_rt == rt:
            return self._eps_fn(params)
        import dataclasses as _dc
        cfg2 = _dc.replace(self.module.cfg, row_tile=rt)
        if cfg2.band_window is not None and rt > base_rt:
            cfg2 = _dc.replace(
                cfg2, band_window=cfg2.band_window + (rt - base_rt))
        mod = type(self.module)(cfg2,
                                atom_nf=self.module.atom_nf,
                                residue_nf=self.module.residue_nf,
                                n_dims=self.module.n_dims)

        def fn(z, xh_p, t, lm, pm):
            return mod.apply(params, z, xh_p, t, lm, pm)
        return fn

    def _get(self, name, builder):
        if name not in self._jit_cache:
            self._jit_cache[name] = builder()
        return self._jit_cache[name]

    def _normalize_pocket(self):
        core = self.core

        def fn(params, key, pocket_x, pocket_h, pocket_mask, lig_mask):
            nx, nh = core.cfg.norm_values
            bh = core.cfg.norm_biases[1]
            p_x = pocket_x / nx * pocket_mask[..., None]
            p_h = (pocket_h - bh) / nh * pocket_mask[..., None]
            if core.simple:
                com = masked_mean(p_x, pocket_mask, axis=1, keepdims=True)
                p_x = (p_x - com) * pocket_mask[..., None]
            z, xh_p = init_ligand_from_pocket(key, core, p_x, p_h,
                                              lig_mask, pocket_mask)
            return z, xh_p

        return jax.jit(fn)

    def _segment(self, timesteps: int, optimize: bool):
        core = self.core

        def fn(params, adjust_params, run_key, z, xh_p, lig_mask,
               pocket_mask, steps, lp_sum):
            eps_fn = self._eps_fn(params)
            adjust_fn = None
            if self.adjust_module is not None and optimize:
                adjust_fn = lambda zz: self.adjust_module.apply(
                    adjust_params, zz)

            def step(carry, s):
                z, xh_p, lp = carry
                # identical derivation to the fused scan (sampler.py): the
                # transition key is split slot 0 of fold_in(run_key, s)
                k1 = jax.random.split(
                    jax.random.fold_in(run_key, s), 4)[0]
                s_norm = s.astype(jnp.float32) / timesteps
                t_norm = (s.astype(jnp.float32) + 1.0) / timesteps
                z, xh_p, lpa, _ = core.sample_p_zs_given_zt(
                    k1, s_norm, t_norm, z, xh_p, lig_mask, pocket_mask,
                    eps_fn, adjust_fn=adjust_fn,
                    noise_scale=self.cfg.noise_scale)
                return (z, xh_p, lp + lpa), None

            (z, xh_p, lp_sum), _ = jax.lax.scan(
                step, (z, xh_p, lp_sum), steps)
            return z, xh_p, lp_sum

        return jax.jit(fn)

    @staticmethod
    def _compact(z, n_dims=3):
        """Split latents into the compact scoring view the host needs:
        (coords f32, argmax types int8).  4x fewer device->host bytes
        than fetching full latents; rewards are bitwise identical (the
        host's first scoring step is this argmax anyway)."""
        return (z[..., :n_dims],
                jnp.argmax(z[..., n_dims:], axis=-1).astype(jnp.int8))

    def _atp_candidates(self, timesteps: int, g_extra: int):
        core = self.core

        def fn(params, key, z, xh_p, lig_mask, pocket_mask, s):
            eps_fn = self._fanout_eps_fn(params)
            s_norm = s.astype(jnp.float32) / timesteps
            t_norm = (s.astype(jnp.float32) + 1.0) / timesteps
            # identical key derivation to atp_prune (guidance/atp.py)
            k_branch, _ = jax.random.split(key)

            def branch(bk):
                z_b, xh_b, _, _ = core.sample_p_zs_given_zt(
                    bk, s_norm, t_norm, z, xh_p, lig_mask, pocket_mask,
                    eps_fn, noise_scale=self.cfg.noise_scale)
                return z_b, xh_b

            zb, xhb = jax.lax.map(branch,
                                  jax.random.split(k_branch, g_extra))
            z_groups = jnp.concatenate([z[None], zb], axis=0)
            xh_groups = jnp.concatenate([xh_p[None], xhb], axis=0)

            def lookahead(zg):
                zz, xx = zg
                return core.to_x0(zz, xx, t_norm, lig_mask, pocket_mask,
                                  eps_fn)

            z0_groups = jax.lax.map(lookahead, (z_groups, xh_groups))
            # z0 is only ever host-scored: ship the compact view; stack
            # the z view alongside so one fetch covers both rewards
            zx, zt = self._compact(z_groups)
            z0x, z0t = self._compact(z0_groups)
            score_x = jnp.stack([zx, z0x])
            score_t = jnp.stack([zt, z0t])
            return z_groups, xh_groups, score_x, score_t

        return jax.jit(fn)

    def _hybrid_branches(self, timesteps: int, g_extra: int):
        """Branch transitions for the hybrid event with hybrid_spsa_prune's
        exact key derivation: bks = split(split(key)[0], g_extra), branch i
        uses split(bks[i])[0] for the transition (slot [1] goes to that
        branch's SPSA update, performed by the caller)."""
        core = self.core

        def fn(params, key, z, xh_p, lig_mask, pocket_mask, s):
            eps_fn = self._fanout_eps_fn(params)
            s_norm = s.astype(jnp.float32) / timesteps
            t_norm = (s.astype(jnp.float32) + 1.0) / timesteps
            k_branch, _ = jax.random.split(key)
            bks = jax.random.split(k_branch, g_extra)

            def branch(bk):
                k1, k2 = jax.random.split(bk)
                z_b, xh_b, _, _ = core.sample_p_zs_given_zt(
                    k1, s_norm, t_norm, z, xh_p, lig_mask, pocket_mask,
                    eps_fn, noise_scale=self.cfg.noise_scale)
                return z_b, xh_b, k2

            zb, xhb, k2s = jax.lax.map(branch, bks)
            return zb, xhb, k2s

        return jax.jit(fn)

    def _atp_select(self):
        core = self.core
        atp_cfg = self.cfg.atp

        def fn(z_groups, xh_groups, rewards, lig_mask, pocket_mask):
            from diffndm_tpu.guidance.atp import (gather_selected,
                                                  select_candidates)

            g, b = z_groups.shape[0], z_groups.shape[1]
            flat = lambda a: a.reshape((g * b,) + a.shape[2:])
            sel_idx = select_candidates(rewards, atp_cfg, b)
            z_new, xh_new, lm_new, pm_new = gather_selected(
                sel_idx, flat(z_groups), flat(xh_groups), lig_mask,
                pocket_mask, core)
            return z_new, xh_new, lm_new, pm_new, sel_idx

        return jax.jit(fn)

    def _lookahead_groups(self, timesteps: int):
        """x0 projection of a [G, B, ...] candidate stack (one jitted
        dispatch), for the hybrid event's mixed reward.  Returns compact
        scoring views of BOTH the z stack and its x0 lookahead — the
        host only ever scores them."""
        core = self.core

        def fn(params, z_groups, xh_groups, lig_mask, pocket_mask, s):
            eps_fn = self._fanout_eps_fn(params)
            t_norm = (s.astype(jnp.float32) + 1.0) / timesteps

            def one(zg):
                zz, xx = zg
                return core.to_x0(zz, xx, t_norm, lig_mask, pocket_mask,
                                  eps_fn)

            z0_groups = jax.lax.map(one, (z_groups, xh_groups))
            zx, zt = self._compact(z_groups)
            z0x, z0t = self._compact(z0_groups)
            return jnp.stack([zx, z0x]), jnp.stack([zt, z0t])

        return jax.jit(fn)

    def _spsa_probe(self, timesteps: int, num_probes: int):
        """All k probes in ONE dispatch (lax.map inside): a single
        device<->host round trip per SPSA event instead of k.

        The fused [k, +B|-B] layout mirrors guidance/spsa.py's fused
        path; the pairing contract (rewards[:, :b] - rewards[:, b:])
        is cross-pinned by test_host_matches_fused_with_guidance,
        which runs both implementations with fuse_probes on and
        asserts equal samples."""
        core = self.core
        n_dims = core.n_dims

        fuse = self.cfg.spsa.fuse_probes

        def fn(params, key, z, xh_p, lig_mask, pocket_mask, s, zeta):
            eps_fn = self._fanout_eps_fn(params)
            t_norm = (s.astype(jnp.float32) + 1.0) / timesteps
            b = z.shape[0]
            ml = lig_mask[..., None]
            keys = jax.random.split(key, num_probes)

            def probe_pert(pk):
                noise = jax.random.normal(pk, z[..., :n_dims].shape) * ml
                noise = noise - masked_mean(noise, lig_mask, axis=1,
                                            keepdims=True)
                return zeta * noise * ml

            if fuse:
                # one k*2B forward (SPSAConfig.fuse_probes); output
                # shapes stay [k, ...] so the host consumer is unchanged
                k = num_probes
                perts = jax.vmap(probe_pert)(keys)    # [k, B, NL, 3]
                x = z[..., :n_dims]
                feats = z[..., n_dims:]
                z_pm = jnp.concatenate(
                    [x[None] + perts, x[None] - perts], axis=1)
                feats2 = jnp.broadcast_to(
                    jnp.concatenate([feats, feats], 0)[None],
                    (k, 2 * b) + feats.shape[1:])
                z_pm = jnp.concatenate([z_pm, feats2], -1)
                flat = z_pm.reshape((k * 2 * b,) + z_pm.shape[2:])
                xhk = jnp.tile(xh_p, (2 * k, 1, 1))
                lmk = jnp.tile(lig_mask, (2 * k, 1))
                pmk = jnp.tile(pocket_mask, (2 * k, 1))
                tk = jnp.broadcast_to(t_norm, (2 * k * b,))
                z0 = core.to_x0(flat, xhk, tk, lmk, pmk, eps_fn)
                z0x, z0t = self._compact(
                    z0.reshape((k, 2 * b) + z0.shape[1:]), n_dims)
                return perts, z0x, z0t

            xh2 = jnp.tile(xh_p, (2, 1, 1))
            lm2 = jnp.tile(lig_mask, (2, 1))
            pm2 = jnp.tile(pocket_mask, (2, 1))
            t2 = jnp.concatenate([jnp.broadcast_to(t_norm, (b,))] * 2)

            def one(pk):
                pert = probe_pert(pk)

                def shift(sign):
                    return jnp.concatenate(
                        [z[..., :n_dims] + sign * pert, z[..., n_dims:]],
                        -1)

                z_pm = jnp.concatenate([shift(1.0), shift(-1.0)], axis=0)
                z0 = core.to_x0(z_pm, xh2, t2, lm2, pm2, eps_fn)
                return pert, self._compact(z0, n_dims)

            perts, (z0x, z0t) = jax.lax.map(one, keys)
            # [k, B, NL, 3], [k, 2B, NL, 3] f32, [k, 2B, NL] int8
            return perts, z0x, z0t

        return jax.jit(fn)

    def _spsa_apply(self):
        core = self.core
        n_dims = core.n_dims

        def fn(z, xh_p, avg_grad, lig_mask, pocket_mask, scale):
            new_x = z[..., :n_dims] + scale * avg_grad
            zx, px = remove_mean_ligand(new_x, xh_p[..., :n_dims],
                                        lig_mask, pocket_mask)
            z = jnp.concatenate([zx, z[..., n_dims:]], -1) * \
                lig_mask[..., None]
            xh_p = jnp.concatenate([px, xh_p[..., n_dims:]], -1)
            return z, xh_p

        return jax.jit(fn)

    def _decode(self, timesteps: int):
        core = self.core

        def fn(params, key, z, xh_p, lig_mask, pocket_mask, com_before):
            """com_before: [B, 1, 3] original pocket COM per (origin) row."""
            eps_fn = self._eps_fn(params)
            x_lig, h_lig, x_pocket, h_pocket = core.sample_p_xh_given_z0(
                key, z, xh_p, lig_mask, pocket_mask, eps_fn)
            x_lig, x_pocket = remove_mean_ligand(x_lig, x_pocket, lig_mask,
                                                 pocket_mask)
            com_after = masked_mean(x_pocket, pocket_mask, axis=1,
                                    keepdims=True)
            shift = com_before - com_after
            x_lig = (x_lig + shift) * lig_mask[..., None]
            x_pocket = (x_pocket + shift) * pocket_mask[..., None]
            return x_lig, h_lig, x_pocket, h_pocket

        return jax.jit(fn)

    # -- host reward helpers -------------------------------------------
    def _svdd_rewards_xt(self, x_flat, t_flat, lig_mask_flat):
        nx = self.core.cfg.norm_values[0]
        c = self.cfg.atp
        w = (c.w_qed, c.w_sa, c.w_lipinski, c.logp_k, c.logp_lo, c.logp_hi,
             getattr(c, "w_vina", 0.0), getattr(c, "w_connectivity", 0.0))
        return self.oracle.score_batch_types(
            np.asarray(x_flat) * nx, np.asarray(t_flat),
            np.asarray(lig_mask_flat), w)

    def _spsa_rewards_xt(self, x_flat, t_flat, lig_mask_flat):
        nx = self.core.cfg.norm_values[0]
        c = self.cfg.spsa
        w = (c.w_qed, c.w_sa, c.w_lipinski, 0.0, 0.0, 0.0,
             getattr(c, "w_vina", 0.0), getattr(c, "w_connectivity", 0.0))
        return self.oracle.score_batch_types(
            np.asarray(x_flat) * nx, np.asarray(t_flat),
            np.asarray(lig_mask_flat), w)

    def _mixed_reward(self, r_x0, r_z, s):
        c = self.cfg.atp
        if c.compat_precedence:
            w_z = c.mix_denom - s / c.mix_denom
        else:
            w_z = (c.mix_denom - s) / c.mix_denom
        return r_x0 * (s / c.mix_denom) + r_z * w_z

    # -- SPSA event -----------------------------------------------------
    def _run_spsa_event(self, params, key, z, xh_p, lig_mask, pocket_mask,
                        s, zeta, timesteps):
        from diffndm_tpu.guidance.spsa import ZETA_GRAD_DENOM

        cfg = self.cfg.spsa
        probe = self._get(("spsa_probe", timesteps, cfg.num_probes),
                          partial(self._spsa_probe, timesteps,
                                  cfg.num_probes))
        apply_fn = self._get("spsa_apply", self._spsa_apply)
        b = z.shape[0]
        k = cfg.num_probes
        with self.prof.phase("spsa.probe") as _:
            perts, z0x, z0t = probe(params, key, z, xh_p, lig_mask,
                                    pocket_mask, jnp.asarray(s),
                                    jnp.asarray(zeta))
            self.prof.block(z0t)
        # one host scoring pass over all k*2B decodes (compact views)
        with self.prof.phase("spsa.fetch"):
            x_np, t_np = np.asarray(z0x), np.asarray(z0t)
            lm_np = np.asarray(lig_mask)
        x_flat = x_np.reshape((k * 2 * b,) + x_np.shape[2:])
        t_flat = t_np.reshape((k * 2 * b,) + t_np.shape[2:])
        lm_flat = np.tile(lm_np, (k * 2, 1))
        with self.prof.phase("spsa.score"):
            rewards = self._spsa_rewards_xt(x_flat, t_flat,
                                            lm_flat).reshape(k, 2 * b)
        dd = (rewards[:, :b] - rewards[:, b:]) / (2.0 * ZETA_GRAD_DENOM)
        with self.prof.phase("spsa.apply") as _:
            avg = jnp.mean(jnp.asarray(dd)[:, :, None, None] * perts,
                           axis=0)
            out = apply_fn(z, xh_p, avg, lig_mask, pocket_mask,
                           jnp.asarray(cfg.guidance_scale))
            self.prof.block(out)
        return out

    # -- ATP event ------------------------------------------------------
    def _run_atp_event(self, params, key, z, xh_p, lig_mask, pocket_mask,
                       s, timesteps):
        cfg = self.cfg.atp
        cand = self._get(("atp_cand", timesteps, cfg.num_groups - 1),
                         partial(self._atp_candidates, timesteps,
                                 cfg.num_groups - 1))
        select = self._get("atp_select", self._atp_select)
        with self.prof.phase("atp.cand"):
            z_groups, xh_groups, score_x, score_t = cand(
                params, key, z, xh_p, lig_mask, pocket_mask,
                jnp.asarray(s))
            self.prof.block(score_t)
        g, b = z_groups.shape[0], z_groups.shape[1]
        with self.prof.phase("atp.fetch"):
            sx, st = np.asarray(score_x), np.asarray(score_t)
            lm_np = np.asarray(lig_mask)
        lm_f = np.tile(lm_np, (g, 1))
        flat = lambda a: a.reshape((g * b,) + a.shape[2:])
        with self.prof.phase("atp.score"):
            r_z = self._svdd_rewards_xt(flat(sx[0]), flat(st[0]), lm_f)
            r_x0 = self._svdd_rewards_xt(flat(sx[1]), flat(st[1]), lm_f)
        mixed = jnp.asarray(self._mixed_reward(r_x0, r_z, float(s)))
        with self.prof.phase("atp.select"):
            out = select(z_groups, xh_groups, mixed, lig_mask, pocket_mask)
            self.prof.block(out)
        return out

    # -- hybrid SPSA event at s == start_step ---------------------------
    def _run_hybrid_event(self, params, key, z, xh_p, lig_mask,
                          pocket_mask, s, zeta, timesteps):
        cfg_a, cfg_s = self.cfg.atp, self.cfg.spsa
        g_extra = cfg_a.num_groups - 1
        branches = self._get(("hybrid_branch", timesteps, g_extra),
                             partial(self._hybrid_branches, timesteps,
                                     g_extra))
        with self.prof.phase("hyb.branch"):
            zb, xhb, k2s = branches(params, key, z, xh_p, lig_mask,
                                    pocket_mask, jnp.asarray(s))
            self.prof.block(zb)
        zs, xhs = [z], [xh_p]
        for i in range(g_extra):
            # multi-scale quirk: extra branches i >= 2 use zeta0
            # (hybrid_spsa_prune / conditional_model.py:1285-1286)
            bzeta = cfg_s.zeta0 if i >= 2 else zeta
            z_i, xh_i = self._run_spsa_event(
                params, k2s[i], zb[i], xhb[i], lig_mask,
                pocket_mask, s, bzeta, timesteps)
            zs.append(z_i)
            xhs.append(xh_i)
        z_groups = jnp.stack(zs)
        xh_groups = jnp.stack(xhs)
        # score and select exactly like the fused hybrid_spsa_prune: real
        # x0 lookahead of the SPSA'd ensemble for the first mixed-reward
        # term, z decode for the second
        look = self._get(("hybrid_look", timesteps),
                         partial(self._lookahead_groups, timesteps))
        with self.prof.phase("hyb.look"):
            score_x, score_t = look(params, z_groups, xh_groups, lig_mask,
                                    pocket_mask, jnp.asarray(s))
            self.prof.block(score_t)
        g, b = z_groups.shape[0], z_groups.shape[1]
        with self.prof.phase("hyb.fetch"):
            sx, st = np.asarray(score_x), np.asarray(score_t)
            lm_np = np.asarray(lig_mask)
        lm_f = np.tile(lm_np, (g, 1))
        flat = lambda a: a.reshape((g * b,) + a.shape[2:])
        with self.prof.phase("hyb.score"):
            r_z = self._svdd_rewards_xt(flat(sx[0]), flat(st[0]), lm_f)
            r_x0 = self._svdd_rewards_xt(flat(sx[1]), flat(st[1]), lm_f)
        mixed = jnp.asarray(self._mixed_reward(r_x0, r_z, float(s)))
        select = self._get("atp_select", self._atp_select)
        with self.prof.phase("hyb.select"):
            out = select(z_groups, xh_groups, mixed, lig_mask, pocket_mask)
            self.prof.block(out)
        return out

    # -- main loop ------------------------------------------------------
    def sample(self, key, pocket: NodeBatch, lig_mask: jnp.ndarray,
               timesteps: int, adjust_params=None, optimize: bool = False):
        cfg = self.cfg
        params = self.params
        key, k_init = jax.random.split(key)
        init = self._get("init", self._normalize_pocket)
        z, xh_p = init(params, k_init, pocket.x, pocket.h, pocket.mask,
                       lig_mask)
        # ATP selection may replicate rows (global top-B); carry masks and
        # the origin-row map alongside the state
        lm, pm = lig_mask, pocket.mask
        row_src = np.arange(lig_mask.shape[0])

        seg = self._get(("seg", timesteps, optimize),
                        partial(self._segment, timesteps, optimize))
        lp_sum = jnp.zeros(())

        guided_lo = 0
        guided_hi = -1
        if cfg.atp.enabled:
            guided_hi = max(guided_hi, cfg.atp.start_step)
        if cfg.spsa.enabled:
            guided_hi = max(guided_hi, cfg.spsa.start_step)

        def is_atp(s):
            return (cfg.atp.enabled and s <= cfg.atp.start_step
                    and s % cfg.atp.every == 0)

        def is_spsa(s):
            return (cfg.spsa.enabled and s <= cfg.spsa.start_step
                    and s % cfg.spsa.every == 0)

        # run contiguous non-event steps as single scan segments; only a
        # handful of distinct segment lengths exist, so compiles stay few
        events = [s for s in range(min(guided_hi, timesteps - 1), -1, -1)
                  if is_atp(s) or is_spsa(s)]
        run_key = key  # same role as the fused sampler's run_key

        def step_keys(s):
            return jax.random.split(jax.random.fold_in(run_key, s), 4)

        pos = timesteps - 1
        for se in events + [None]:
            lo = se if se is not None else 0
            if pos >= lo:
                steps = jnp.arange(pos, lo - 1, -1)
                with self.prof.phase("segment"):
                    z, xh_p, lp_sum = seg(params, adjust_params, run_key,
                                          z, xh_p, lm, pm, steps, lp_sum)
                    self.prof.block(z)
                pos = lo - 1
            if se is None:
                break
            s = se
            if is_atp(s):
                k_atp = step_keys(s)[1]
                z, xh_p, lm, pm, sel = self._run_atp_event(
                    params, k_atp, z, xh_p, lm, pm, s, timesteps)
                row_src = row_src[np.asarray(sel) % len(row_src)]
            if is_spsa(s):
                k_spsa = step_keys(s)[2]
                zeta = cfg.spsa.zeta0 * s / cfg.spsa.zeta_denom
                z, xh_p = self._run_spsa_event(params, k_spsa, z, xh_p,
                                               lm, pm, s, zeta, timesteps)
                if cfg.spsa.hybrid_prune and s == cfg.spsa.start_step:
                    k_h = step_keys(s)[3]
                    z, xh_p, lm, pm, sel = self._run_hybrid_event(
                        params, k_h, z, xh_p, lm, pm, s, zeta, timesteps)
                    row_src = row_src[np.asarray(sel) % len(row_src)]

        k_dec = jax.random.fold_in(run_key, timesteps + 1)
        decode = self._get(("decode", timesteps),
                           partial(self._decode, timesteps))
        com_before = masked_mean(pocket.x, pocket.mask, axis=1,
                                 keepdims=True)[row_src]
        with self.prof.phase("decode"):
            x_lig, h_lig, x_pocket, h_pocket = decode(
                params, k_dec, z, xh_p, lm, pm, com_before)
            self.prof.block(x_lig)
        if self.prof.enabled:
            print(self.prof.report(), flush=True)
        avg_lp = lp_sum / max(timesteps, 1)
        return x_lig, h_lig, x_pocket, h_pocket, avg_lp, lm, pm
