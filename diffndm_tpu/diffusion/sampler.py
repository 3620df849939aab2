"""Pocket-conditional sampling.

The reference's ``sample_given_pocket`` (conditional_model.py:886-1489) is a
Python loop over 500-600 timesteps with per-step host sync, temp-file
OpenBabel round trips inside guidance, and mask-offset candidate surgery.
Here the whole reverse trajectory is ONE ``jax.lax.scan`` compiled by XLA:

- the per-step transition, the AdjustNet policy, ATP branch fan-out and
  SPSA probe fan-out are all in-graph; candidate populations are leading
  batch axes;
- chemistry rewards enter through batched ``io_callback``s (one per
  guidance event, not one per molecule);
- guidance cadences (s <= start, s % every == 0) are ``lax.cond``
  branches on the traced step index, so the scan compiles once.

RL (AdjustNet) support: when ``collect_rl`` the scan also stacks the
(z_t, eps_hat) pairs needed to rebuild the differentiable REINFORCE
surrogate after decoding (conditional_model.py:956-961, :1463-1485).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffndm_tpu.config import SampleConfig
from diffndm_tpu.diffusion.core import (CondDiffusion,
                                        init_ligand_from_pocket)
from diffndm_tpu.guidance.atp import atp_prune
from diffndm_tpu.guidance.oracle import RewardOracle
from diffndm_tpu.guidance.spsa import spsa_update
from diffndm_tpu.ops.segment import masked_mean, remove_mean_ligand
from diffndm_tpu.structs import NodeBatch


class SampleResult(NamedTuple):
    ligand: NodeBatch       # decoded ligand (original pocket frame)
    pocket: NodeBatch       # pocket (possibly COM-shifted back)
    avg_log_prob: jnp.ndarray
    rl_traj: Optional[tuple]  # (z_t stack, eps_hat stack) when collected


class ConditionalSampler:
    """Bundles diffusion core + denoiser params + guidance config."""

    def __init__(self, core: CondDiffusion, dynamics_module, params,
                 cfg: SampleConfig, dataset_info: dict,
                 oracle: Optional[RewardOracle] = None,
                 adjust_module=None, mesh=None):
        """mesh: optional jax.sharding.Mesh for data-parallel SAMPLING —
        the (pockets x samples) batch axis is sharded over the mesh's
        'data' axis, params are replicated, and XLA inserts whatever
        collectives the guidance top-k needs.  The batch size must be
        divisible by the data axis."""
        self.core = core
        self.module = dynamics_module
        self.params = params
        self.cfg = cfg
        self.dataset_info = dataset_info
        self.oracle = oracle or RewardOracle(dataset_info)
        self.adjust_module = adjust_module
        self.mesh = mesh
        # see RewardOracle.result_mesh: replicate io_callback rewards
        # under SPMD instead of leaving them {maximal device=0}
        self.oracle.result_mesh = mesh
        # optional host tap called every step with (s, z_lig, xh_pocket,
        # lig_mask) — the mid-trajectory molecule dump hook
        # (conditional_model.py:555-593 my_in_test)
        self.frame_tap = None
        self._run_cache = {}

    def set_frame_tap(self, fn) -> None:
        """fn(s:int, z_lig, xh_pocket, lig_mask) runs host-side each step
        (e.g. make_sdf_frame_tap); pass None to disable."""
        self.frame_tap = fn
        self._run_cache.clear()

    def eps_fn(self, params):
        def fn(z_lig, xh_pocket, t, lig_mask, pocket_mask):
            return self.module.apply(params, z_lig, xh_pocket, t, lig_mask,
                                     pocket_mask)
        return fn

    # -----------------------------------------------------------------
    def _build_run(self, timesteps: int, optimize: bool, collect_rl: bool):
        core, cfg, oracle = self.core, self.cfg, self.oracle

        def run(params, adjust_params, key, pocket_x, pocket_h, pocket_mask,
                lig_mask):
            pocket_mask0 = pocket_mask  # pre-selection masks for the frame
            eps_fn = self.eps_fn(params)
            adjust_fn = None
            if self.adjust_module is not None and optimize:
                adjust_fn = lambda z: self.adjust_module.apply(
                    adjust_params, z)

            # normalize pocket (norm_x first dim), cf. :914
            nx, nh = core.cfg.norm_values
            bh = core.cfg.norm_biases[1]
            p_x = pocket_x / nx
            p_h = (pocket_h - bh) / nh
            p_x = p_x * pocket_mask[..., None]
            p_h = p_h * pocket_mask[..., None]
            if core.simple:
                # simple variant pre-subtracts the pocket COM
                # (conditional_model.py:1846-1848)
                com = masked_mean(p_x, pocket_mask, axis=1, keepdims=True)
                p_x = (p_x - com) * pocket_mask[..., None]

            key, k_init = jax.random.split(key)
            z_lig, xh_pocket = init_ligand_from_pocket(
                k_init, core, p_x, p_h, lig_mask, pocket_mask)
            # RNG discipline: every step's keys derive from fold_in(key, s)
            # — position-based, not carry-based — so the host-orchestrated
            # sampler (host_guided.py) derives IDENTICAL keys and the two
            # modes are directly comparable under guidance.
            run_key = key

            b = lig_mask.shape[0]

            def step(carry, s):
                # ATP selection can replicate candidates across batch rows
                # (global top-B, reference conditional_model.py:1205), so the
                # per-row masks and the origin-row map travel in the carry.
                z, xh_p, lm, pm, row_src, lp_sum, count = carry
                k1, k2, k3, k4 = jax.random.split(
                    jax.random.fold_in(run_key, s), 4)
                s_norm = s.astype(jnp.float32) / timesteps
                t_norm = (s.astype(jnp.float32) + 1.0) / timesteps

                # pre-adjustment (z_t, eps_hat) feed the RL surrogate
                z_pre = z
                z, xh_p, lp, eps_pre = core.sample_p_zs_given_zt(
                    k1, s_norm, t_norm, z, xh_p, lm, pm,
                    eps_fn, adjust_fn=adjust_fn,
                    noise_scale=cfg.noise_scale)
                lp_sum = lp_sum + lp
                count = count + 1.0

                if cfg.atp.enabled:
                    active = (s <= cfg.atp.start_step) & \
                             (s % cfg.atp.every == 0)

                    def do_atp(args):
                        z_, xh_, lm_, pm_, rs_ = args
                        z_, xh_, lm_, pm_, sel = atp_prune(
                            k2, core, eps_fn, oracle, z_, xh_, lm_, pm_,
                            s_norm, t_norm, s, cfg.atp,
                            adjust_fn=adjust_fn,
                            noise_scale=cfg.noise_scale)
                        return z_, xh_, lm_, pm_, rs_[sel % b]

                    z, xh_p, lm, pm, row_src = jax.lax.cond(
                        active, do_atp, lambda args: args,
                        (z, xh_p, lm, pm, row_src))

                if cfg.spsa.enabled:
                    active = (s <= cfg.spsa.start_step) & \
                             (s % cfg.spsa.every == 0)
                    zeta = cfg.spsa.zeta0 * s.astype(jnp.float32) / \
                        cfg.spsa.zeta_denom
                    z, xh_p = jax.lax.cond(
                        active,
                        lambda args: spsa_update(
                            k3, core, eps_fn, oracle, args[0], args[1],
                            lm, pm, t_norm, zeta, cfg.spsa),
                        lambda args: args,
                        (z, xh_p))
                    if cfg.spsa.hybrid_prune:
                        # one-off hybrid branch ensemble + prune at
                        # s == start_step (conditional_model.py:1261-1418)
                        from diffndm_tpu.guidance.atp import \
                            hybrid_spsa_prune

                        def do_hybrid(args):
                            z_, xh_, lm_, pm_, rs_ = args
                            z_, xh_, lm_, pm_, sel = hybrid_spsa_prune(
                                k4, core, eps_fn, oracle, z_, xh_, lm_,
                                pm_, s_norm, t_norm, s, cfg.atp, cfg.spsa,
                                zeta, adjust_fn=adjust_fn,
                                noise_scale=cfg.noise_scale)
                            return z_, xh_, lm_, pm_, rs_[sel % b]

                        # reference nests the hybrid inside the SPSA-active
                        # window (conditional_model.py:1243,1261)
                        z, xh_p, lm, pm, row_src = jax.lax.cond(
                            active & (s == cfg.spsa.start_step), do_hybrid,
                            lambda args: args, (z, xh_p, lm, pm, row_src))

                if self.frame_tap is not None:
                    jax.debug.callback(self.frame_tap, s, z, xh_p,
                                       lm, ordered=True)

                ys = (z_pre, eps_pre) if collect_rl else None
                return (z, xh_p, lm, pm, row_src, lp_sum, count), ys

            steps = jnp.arange(timesteps - 1, -1, -1)
            row_src0 = jnp.arange(b)
            (z_lig, xh_pocket, lig_mask, pocket_mask, row_src, lp_sum,
             count), traj = jax.lax.scan(
                step, (z_lig, xh_pocket, lig_mask, pocket_mask, row_src0,
                       jnp.zeros(()), jnp.zeros(())),
                steps)

            k_dec = jax.random.fold_in(run_key, timesteps + 1)
            x_lig, h_lig, x_pocket, h_pocket = core.sample_p_xh_given_z0(
                k_dec, z_lig, xh_pocket, lig_mask, pocket_mask, eps_fn)

            # CoG drift projection (:1432-1438): re-centering on the ligand
            # COM is the identity when drift is already ~0
            x_lig, x_pocket = remove_mean_ligand(x_lig, x_pocket, lig_mask,
                                                 pocket_mask)

            # shift back to the original pocket frame
            # (lightning_modules.py:906-911 / handle_to_mol:845-862);
            # row_src maps each (possibly ATP-replicated) output row to the
            # input row whose pocket it carries
            com_before = masked_mean(pocket_x, pocket_mask0, axis=1,
                                     keepdims=True)[row_src]
            com_after = masked_mean(x_pocket, pocket_mask, axis=1,
                                    keepdims=True)
            shift = com_before - com_after
            x_lig = (x_lig + shift) * lig_mask[..., None]
            x_pocket = (x_pocket + shift) * pocket_mask[..., None]

            avg_lp = lp_sum / jnp.maximum(count, 1.0)
            return (x_lig, h_lig, x_pocket, h_pocket, avg_lp, traj,
                    lig_mask, pocket_mask)

        return jax.jit(run)

    # -----------------------------------------------------------------
    def sample_given_pocket(self, key, pocket: NodeBatch,
                            num_nodes_lig: np.ndarray,
                            timesteps: Optional[int] = None,
                            adjust_params=None, optimize: bool = False,
                            collect_rl: bool = False) -> SampleResult:
        """Generate ligands for a (padded, batched) pocket.

        num_nodes_lig: [B] node counts.  The ligand padding bucket is the
        max count rounded up to ``cfg.lig_pad_multiple``.

        On runtimes without host-callback support (e.g. the axon PJRT
        tunnel) guided sampling automatically switches to the
        host-orchestrated loop in diffusion/host_guided.py.
        """
        import os

        from diffndm_tpu.diffusion.host_guided import (HostGuidedSampler,
                                                       supports_io_callback)

        timesteps = timesteps or self.core.schedule.timesteps
        b = pocket.x.shape[0]
        n_max = int(np.asarray(num_nodes_lig).max())
        nl = -(-n_max // self.cfg.lig_pad_multiple) * \
            self.cfg.lig_pad_multiple
        lig_mask = (np.arange(nl)[None, :]
                    < np.asarray(num_nodes_lig)[:, None]).astype(np.float32)
        lig_mask = jnp.asarray(lig_mask)

        needs_callbacks = (self.cfg.atp.enabled or self.cfg.spsa.enabled
                           or self.frame_tap is not None)
        force_host = os.environ.get("DIFFNDM_HOST_GUIDANCE") == "1"
        if needs_callbacks and not collect_rl and \
                (force_host or not supports_io_callback()):
            if "host" not in self._run_cache:
                self._run_cache["host"] = HostGuidedSampler(
                    self.core, self.module, self.params, self.cfg,
                    self.dataset_info, self.oracle,
                    adjust_module=self.adjust_module)
            host = self._run_cache["host"]
            host.params = self.params
            x_lig, h_lig, x_pocket, h_pocket, avg_lp, lm_out, pm_out = \
                host.sample(key, pocket, lig_mask, timesteps,
                            adjust_params=adjust_params, optimize=optimize)
            return SampleResult(
                ligand=NodeBatch(x=x_lig, h=h_lig, mask=lm_out),
                pocket=NodeBatch(x=x_pocket, h=h_pocket, mask=pm_out),
                avg_log_prob=avg_lp, rl_traj=None)

        cache_key = (timesteps, optimize, collect_rl, nl,
                     pocket.x.shape[1], b)
        if cache_key not in self._run_cache:
            self._run_cache[cache_key] = self._build_run(
                timesteps, optimize, collect_rl)
        run = self._run_cache[cache_key]

        params = self.params
        if self.mesh is not None:
            # data-parallel sampling: batch sharded, params replicated
            from diffndm_tpu.parallel.mesh import replicate, shard_batch

            params = replicate(self.mesh, params)
            pocket = shard_batch(self.mesh, pocket)
            lig_mask = shard_batch(self.mesh, lig_mask)

        (x_lig, h_lig, x_pocket, h_pocket, avg_lp, traj, lig_mask_out,
         pocket_mask_out) = run(
            params, adjust_params, key, pocket.x, pocket.h,
            pocket.mask, lig_mask)
        return SampleResult(
            ligand=NodeBatch(x=x_lig, h=h_lig, mask=lig_mask_out),
            pocket=NodeBatch(x=x_pocket, h=h_pocket, mask=pocket_mask_out),
            avg_log_prob=avg_lp,
            rl_traj=traj if collect_rl else None)

    # -----------------------------------------------------------------
    def rl_update(self, adjust_state, result: SampleResult,
                  pocket: NodeBatch):
        """REINFORCE update of the AdjustNet after a generation
        (conditional_model.py:1447-1485)."""
        cfg = self.cfg.rl
        reward = self.oracle.rl_reward_host(
            np.asarray(result.ligand.x), np.asarray(result.ligand.h),
            np.asarray(result.ligand.mask), cfg)

        z_stack, eps_stack = result.rl_traj
        lig_mask = result.ligand.mask

        def loss_fn(params):
            adj = adjust_state.module.apply(params, z_stack)
            ml = lig_mask[None, ..., None]
            lp = -0.5 * jnp.mean(((adj - eps_stack) * ml) ** 2)
            return reward * lp * cfg.reward_scale

        loss, grads = jax.value_and_grad(loss_fn)(adjust_state.params)
        updates, adjust_state.opt_state = adjust_state.tx.update(
            grads, adjust_state.opt_state, adjust_state.params)
        adjust_state.params = jax.tree.map(
            lambda p, u: p + u, adjust_state.params, updates)
        grad_norm = float(optax_global_norm(grads))
        return float(loss), grad_norm, reward


def optax_global_norm(tree) -> jnp.ndarray:
    import optax

    return optax.global_norm(tree)


def make_sdf_frame_tap(out_dir: str, dataset_info: dict, core,
                       every: int = 100):
    """Host tap writing intermediate molecules to
    <out_dir>/try_<s>.sdf every ``every`` steps (reference my_in_test,
    conditional_model.py:555-593)."""
    import os

    import numpy as np

    from diffndm_tpu.chem.bonds import build_molecules_batch
    from diffndm_tpu.chem.io import write_sdf

    os.makedirs(out_dir, exist_ok=True)
    nx = core.cfg.norm_values[0]

    def tap(s, z_lig, xh_pocket, lig_mask):
        s = int(s)
        if s % every != 0:
            return
        coords = np.asarray(z_lig)[..., :3] * nx
        types = np.asarray(z_lig)[..., 3:]
        mask = np.asarray(lig_mask)
        mols = build_molecules_batch(coords, types.argmax(-1), mask,
                                     dataset_info)
        write_sdf(os.path.join(out_dir, f"try_{s}.sdf"), mols)

    return tap
