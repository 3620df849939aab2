"""Training losses for the conditional (and joint) DDPM.

Re-implements the reference loss stack as pure functions over padded
batches: ConditionalDDPM.forward (conditional_model.py:238-367) for the
diffusion terms and LigandPocketDDPM.forward (lightning_modules.py:268-351)
for the L2/VLB assembly, the Lennard-Jones auxiliary term
(lightning_modules.py:353-380) and its weight schedule (:964-976).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffndm_tpu.config import TrainConfig
from diffndm_tpu.diffusion import schedules as S
from diffndm_tpu.diffusion.core import CondDiffusion, _b11
from diffndm_tpu.ops.segment import (masked_mean, remove_mean_joint,
                                     remove_mean_ligand, sum_except_batch)
from diffndm_tpu.structs import NodeBatch


def conditional_loss_terms(key, core: CondDiffusion, eps_fn,
                           ligand: NodeBatch, pocket: NodeBatch,
                           training: bool) -> Dict[str, jnp.ndarray]:
    """All NLL terms for a batch (conditional_model.py:238-367)."""
    k_t, k_noise, k_noise0 = jax.random.split(key, 3)
    b = ligand.x.shape[0]
    T = core.schedule.timesteps
    lm, pm = ligand.mask, pocket.mask
    lig_size = ligand.size

    # normalize
    xh0_lig = core.normalize_xh(ligand.xh, lm)
    xh0_pocket = core.normalize_xh(pocket.xh, pm)

    delta_log_px = -core.subspace_dimensionality(lig_size) * \
        jnp.log(jnp.asarray(core.cfg.norm_values[0]))

    lowest_t = 0 if training else 1
    t_int = jax.random.randint(k_t, (b,), lowest_t, T + 1).astype(
        jnp.float32)
    s_int = t_int - 1
    t_is_zero = (t_int == 0).astype(jnp.float32)
    gamma_s = core.schedule(s_int / T)
    gamma_t = core.schedule(t_int / T)

    if core.simple:
        # simple variant: subtract the pocket COM from both parts
        # (conditional_model.py:1832-1837)
        com = masked_mean(xh0_pocket[..., :3], pm, axis=1, keepdims=True)
        lx = (xh0_lig[..., :3] - com) * lm[..., None]
        px = (xh0_pocket[..., :3] - com) * pm[..., None]
    else:
        # centre on ligand COM
        lx, px = remove_mean_ligand(xh0_lig[..., :3], xh0_pocket[..., :3],
                                    lm, pm)
    xh0_lig = jnp.concatenate([lx, xh0_lig[..., 3:]], -1)
    xh0_pocket = jnp.concatenate([px, xh0_pocket[..., 3:]], -1)

    z_t_lig, xh_pocket, eps_lig = core.noised_representation(
        k_noise, xh0_lig, xh0_pocket, lm, pm, gamma_t)

    net_lig, _ = eps_fn(z_t_lig, xh_pocket, t_int / T, lm, pm)

    xh_lig_hat = core.xh_given_zt_and_epsilon(z_t_lig, net_lig, gamma_t)

    sq = (eps_lig - net_lig) ** 2
    if core.cfg.virtual_node_idx is not None:
        vn = xh0_lig[..., 3 + core.cfg.virtual_node_idx]
        sq = sq.at[..., :3].multiply((1.0 - vn)[..., None])
    error_t_lig = sum_except_batch(sq, lm)

    snr_weight = 1.0 - S.snr(gamma_s - gamma_t)
    neg_log_constants = -core.log_constants_p_x_given_z0(lig_size)
    kl_prior = core.kl_prior(xh0_lig, lm, lig_size)

    if training:
        log_p_x, log_p_h = core.log_pxh_given_z0_without_constants(
            xh0_lig[..., 3:], z_t_lig, eps_lig, net_lig, lm, gamma_t)
        loss_0_x = -log_p_x * t_is_zero
        loss_0_h = -log_p_h * t_is_zero
        error_t_lig = error_t_lig * (1.0 - t_is_zero)
    else:
        gamma_0 = core.schedule(jnp.zeros((b,)))
        z_0_lig, xh_pocket0, eps_0 = core.noised_representation(
            k_noise0, xh0_lig, xh0_pocket, lm, pm, gamma_0)
        net_0, _ = eps_fn(z_0_lig, xh_pocket0, jnp.zeros((b,)), lm, pm)
        log_p_x, log_p_h = core.log_pxh_given_z0_without_constants(
            xh0_lig[..., 3:], z_0_lig, eps_0, net_0, lm, gamma_0)
        loss_0_x = -log_p_x
        loss_0_h = -log_p_h

    return {
        "delta_log_px": delta_log_px,
        "error_t_lig": error_t_lig,
        "snr_weight": snr_weight,
        "loss_0_x": loss_0_x,
        "loss_0_h": loss_0_h,
        "neg_log_constants": neg_log_constants,
        "kl_prior": kl_prior,
        "t_int": t_int,
        "xh_lig_hat": xh_lig_hat,
    }


def joint_loss_terms(key, core, eps_fn, ligand: NodeBatch,
                     pocket: NodeBatch, training: bool
                     ) -> Dict[str, jnp.ndarray]:
    """Joint-model NLL terms (en_diffusion.py:339-472): both parts noised
    in the joint zero-COM subspace, pocket error included, joint KL prior.
    ``core`` is a diffusion.joint.JointDiffusion."""
    from diffndm_tpu.diffusion.joint import JointDiffusion  # noqa: F401

    k_t, k_noise, k_noise0 = jax.random.split(key, 3)
    b = ligand.x.shape[0]
    T = core.schedule.timesteps
    lm, pm = ligand.mask, pocket.mask
    joint_size = ligand.size + pocket.size

    xh0_lig = core.normalize_xh(ligand.xh, lm, core.atom_nf)
    xh0_poc = core.normalize_xh(pocket.xh, pm, core.residue_nf)
    lx, px = remove_mean_joint(xh0_lig[..., :3], xh0_poc[..., :3], lm, pm)
    xh0_lig = jnp.concatenate([lx, xh0_lig[..., 3:]], -1)
    xh0_poc = jnp.concatenate([px, xh0_poc[..., 3:]], -1)

    subspace = (joint_size - 1) * 3.0
    delta_log_px = -subspace * jnp.log(jnp.asarray(core.cfg.norm_values[0]))

    lowest_t = 0 if training else 1
    t_int = jax.random.randint(k_t, (b,), lowest_t, T + 1).astype(
        jnp.float32)
    t_is_zero = (t_int == 0).astype(jnp.float32)
    gamma_s = core.schedule((t_int - 1) / T)
    gamma_t = core.schedule(t_int / T)

    z_l, z_p, eps_l, eps_p = core.noised_representation(
        k_noise, xh0_lig, xh0_poc, lm, pm, gamma_t)
    net_l, net_p = eps_fn(z_l, z_p, t_int / T, lm, pm)

    error_t_lig = sum_except_batch((eps_l - net_l) ** 2, lm)
    error_t_pocket = sum_except_batch((eps_p - net_p) ** 2, pm)
    snr_weight = 1.0 - S.snr(gamma_s - gamma_t)

    gamma_0s = core.schedule(jnp.zeros(()))
    neg_log_constants = -subspace * (-0.5 * gamma_0s
                                     - 0.5 * jnp.log(2 * jnp.pi))

    # joint KL prior (en_diffusion.py:110-156)
    gamma_T = core.schedule(jnp.ones((b,)))
    alpha_T = _b11(S.alpha(gamma_T))
    sigma_T = S.sigma(gamma_T)
    mu_l, mu_p = alpha_T * xh0_lig, alpha_T * xh0_poc
    mu_h2 = sum_except_batch(mu_l[..., 3:] ** 2, lm) + \
        sum_except_batch(mu_p[..., 3:] ** 2, pm)
    mu_x2 = sum_except_batch(mu_l[..., :3] ** 2, lm) + \
        sum_except_batch(mu_p[..., :3] ** 2, pm)

    def gkl(mu2, q_sigma, d):
        return (d * jnp.log(1.0 / q_sigma)
                + 0.5 * (d * q_sigma ** 2 + mu2) - 0.5 * d)

    kl_prior = gkl(mu_h2, sigma_T, 1.0) + gkl(mu_x2, sigma_T, subspace)

    if training:
        loss_0_x = -(-0.5 * sum_except_batch(
            (eps_l[..., :3] - net_l[..., :3]) ** 2, lm)) * t_is_zero
        loss_0_x_p = -(-0.5 * sum_except_batch(
            (eps_p[..., :3] - net_p[..., :3]) ** 2, pm)) * t_is_zero
        error_t_lig = error_t_lig * (1.0 - t_is_zero)
        error_t_pocket = error_t_pocket * (1.0 - t_is_zero)
    else:
        gamma_0 = core.schedule(jnp.zeros((b,)))
        z0_l, z0_p, e0_l, e0_p = core.noised_representation(
            k_noise0, xh0_lig, xh0_poc, lm, pm, gamma_0)
        n0_l, n0_p = eps_fn(z0_l, z0_p, jnp.zeros((b,)), lm, pm)
        loss_0_x = 0.5 * sum_except_batch(
            (e0_l[..., :3] - n0_l[..., :3]) ** 2, lm)
        loss_0_x_p = 0.5 * sum_except_batch(
            (e0_p[..., :3] - n0_p[..., :3]) ** 2, pm)

    return {
        "delta_log_px": delta_log_px,
        "error_t_lig": error_t_lig,
        "error_t_pocket": error_t_pocket,
        "snr_weight": snr_weight,
        "loss_0_x": loss_0_x,
        "loss_0_x_pocket": loss_0_x_p,
        "loss_0_h": jnp.zeros((b,)),
        "neg_log_constants": neg_log_constants,
        "kl_prior": kl_prior,
        "t_int": t_int,
    }


def lj_potential(x, h_onehot, mask, lj_rm: jnp.ndarray, norm_x: float,
                 clamp: float = 3.0) -> jnp.ndarray:
    """Intra-ligand Lennard-Jones auxiliary potential
    (lightning_modules.py:353-380); [B]."""
    pair = mask[:, :, None] * mask[:, None, :]
    eye = jnp.eye(x.shape[1])[None]
    pair = pair * (1.0 - eye)
    d = jnp.sqrt(jnp.sum(
        (x[:, :, None, :] - x[:, None, :, :]) ** 2, -1) + 1e-12)
    types = jnp.argmax(h_onehot, axis=-1)
    rm = lj_rm[types[:, :, None], types[:, None, :]] / 100.0 / norm_x
    sigma = 2.0 ** (-1.0 / 6.0) * rm
    # cap the ratio so ratio**12 stays finite in fp32 — an inf forward value
    # poisons the backward pass even under the clamp below
    ratio = jnp.minimum(sigma / jnp.maximum(d, 1e-3), 100.0)
    out = 4.0 * (ratio ** 12 - ratio ** 6)
    out = jnp.minimum(out, clamp)
    return jnp.sum(out * pair, axis=(1, 2))


def aux_weight_schedule(T: int, max_weight: float, mode: str = "linear"
                        ) -> jnp.ndarray:
    """(lightning_modules.py:964-976)"""
    if mode == "linear":
        return jnp.linspace(max_weight, 0.0, T + 1)
    if mode == "constant":
        return jnp.full((T + 1,), max_weight)
    raise NotImplementedError(mode)


def assemble_loss(terms: Dict, core: CondDiffusion, ligand: NodeBatch,
                  pocket: NodeBatch, cfg: TrainConfig, training: bool,
                  lj_rm=None) -> Tuple[jnp.ndarray, Dict]:
    """L2 / VLB loss assembly (lightning_modules.py:286-333); returns
    (nll [B], info)."""
    loss_type = core.cfg.loss_type
    lig_size = ligand.size
    info = {}
    if loss_type == "l2" and training:
        denom_lig = 3.0 * lig_size + core.atom_nf * lig_size
        error_t = terms["error_t_lig"] / denom_lig
        loss_t = 0.5 * error_t
        loss_0 = terms["loss_0_x"] / (3.0 * lig_size) + terms["loss_0_h"]
        nll = loss_t + loss_0 + terms["kl_prior"]
    else:
        loss_t = -core.schedule.timesteps * 0.5 * terms["snr_weight"] * \
            terms["error_t_lig"]
        loss_0 = terms["loss_0_x"] + terms["loss_0_h"] + \
            terms["neg_log_constants"]
        nll = loss_t + loss_0 + terms["kl_prior"]
        nll = nll - terms["delta_log_px"]

    if cfg.auxiliary_loss and loss_type == "l2" and training \
            and lj_rm is not None:
        sched = aux_weight_schedule(core.schedule.timesteps,
                                    cfg.aux_max_weight, cfg.aux_schedule)
        w = sched[terms["t_int"].astype(jnp.int32)]
        xh_hat = terms["xh_lig_hat"]
        lj = lj_potential(xh_hat[..., :3], xh_hat[..., 3:], ligand.mask,
                          lj_rm, core.cfg.norm_values[0], cfg.aux_clamp_lj)
        nll = nll + w * lj
        info["weighted_lj"] = jnp.mean(w * lj)

    info["error_t_lig"] = jnp.mean(terms["error_t_lig"])
    info["loss_0"] = jnp.mean(loss_0)
    info["kl_prior"] = jnp.mean(terms["kl_prior"])
    return nll, info
