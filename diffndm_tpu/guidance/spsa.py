"""SPSA zero-order guidance.

Replaces the reference's sequential k=10 probe loop with per-molecule
Python indexing (conditional_model.py:760-813) by a fully batched design:
each probe evaluates the +zeta and -zeta branches in ONE fused EGNN forward
of batch 2B, probes run under ``lax.map`` (sequential, memory-bounded), and
each probe issues a single batched reward callback of 2B molecules instead
of 2B OpenBabel temp-file round trips.

Faithfulness notes:
- perturbations are zero-mean per molecule over real atoms
  (my_perturbation_for_molecule, :724-736);
- the gradient estimate is (f+ - f-) / (2*zeta_grad) * perturbation with
  ``zeta_grad`` hard-coded to 1e-4 in the reference regardless of the
  perturbation scale (:799) — kept as ``zeta_grad_denom``;
- the coordinate update is gradient ascent with ``guidance_scale`` followed
  by ligand-COM re-centering (:804-813).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from diffndm_tpu.config import SPSAConfig
from diffndm_tpu.diffusion.core import CondDiffusion
from diffndm_tpu.guidance.oracle import RewardOracle
from diffndm_tpu.ops.segment import masked_mean, remove_mean_ligand

ZETA_GRAD_DENOM = 1e-4  # conditional_model.py:799


def spsa_update(key, core: CondDiffusion, eps_fn, oracle: RewardOracle,
                z_lig, xh_pocket, lig_mask, pocket_mask, t_norm, zeta,
                cfg: SPSAConfig):
    """One SPSA guidance update of the ligand coordinates.

    z_lig: [B, NL, 3+F] (normalized latent); returns updated
    (z_lig, xh_pocket).
    """
    n_dims = core.n_dims
    b = z_lig.shape[0]
    ml = lig_mask[..., None]
    nx, _nh = core.cfg.norm_values

    def probe_pert(probe_key):
        noise = jax.random.normal(probe_key, z_lig[..., :n_dims].shape)
        noise = noise * ml
        noise = noise - masked_mean(noise, lig_mask, axis=1, keepdims=True)
        noise = noise * ml
        return zeta * noise  # [B, NL, 3]

    keys = jax.random.split(key, cfg.num_probes)
    if cfg.fuse_probes:
        # all k probes in ONE k*2B forward + ONE reward callback
        k = cfg.num_probes
        perts = jax.vmap(probe_pert)(keys)            # [k, B, NL, 3]
        x = z_lig[..., :n_dims]
        feats = z_lig[..., n_dims:]
        z_pm = jnp.concatenate([x[None] + perts, x[None] - perts],
                               axis=1)                # [k, 2B, NL, 3]
        feats2 = jnp.broadcast_to(
            jnp.concatenate([feats, feats], 0)[None],
            (k, 2 * b) + feats.shape[1:])
        z_pm = jnp.concatenate([z_pm, feats2], -1)
        flat = z_pm.reshape((k * 2 * b,) + z_pm.shape[2:])
        xh_pk = jnp.tile(xh_pocket, (2 * k, 1, 1))
        lmk = jnp.tile(lig_mask, (2 * k, 1))
        pmk = jnp.tile(pocket_mask, (2 * k, 1))
        tk = jnp.broadcast_to(t_norm, (2 * k * b,))
        z0 = core.to_x0(flat, xh_pk, tk, lmk, pmk, eps_fn)
        rewards = oracle.spsa_rewards(z0[..., :n_dims] * nx,
                                      z0[..., n_dims:], lmk, cfg)
        r = rewards.reshape(k, 2, b)
        dd = (r[:, 0] - r[:, 1]) / (2.0 * ZETA_GRAD_DENOM)  # [k, B]
        grads = dd[:, :, None, None] * perts
    else:
        def one_probe(probe_key):
            pert = probe_pert(probe_key)

            # stack +/- into one batch of 2B, one x0 lookahead
            def shift(sign):
                x = z_lig[..., :n_dims] + sign * pert
                return jnp.concatenate([x, z_lig[..., n_dims:]], -1)

            z_pm = jnp.concatenate([shift(+1.0), shift(-1.0)], axis=0)
            xh_p2 = jnp.tile(xh_pocket, (2, 1, 1))
            lm2 = jnp.tile(lig_mask, (2, 1))
            pm2 = jnp.tile(pocket_mask, (2, 1))
            t2 = jnp.broadcast_to(t_norm, (b,))
            t2 = jnp.concatenate([t2, t2], axis=0)
            z0 = core.to_x0(z_pm, xh_p2, t2, lm2, pm2, eps_fn)

            rewards = oracle.spsa_rewards(z0[..., :n_dims] * nx,
                                          z0[..., n_dims:], lm2, cfg)
            f_plus, f_minus = rewards[:b], rewards[b:]
            dd = (f_plus - f_minus) / (2.0 * ZETA_GRAD_DENOM)
            return dd[:, None, None] * pert  # [B, NL, 3]

        grads = jax.lax.map(one_probe, keys)  # [k, B, NL, 3]
    avg_grad = jnp.mean(grads, axis=0)

    new_x = z_lig[..., :n_dims] + cfg.guidance_scale * avg_grad
    new_x, px = remove_mean_ligand(new_x, xh_pocket[..., :n_dims],
                                   lig_mask, pocket_mask)
    z_out = jnp.concatenate([new_x, z_lig[..., n_dims:]], -1) * ml
    xh_pocket = jnp.concatenate([px, xh_pocket[..., n_dims:]], -1)
    return z_out, xh_pocket
