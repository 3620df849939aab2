"""ATP — adaptive trajectory pruning (SVDD-style candidate selection).

Replaces the reference's mask-offset candidate bookkeeping
(conditional_model.py:1085-1241): candidate branches live on a leading
group axis ``[G, B, ...]``, selection is one ``lax.top_k`` over the G*B
mixed rewards followed by a static gather — no node-list rebuilds.

Per reference semantics at a prune step s (after the s-step update):
- groups = {current z_s} + (G-1) branches obtained by applying the same
  (s, t) transition to z_s again with fresh noise (:1109-1129);
- each group is also rolled to x0 by one-step lookahead (:1095, :1118);
- both decodes are scored with the SVDD reward (:1179-1201);
- mixed reward r = r_x0 * (s/250) + r_z * (250 - s/250) — the second
  factor reproduces the reference's operator-precedence quirk (:1203);
  ``compat_precedence=False`` uses (250 - s)/250;
- top-B candidates (by mixed reward) replace the population, then ligand
  COM is re-subtracted (:1205-1241).  The reference additionally leaves h
  multiplied by norm_values[1] after each prune (an unnormalize without
  re-normalize, :1235-1240); we do not reproduce that scaling bug.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diffndm_tpu.config import ATPConfig
from diffndm_tpu.diffusion.core import CondDiffusion
from diffndm_tpu.guidance.oracle import RewardOracle
from diffndm_tpu.ops.segment import remove_mean_ligand


def select_candidates(mixed, cfg: ATPConfig, b: int):
    """Candidate selection indices from mixed rewards [G*B].

    Returns sel_idx [B] (flat indices into G*B, ordered G-major like
    ``arr.reshape(G*B, ...)``).  Three scopes:

    - default: the reference's single global top-B over all G*B
      candidates (conditional_model.py:1205) — only sound when every row
      shares the same pocket;
    - cfg.group_size=n: rows form contiguous groups of n sharing a pocket
      (multi-pocket batches, pockets*samples layout); top-n is taken over
      each group's G*n candidates — the reference's population selection
      applied per pocket;
    - cfg.per_sample=True: argmax over G independently per row (each
      sample keeps its own identity; heterogeneous fragment batches).
    """
    g = mixed.shape[0] // b
    if cfg.per_sample:
        g_star = jnp.argmax(mixed.reshape(g, b), axis=0)  # [B]
        return g_star * b + jnp.arange(b)
    if cfg.group_size is not None and cfg.group_size < b:
        gs = cfg.group_size
        n_groups = b // gs
        m = mixed.reshape(g, n_groups, gs)
        m = jnp.transpose(m, (1, 0, 2)).reshape(n_groups, g * gs)
        _, idx = jax.lax.top_k(m, gs)  # [n_groups, gs] into g*gs
        g_i, j = idx // gs, idx % gs
        flat = g_i * b + jnp.arange(n_groups)[:, None] * gs + j
        return flat.reshape(b)
    _, sel_idx = jax.lax.top_k(mixed, b)
    return sel_idx


def gather_selected(sel_idx, z_flat, xh_flat, lig_mask, pocket_mask,
                    core: CondDiffusion):
    """Gather the selected candidates AND their per-row state.

    The reference rebuilds lig_mask per selected candidate
    (conditional_model.py:1209-1232); in the padded layout that is a gather
    of the origin row's masks — a selected candidate with flat index i came
    from batch row i % B, so it must carry THAT row's ligand/pocket masks,
    not the destination row's.  Returns
    (z_new, xh_new, lig_mask_new, pocket_mask_new) with ligand COM
    re-subtracted under the gathered masks (:1234-1241).
    """
    b = lig_mask.shape[0]
    n_dims = core.n_dims
    row_src = sel_idx % b
    z_new = z_flat[sel_idx]
    xh_new = xh_flat[sel_idx]
    lm_new = lig_mask[row_src]
    pm_new = pocket_mask[row_src]
    zx, px = remove_mean_ligand(z_new[..., :n_dims], xh_new[..., :n_dims],
                                lm_new, pm_new)
    z_new = jnp.concatenate([zx, z_new[..., n_dims:]], -1) * \
        lm_new[..., None]
    xh_new = jnp.concatenate([px, xh_new[..., n_dims:]], -1)
    return z_new, xh_new, lm_new, pm_new


def hybrid_spsa_prune(key, core: CondDiffusion, eps_fn, oracle,
                      z_lig, xh_pocket, lig_mask, pocket_mask, s_norm,
                      t_norm, s_step, atp_cfg, spsa_cfg, zeta,
                      adjust_fn=None, noise_scale: float = 1.0):
    """The reference's one-off hybrid event at s == spsa.start_step
    (conditional_model.py:1261-1418): G-1 extra branches are sampled, each
    branch gets its own SPSA update, then the G-group ensemble is scored
    (z and x0 decodes, SVDD reward, mixed weighting) and pruned to top-B.
    The i>=2 branches use zeta = zeta0 (the reference's multi-scale quirk,
    :1285-1286).  Returns the same (z, xh_pocket, lig_mask, pocket_mask,
    sel_idx) tuple as atp_prune."""
    from diffndm_tpu.guidance.spsa import spsa_update

    b = z_lig.shape[0]
    g_extra = atp_cfg.num_groups - 1
    n_dims = core.n_dims
    nx, nh = core.cfg.norm_values

    k_branch, k_spsa = jax.random.split(key)

    def branch(args):
        i, bk = args
        k1, k2 = jax.random.split(bk)
        z_b, xh_b, _, _ = core.sample_p_zs_given_zt(
            k1, s_norm, t_norm, z_lig, xh_pocket, lig_mask, pocket_mask,
            eps_fn, adjust_fn=adjust_fn, noise_scale=noise_scale)
        branch_zeta = jnp.where(i >= 2, spsa_cfg.zeta0, zeta)
        z_b, xh_b = spsa_update(k2, core, eps_fn, oracle, z_b, xh_b,
                                lig_mask, pocket_mask, t_norm, branch_zeta,
                                spsa_cfg)
        return z_b, xh_b

    idxs = jnp.arange(g_extra)
    zb, xhb = jax.lax.map(branch, (idxs, jax.random.split(k_branch,
                                                          g_extra)))
    z_groups = jnp.concatenate([z_lig[None], zb], axis=0)
    xh_groups = jnp.concatenate([xh_pocket[None], xhb], axis=0)

    def lookahead(zg):
        z, xh = zg
        return core.to_x0(z, xh, t_norm, lig_mask, pocket_mask, eps_fn)

    z0_groups = jax.lax.map(lookahead, (z_groups, xh_groups))

    g = atp_cfg.num_groups
    flat = lambda arr: arr.reshape((g * b,) + arr.shape[2:])
    lm_f = jnp.tile(lig_mask, (g, 1))
    r_z = oracle.svdd_rewards(flat(z_groups)[..., :n_dims] * nx,
                              flat(z_groups)[..., n_dims:], lm_f, atp_cfg)
    r_x0 = oracle.svdd_rewards(flat(z0_groups)[..., :n_dims] * nx,
                               flat(z0_groups)[..., n_dims:], lm_f,
                               atp_cfg)
    s_f = s_step.astype(jnp.float32)
    if atp_cfg.compat_precedence:
        w_z = atp_cfg.mix_denom - s_f / atp_cfg.mix_denom
    else:
        w_z = (atp_cfg.mix_denom - s_f) / atp_cfg.mix_denom
    mixed = r_x0 * (s_f / atp_cfg.mix_denom) + r_z * w_z
    sel_idx = select_candidates(mixed, atp_cfg, b)
    z_new, xh_new, lm_new, pm_new = gather_selected(
        sel_idx, flat(z_groups), flat(xh_groups), lig_mask, pocket_mask,
        core)
    return z_new, xh_new, lm_new, pm_new, sel_idx


def atp_prune(key, core: CondDiffusion, eps_fn, oracle: RewardOracle,
              z_lig, xh_pocket, lig_mask, pocket_mask, s_norm, t_norm,
              s_step, cfg: ATPConfig, adjust_fn=None,
              noise_scale: float = 1.0):
    """One pruning event. z_lig: [B, NL, D]; returns
    (z_lig, xh_pocket, lig_mask, pocket_mask, sel_idx) — masks are gathered
    alongside the candidates (see gather_selected) and must replace the
    caller's carried masks; sel_idx % B gives each output row's origin row
    for gathering any additional per-row state."""
    b = z_lig.shape[0]
    g_extra = cfg.num_groups - 1
    n_dims = core.n_dims
    nx, nh = core.cfg.norm_values

    k_branch, k_sel = jax.random.split(key)

    def branch(bk):
        z_b, xh_b, _, _ = core.sample_p_zs_given_zt(
            bk, s_norm, t_norm, z_lig, xh_pocket, lig_mask, pocket_mask,
            eps_fn, adjust_fn=adjust_fn, noise_scale=noise_scale)
        return z_b, xh_b

    zb, xhb = jax.lax.map(branch, jax.random.split(k_branch, g_extra))
    # groups: [G, B, ...]
    z_groups = jnp.concatenate([z_lig[None], zb], axis=0)
    xh_groups = jnp.concatenate([xh_pocket[None], xhb], axis=0)

    def lookahead(zg):
        z, xh = zg
        return core.to_x0(z, xh, t_norm, lig_mask, pocket_mask, eps_fn)

    z0_groups = jax.lax.map(lookahead, (z_groups, xh_groups))  # [G, B, NL, D]

    g = cfg.num_groups
    flat = lambda a: a.reshape((g * b,) + a.shape[2:])
    lm_f = jnp.tile(lig_mask, (g, 1))

    r_z = oracle.svdd_rewards(flat(z_groups)[..., :n_dims] * nx,
                              flat(z_groups)[..., n_dims:], lm_f, cfg)
    r_x0 = oracle.svdd_rewards(flat(z0_groups)[..., :n_dims] * nx,
                               flat(z0_groups)[..., n_dims:], lm_f, cfg)

    s_f = s_step.astype(jnp.float32)
    if cfg.compat_precedence:
        w_z = cfg.mix_denom - s_f / cfg.mix_denom  # (250 - s/250), :1203
    else:
        w_z = (cfg.mix_denom - s_f) / cfg.mix_denom
    mixed = r_x0 * (s_f / cfg.mix_denom) + r_z * w_z

    sel_idx = select_candidates(mixed, cfg, b)
    z_new, xh_new, lm_new, pm_new = gather_selected(
        sel_idx, flat(z_groups), flat(xh_groups), lig_mask, pocket_mask,
        core)
    return z_new, xh_new, lm_new, pm_new, sel_idx
