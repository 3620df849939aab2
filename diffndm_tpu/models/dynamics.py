"""Dynamics wrapper: encodes ligand atoms and pocket residues into a joint
feature space, builds the cutoff adjacency, runs the EGNN and decodes per-node
noise predictions.  Functional parity with reference
equivariant_diffusion/dynamics.py:10-187, re-expressed over padded batches.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffndm_tpu.config import EGNNConfig
from diffndm_tpu.models.egnn import EGNN, GNN, _take_rows, \
    build_neighbor_lists
from diffndm_tpu.ops.segment import masked_mean


def _mlp(sizes, name):
    layers = []
    for i, s in enumerate(sizes):
        layers.append(nn.Dense(s, name=f"{name}_l{i}"))
    def apply(x):
        for i, lyr in enumerate(layers):
            x = lyr(x)
            if i < len(layers) - 1:
                x = jax.nn.silu(x)
        return x
    return apply


def build_adjacency(x_lig, x_pocket, lig_mask, pocket_mask, cfg: EGNNConfig
                    ) -> jnp.ndarray:
    """Dense joint adjacency [B, N, N] with N = NL + NP.

    Block rules (cf. dynamics.py:169-187): ligand-ligand complete (or within
    edge_cutoff_ligand), pocket-pocket within edge_cutoff_pocket, cross
    within edge_cutoff_interaction.  Self-edges are kept, exactly as the
    reference's ``torch.where(adj)`` keeps the diagonal — messages from a
    node to itself flow there too, so we must match.
    """
    nl = x_lig.shape[1]
    x = jnp.concatenate([x_lig, x_pocket], axis=1)
    mask = jnp.concatenate([lig_mask, pocket_mask], axis=1)
    d2 = jnp.sum((x[:, :, None, :] - x[:, None, :, :]) ** 2, axis=-1)
    pair = mask[:, :, None] * mask[:, None, :]

    is_lig = jnp.concatenate(
        [jnp.ones((nl,)), jnp.zeros((x_pocket.shape[1],))])
    ll = is_lig[:, None] * is_lig[None, :]
    pp = (1 - is_lig)[:, None] * (1 - is_lig)[None, :]
    cross = 1.0 - ll - pp

    def within(cutoff):
        if cutoff is None:
            return jnp.ones_like(d2)
        return (d2 <= cutoff ** 2).astype(d2.dtype)

    adj = (ll * within(cfg.edge_cutoff_ligand)
           + pp * within(cfg.edge_cutoff_pocket)
           + cross * within(cfg.edge_cutoff_interaction))
    return (adj * pair).astype(jnp.float32)


class EGNNDynamics(nn.Module):
    """eps-prediction network (cf. dynamics.py:87-167).

    __call__(xh_lig [B,NL,3+F_a], xh_pocket [B,NP,3+F_r], t [B] or scalar,
             lig_mask [B,NL], pocket_mask [B,NP])
    -> (eps_lig [B,NL,3+F_a], eps_pocket [B,NP,3+F_r])
    """
    cfg: EGNNConfig
    atom_nf: int
    residue_nf: int
    n_dims: int = 3

    @nn.compact
    def __call__(self, xh_lig, xh_pocket, t, lig_mask, pocket_mask
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        nl = xh_lig.shape[1]
        x_lig, h_lig = xh_lig[..., :self.n_dims], xh_lig[..., self.n_dims:]
        x_poc, h_poc = (xh_pocket[..., :self.n_dims],
                        xh_pocket[..., self.n_dims:])

        # sorted-band sparsity: permute the pocket along its principal
        # axis so banded column windows are exact (models/banding.py);
        # outputs are un-permuted below.  The permutation is block-local,
        # so edge types / update_coords_mask are unaffected.
        band_perm = None
        if (cfg.band_window is not None and cfg.neighbors is None
                and cfg.mode == "egnn_dynamics"):
            from diffndm_tpu.models.banding import principal_axis_order

            band_perm, _ = principal_axis_order(x_poc, pocket_mask)
            take = lambda arr: jnp.take_along_axis(
                arr, band_perm[..., None], axis=1)
            x_poc = take(x_poc)
            h_poc = take(h_poc)
            pocket_mask_sorted = jnp.take_along_axis(pocket_mask,
                                                     band_perm, axis=1)
        else:
            pocket_mask_sorted = pocket_mask

        atom_enc = _mlp([2 * self.atom_nf, cfg.joint_nf], "atom_encoder")
        atom_dec = _mlp([2 * self.atom_nf, self.atom_nf], "atom_decoder")
        res_enc = _mlp([2 * self.residue_nf, cfg.joint_nf], "residue_encoder")
        res_dec = _mlp([2 * self.residue_nf, self.residue_nf],
                       "residue_decoder")

        h = jnp.concatenate([atom_enc(h_lig), res_enc(h_poc)], axis=1)
        x = jnp.concatenate([x_lig, x_poc], axis=1)
        mask = jnp.concatenate([lig_mask, pocket_mask_sorted], axis=1)

        if cfg.condition_time:
            t = jnp.asarray(t)
            if t.ndim == 0:
                h_time = jnp.full(h.shape[:-1] + (1,), t, dtype=h.dtype)
            else:  # per-sample t: [B] or [B, 1]
                h_time = jnp.broadcast_to(
                    t.reshape(-1, 1, 1), h.shape[:-1] + (1,)).astype(h.dtype)
            h = jnp.concatenate([h, h_time], axis=-1)

        adj = build_adjacency(x_lig, x_poc, lig_mask, pocket_mask_sorted,
                              cfg)

        # optional 3-type learned edge embedding (dynamics.py:118-127)
        edge_attr = None
        if cfg.edge_embedding_dim is not None:
            is_lig = jnp.concatenate(
                [jnp.ones((nl,), jnp.int32),
                 jnp.zeros((x_poc.shape[1],), jnp.int32)])
            # 0: ligand-pocket, 1: ligand-ligand, 2: pocket-pocket
            etype = (is_lig[:, None] * is_lig[None, :]
                     + 2 * (1 - is_lig)[:, None] * (1 - is_lig)[None, :])
            emb = nn.Embed(3, cfg.edge_embedding_dim, name="edge_embedding")
            edge_attr = jnp.broadcast_to(
                emb(etype)[None], (h.shape[0],) + etype.shape
                + (cfg.edge_embedding_dim,))

        # optional fixed-K neighbour lists (TPU fast path; see
        # egnn.build_neighbor_lists)
        nbr_idx = None
        if cfg.neighbors is not None and cfg.neighbors < adj.shape[-1]:
            is_lig = jnp.concatenate(
                [jnp.ones((nl,)), jnp.zeros((x_poc.shape[1],))])
            nbr_idx, adj = build_neighbor_lists(x, adj, is_lig,
                                                cfg.neighbors)
            if edge_attr is not None:
                edge_attr = jnp.take_along_axis(
                    edge_attr, nbr_idx[..., None], axis=2)

        if cfg.mode == "egnn_dynamics":
            update_coords_mask = None
            if not cfg.update_pocket_coords:
                update_coords_mask = jnp.concatenate(
                    [jnp.ones_like(lig_mask), jnp.zeros_like(pocket_mask)],
                    axis=1)[..., None]
            egnn = EGNN(cfg, in_node_nf=h.shape[-1],
                        out_node_nf=h.shape[-1],
                        in_edge_nf=cfg.edge_embedding_dim or 0, name="egnn")
            h_final, x_final = egnn(h, x, adj, mask,
                                    update_coords_mask=update_coords_mask,
                                    edge_attr=edge_attr, nbr_idx=nbr_idx,
                                    n_lig=(nl if band_perm is not None
                                           else None),
                                    # conditional mode: pocket coords are
                                    # frozen, so only the ligand rows'
                                    # coordinate updates are computed
                                    coord_update_rows=(
                                        None if cfg.update_pocket_coords
                                        else nl))
            vel = (x_final - x) * mask[..., None]
        elif cfg.mode == "gnn_dynamics":
            gnn = GNN(cfg, in_node_nf=h.shape[-1] + self.n_dims,
                      out_node_nf=h.shape[-1] + self.n_dims,
                      in_edge_nf=cfg.edge_embedding_dim or 0, name="gnn")
            out = gnn(jnp.concatenate([x, h], axis=-1), adj, mask,
                      edge_attr=edge_attr)
            vel = out[..., :self.n_dims] * mask[..., None]
            h_final = out[..., self.n_dims:]
        else:
            raise ValueError(cfg.mode)

        if cfg.condition_time:
            h_final = h_final[..., :-1]

        if band_perm is not None:
            # un-permute the pocket rows back to the caller's order
            inv = jnp.argsort(band_perm, axis=1)
            unperm = lambda arr: jnp.take_along_axis(
                arr, inv[..., None], axis=1)
            h_final = jnp.concatenate(
                [h_final[:, :nl], unperm(h_final[:, nl:])], axis=1)
            vel = jnp.concatenate(
                [vel[:, :nl], unperm(vel[:, nl:])], axis=1)

        eps_h_lig = atom_dec(h_final[:, :nl])
        eps_h_poc = res_dec(h_final[:, nl:])

        if cfg.update_pocket_coords:
            # joint model: project velocity to the zero-COM subspace.
            # vel is in the CALLER's row order here (un-permuted above),
            # so the mask must be too.
            mask_out = (jnp.concatenate([lig_mask, pocket_mask], axis=1)
                        if band_perm is not None else mask)
            vel = vel - masked_mean(vel, mask_out, axis=1, keepdims=True)
            vel = vel * mask_out[..., None]

        eps_lig = jnp.concatenate([vel[:, :nl], eps_h_lig], axis=-1)
        eps_poc = jnp.concatenate([vel[:, nl:], eps_h_poc], axis=-1)
        ml = lig_mask[..., None].astype(eps_lig.dtype)
        mp = pocket_mask[..., None].astype(eps_poc.dtype)
        return eps_lig * ml, eps_poc * mp


def init_dynamics(cfg: EGNNConfig, atom_nf: int, residue_nf: int,
                  key: Optional[jax.Array] = None, nl: int = 8, np_: int = 16):
    """Convenience initializer returning (module, params)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    module = EGNNDynamics(cfg, atom_nf=atom_nf, residue_nf=residue_nf)
    xh_lig = jnp.zeros((1, nl, 3 + atom_nf))
    xh_poc = jnp.zeros((1, np_, 3 + residue_nf))
    params = module.init(key, xh_lig, xh_poc, jnp.zeros((1,)),
                         jnp.ones((1, nl)), jnp.ones((1, np_)))
    return module, params
