"""Gathered neighbour-list path: must match the dense path exactly when K
covers every edge."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffndm_tpu.config import EGNNConfig
from diffndm_tpu.models.dynamics import EGNNDynamics
from diffndm_tpu.models.egnn import build_neighbor_lists

ATOM_NF = 10
B, NL, NP = 2, 8, 24


def make_inputs(key):
    k1, k2 = jax.random.split(key)
    xh_lig = jax.random.normal(k1, (B, NL, 3 + ATOM_NF))
    xh_poc = jax.random.normal(k2, (B, NP, 3 + ATOM_NF)) * 2.0
    lm = (jnp.arange(NL)[None, :] < jnp.array([[6], [8]])).astype(
        jnp.float32)
    pm = jnp.ones((B, NP))
    return (xh_lig * lm[..., None], xh_poc, jnp.array([0.4, 0.6]), lm, pm)


def test_neighbor_lists_cover_edges():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 3)) * 2
    adj = (jax.random.uniform(key, (2, 16, 16)) > 0.6).astype(jnp.float32)
    is_lig = jnp.concatenate([jnp.ones((4,)), jnp.zeros((12,))])
    k = 12
    idx, adj_nbr = build_neighbor_lists(x, adj, is_lig, k)
    assert idx.shape == (2, 16, k)
    # every true edge must appear in the gathered adjacency as long as the
    # node degree is <= k
    deg = np.asarray(adj.sum(-1))
    gathered = np.asarray(adj_nbr.sum(-1))
    covered = deg <= k
    np.testing.assert_allclose(gathered[covered],
                               deg[covered])
    # ligand-ligand pairs always selected
    for b in range(2):
        for i in range(4):
            assert set(range(4)) <= set(np.asarray(idx[b, i]))


def test_gathered_matches_dense():
    """With K = N the gathered path must reproduce the dense forward."""
    key = jax.random.PRNGKey(1)
    inputs = make_inputs(key)
    n = NL + NP
    dense_cfg = EGNNConfig(hidden_nf=32, joint_nf=16, n_layers=2,
                           row_tile=8)
    nbr_cfg = dense_cfg.__class__(**{**dense_cfg.__dict__,
                                     "neighbors": n - 1})
    m_dense = EGNNDynamics(dense_cfg, atom_nf=ATOM_NF, residue_nf=ATOM_NF)
    m_nbr = EGNNDynamics(nbr_cfg, atom_nf=ATOM_NF, residue_nf=ATOM_NF)
    params = m_dense.init(jax.random.PRNGKey(2), *inputs)
    out_d, _ = m_dense.apply(params, *inputs)
    out_n, _ = m_nbr.apply(params, *inputs)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_n),
                               rtol=1e-4, atol=1e-5)


def test_gathered_close_with_cutoff_k():
    """With K large enough for the cutoff graph, outputs match to fp
    precision (all real edges covered)."""
    key = jax.random.PRNGKey(3)
    inputs = make_inputs(key)
    dense_cfg = EGNNConfig(hidden_nf=32, joint_nf=16, n_layers=2,
                           row_tile=8, edge_cutoff_pocket=2.0,
                           edge_cutoff_interaction=2.0)
    nbr_cfg = dense_cfg.__class__(**{**dense_cfg.__dict__, "neighbors": 24})
    m_dense = EGNNDynamics(dense_cfg, atom_nf=ATOM_NF, residue_nf=ATOM_NF)
    m_nbr = EGNNDynamics(nbr_cfg, atom_nf=ATOM_NF, residue_nf=ATOM_NF)
    params = m_dense.init(jax.random.PRNGKey(4), *inputs)
    out_d, _ = m_dense.apply(params, *inputs)
    out_n, _ = m_nbr.apply(params, *inputs)
    # K=24 covers every node's cutoff neighbourhood in this geometry
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_n),
                               rtol=1e-3, atol=1e-4)
