"""EGNN/dynamics unit tests: shapes, masking and E(3) symmetry.

The symmetry tests mirror the reference's implicit contract
(egnn_new.py / dynamics.py): coordinate outputs rotate with the input,
feature outputs are invariant; with the cross-product term enabled the model
is rotation- but NOT reflection-equivariant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffndm_tpu.config import EGNNConfig
from diffndm_tpu.models.dynamics import EGNNDynamics, build_adjacency

ATOM_NF, RES_NF = 10, 10


def make_inputs(key, b=2, nl=11, npk=19):
    k1, k2, k3 = jax.random.split(key, 3)
    xh_lig = jax.random.normal(k1, (b, nl, 3 + ATOM_NF))
    xh_poc = jax.random.normal(k2, (b, npk, 3 + RES_NF)) * 2.0
    lig_mask = (jnp.arange(nl)[None, :] < jnp.array([[7], [11]])).astype(
        jnp.float32)
    poc_mask = (jnp.arange(npk)[None, :] < jnp.array([[13], [19]])).astype(
        jnp.float32)
    xh_lig = xh_lig * lig_mask[..., None]
    xh_poc = xh_poc * poc_mask[..., None]
    t = jnp.array([0.3, 0.7])
    return xh_lig, xh_poc, t, lig_mask, poc_mask


def random_rotation(key):
    a = jax.random.normal(key, (3, 3))
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diag(r))
    # ensure proper rotation (det +1)
    det = jnp.linalg.det(q)
    return q.at[:, 0].multiply(det)


def rotate(xh, rot):
    return jnp.concatenate([xh[..., :3] @ rot.T, xh[..., 3:]], axis=-1)


@pytest.fixture(scope="module")
def model_and_params():
    # no distance cutoffs: the cutoff graph is a step function, so symmetry
    # only holds exactly on a fixed adjacency
    cfg = EGNNConfig(hidden_nf=32, joint_nf=16, n_layers=2, row_tile=8,
                     edge_cutoff_pocket=None, edge_cutoff_interaction=None)
    model = EGNNDynamics(cfg, atom_nf=ATOM_NF, residue_nf=RES_NF)
    inputs = make_inputs(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), *inputs)
    return model, params, inputs


def test_shapes_and_padding(model_and_params):
    model, params, inputs = model_and_params
    xh_lig, xh_poc, t, lm, pm = inputs
    eps_l, eps_p = model.apply(params, *inputs)
    assert eps_l.shape == xh_lig.shape
    assert eps_p.shape == xh_poc.shape
    # padded nodes produce exactly zero output
    np.testing.assert_allclose(
        np.asarray(eps_l) * (1 - np.asarray(lm))[..., None], 0.0, atol=0)
    assert np.all(np.isfinite(np.asarray(eps_l)))


def test_padding_independence(model_and_params):
    """Extending the padding must not change outputs for real nodes."""
    model, params, inputs = model_and_params
    xh_lig, xh_poc, t, lm, pm = inputs
    out1, _ = model.apply(params, xh_lig, xh_poc, t, lm, pm)

    pad = [(0, 0), (0, 5), (0, 0)]
    out2, _ = model.apply(params, jnp.pad(xh_lig, pad), xh_poc, t,
                          jnp.pad(lm, [(0, 0), (0, 5)]), pm)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2)[:, :11],
                               rtol=2e-5, atol=2e-5)


def test_rotation_equivariance(model_and_params):
    model, params, inputs = model_and_params
    xh_lig, xh_poc, t, lm, pm = inputs
    rot = random_rotation(jax.random.PRNGKey(7))

    eps_l, eps_p = model.apply(params, xh_lig, xh_poc, t, lm, pm)
    eps_l_r, eps_p_r = model.apply(params, rotate(xh_lig, rot),
                                   rotate(xh_poc, rot), t, lm, pm)
    # velocity rotates, features invariant
    np.testing.assert_allclose(np.asarray(eps_l_r[..., :3]),
                               np.asarray(eps_l[..., :3] @ rot.T),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(eps_l_r[..., 3:]),
                               np.asarray(eps_l[..., 3:]),
                               rtol=1e-3, atol=1e-4)


def test_translation_invariance(model_and_params):
    """Conditional dynamics output is translation invariant (velocities and
    features depend only on relative geometry)."""
    model, params, inputs = model_and_params
    xh_lig, xh_poc, t, lm, pm = inputs
    shift = jnp.array([1.5, -2.0, 0.7])

    def shifted(xh, m):
        return jnp.concatenate(
            [(xh[..., :3] + shift) * m[..., None], xh[..., 3:]], axis=-1)

    eps_l, _ = model.apply(params, xh_lig, xh_poc, t, lm, pm)
    eps_l_s, _ = model.apply(params, shifted(xh_lig, lm), shifted(xh_poc, pm),
                             t, lm, pm)
    np.testing.assert_allclose(np.asarray(eps_l), np.asarray(eps_l_s),
                               rtol=1e-3, atol=1e-4)


def test_reflection_breaks_with_cross_term(model_and_params):
    """reflection_equivariant=False (crossdock config) must break mirror
    symmetry (cf. egnn_new.py:305-316)."""
    model, params, inputs = model_and_params
    xh_lig, xh_poc, t, lm, pm = inputs
    refl = jnp.diag(jnp.array([-1.0, 1.0, 1.0]))
    eps_l, _ = model.apply(params, *inputs)
    eps_l_m, _ = model.apply(params, rotate(xh_lig, refl),
                             rotate(xh_poc, refl), t, lm, pm)
    diff = np.abs(np.asarray(eps_l_m[..., :3])
                  - np.asarray(eps_l[..., :3] @ refl.T)).max()
    assert diff > 1e-6, "cross-product term should break reflection symmetry"


def test_pocket_coords_frozen(model_and_params):
    """In conditional mode pocket velocities must be zero
    (dynamics.py:130-132)."""
    model, params, inputs = model_and_params
    _, eps_p = model.apply(params, *inputs)
    np.testing.assert_allclose(np.asarray(eps_p[..., :3]), 0.0, atol=1e-7)


def test_adjacency_blocks():
    cfg = EGNNConfig(edge_cutoff_ligand=None, edge_cutoff_pocket=1.0,
                     edge_cutoff_interaction=1.0)
    x_lig = jnp.zeros((1, 2, 3))
    x_poc = jnp.array([[[0.5, 0, 0], [5.0, 0, 0]]])
    lm = jnp.ones((1, 2))
    pm = jnp.ones((1, 2))
    adj = np.asarray(build_adjacency(x_lig, x_poc, lm, pm, cfg))[0]
    # ligand-ligand always connected
    assert adj[0, 1] == 1 and adj[1, 0] == 1
    # close pocket atom connected to ligand, far one not
    assert adj[0, 2] == 1 and adj[0, 3] == 0
    # pocket-pocket beyond cutoff
    assert adj[2, 3] == 0
