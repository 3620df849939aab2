"""Joint (unconditional) model tests: sampling, repaint schedule,
inpainting, joint loss terms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffndm_tpu.config import DiffusionConfig, EGNNConfig
from diffndm_tpu.diffusion import schedules as S
from diffndm_tpu.diffusion.joint import (JointDiffusion, JointSampler,
                                         get_repaint_schedule)
from diffndm_tpu.models.dynamics import EGNNDynamics
from diffndm_tpu.structs import NodeBatch
from diffndm_tpu.train.losses import joint_loss_terms

ATOM_NF = 10
T = 8
B, NL, NP = 2, 8, 16


@pytest.fixture(scope="module")
def setup():
    cfg = EGNNConfig(hidden_nf=16, joint_nf=8, n_layers=1, row_tile=16,
                     attention=False, reflection_equivariant=True,
                     update_pocket_coords=True)
    module = EGNNDynamics(cfg, atom_nf=ATOM_NF, residue_nf=ATOM_NF)
    key = jax.random.PRNGKey(0)
    params = module.init(key, jnp.zeros((1, NL, 13)),
                         jnp.zeros((1, NP, 13)), jnp.zeros((1,)),
                         jnp.ones((1, NL)), jnp.ones((1, NP)))
    core = JointDiffusion(S.make_schedule("polynomial_2", T, 5e-4),
                          DiffusionConfig(timesteps=T), ATOM_NF, ATOM_NF)
    return core, module, params


def test_repaint_schedule():
    # matches en_diffusion.get_repaint_schedule semantics: with
    # resamplings=1 consecutive runs merge into one contiguous denoise
    assert get_repaint_schedule(1, 1, 5) == [5]
    s = get_repaint_schedule(3, 1, 4)
    assert len(s) > 1 and s[-1] >= 1
    assert len(get_repaint_schedule(2, 2, 10)) > 1


def test_joint_sample(setup):
    core, module, params = setup
    sampler = JointSampler(core, module, params)
    lig, poc = sampler.sample(jax.random.PRNGKey(1),
                              num_nodes_lig=np.array([5, 7]),
                              num_nodes_pocket=np.array([12, 16]))
    assert np.all(np.isfinite(np.asarray(lig.x)))
    # joint COM ~ 0
    total = (np.asarray(lig.x).sum(1) + np.asarray(poc.x).sum(1))
    count = (np.asarray(lig.mask).sum(1)
             + np.asarray(poc.mask).sum(1))[:, None]
    assert np.abs(total / count).max() < 0.5
    # pocket types are one-hot too (joint model denoises the pocket)
    hs = np.asarray(poc.h).sum(-1) * np.asarray(poc.mask)
    np.testing.assert_allclose(hs, np.asarray(poc.mask), atol=1e-6)


def test_joint_inpaint(setup):
    core, module, params = setup
    sampler = JointSampler(core, module, params)
    key = jax.random.PRNGKey(2)
    ligand = NodeBatch(x=jax.random.normal(key, (B, NL, 3)),
                       h=jax.nn.one_hot(
                           jax.random.randint(key, (B, NL), 0, 4), ATOM_NF),
                       mask=jnp.ones((B, NL)))
    pocket = NodeBatch(x=jax.random.normal(key, (B, NP, 3)) * 2,
                       h=jax.nn.one_hot(
                           jax.random.randint(key, (B, NP), 0, 4), ATOM_NF),
                       mask=jnp.ones((B, NP)))
    lig_fixed = jnp.zeros((B, NL))
    pocket_fixed = jnp.ones((B, NP))  # fix the whole pocket
    lig2, poc2 = sampler.inpaint(jax.random.PRNGKey(3), ligand, pocket,
                                 lig_fixed, pocket_fixed, resamplings=2,
                                 jump_length=2)
    assert np.all(np.isfinite(np.asarray(lig2.x)))
    # fixed pocket keeps its internal geometry
    din = np.asarray(pocket.x)[0]
    dout = np.asarray(poc2.x)[0]
    pd_in = np.linalg.norm(din[:, None] - din[None], axis=-1)
    pd_out = np.linalg.norm(dout[:, None] - dout[None], axis=-1)
    assert np.abs(pd_in - pd_out).max() < 1.0


def test_joint_loss_terms(setup):
    core, module, params = setup
    key = jax.random.PRNGKey(4)
    ligand = NodeBatch(x=jax.random.normal(key, (B, NL, 3)),
                       h=jax.nn.one_hot(
                           jax.random.randint(key, (B, NL), 0, 4), ATOM_NF),
                       mask=jnp.ones((B, NL)))
    pocket = NodeBatch(x=jax.random.normal(key, (B, NP, 3)),
                       h=jax.nn.one_hot(
                           jax.random.randint(key, (B, NP), 0, 4), ATOM_NF),
                       mask=jnp.ones((B, NP)))

    def eps_fn(z_l, z_p, t, lm, pm):
        return module.apply(params, z_l, z_p, t, lm, pm)

    terms = joint_loss_terms(key, core, eps_fn, ligand, pocket,
                             training=True)
    for k, v in terms.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    assert terms["error_t_pocket"].shape == (B,)
    # pocket error nonzero in joint mode (vs zero in conditional)
    assert float(jnp.max(terms["error_t_pocket"]
                         + terms["error_t_lig"])) > 0
