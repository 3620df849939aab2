"""Inpainting + diversify tests: fixed atoms preserved (approximately),
shapes/finiteness, resampling, guidance hooks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffndm_tpu.config import (ATPConfig, DiffusionConfig, EGNNConfig,
                                SampleConfig, SPSAConfig, InpaintConfig)
from diffndm_tpu.constants import dataset_params
from diffndm_tpu.diffusion import schedules as S
from diffndm_tpu.diffusion.core import CondDiffusion
from diffndm_tpu.diffusion.diversify import DiversifySampler
from diffndm_tpu.diffusion.inpaint import InpaintSampler
from diffndm_tpu.models.dynamics import EGNNDynamics
from diffndm_tpu.structs import NodeBatch

ATOM_NF = 10
T = 10
B, NL, NP = 2, 8, 16
DP = dataset_params["crossdock_full"]


@pytest.fixture(scope="module")
def setup():
    cfg = EGNNConfig(hidden_nf=16, joint_nf=8, n_layers=1, row_tile=16,
                     attention=False, reflection_equivariant=True)
    module = EGNNDynamics(cfg, atom_nf=ATOM_NF, residue_nf=ATOM_NF)
    key = jax.random.PRNGKey(0)
    params = module.init(key, jnp.zeros((1, NL, 13)), jnp.zeros((1, NP, 13)),
                         jnp.zeros((1,)), jnp.ones((1, NL)),
                         jnp.ones((1, NP)))
    sched = S.make_schedule("polynomial_2", T, 5e-4)
    core = CondDiffusion(sched, DiffusionConfig(timesteps=T),
                         atom_nf=ATOM_NF, residue_nf=ATOM_NF)
    kp = jax.random.PRNGKey(1)
    pocket = NodeBatch(
        x=jax.random.normal(kp, (B, NP, 3)) * 2 + 8.0,
        h=jax.nn.one_hot(jax.random.randint(kp, (B, NP), 0, 4), ATOM_NF),
        mask=jnp.ones((B, NP)))
    kl = jax.random.PRNGKey(2)
    ligand = NodeBatch(
        x=jax.random.normal(kl, (B, NL, 3)) + 8.0,
        h=jax.nn.one_hot(jax.random.randint(kl, (B, NL), 0, 4), ATOM_NF),
        mask=jnp.ones((B, NL)))
    lig_fixed = jnp.asarray(
        (np.arange(NL)[None, :] < 3).astype(np.float32).repeat(B, 0))
    return core, module, params, pocket, ligand, lig_fixed


def test_inpaint_basic(setup):
    core, module, params, pocket, ligand, lig_fixed = setup
    sampler = InpaintSampler(core, module, params, SampleConfig(), DP)
    res = sampler.inpaint(jax.random.PRNGKey(3), ligand, lig_fixed, pocket,
                          resamplings=2)
    assert np.all(np.isfinite(np.asarray(res.ligand.x)))
    assert res.ligand.x.shape == (B, NL, 3)
    # fixed atoms keep relative geometry: pairwise distances of the fixed
    # fragment should match the input fragment to good accuracy
    x_in = np.asarray(ligand.x)
    x_out = np.asarray(res.ligand.x)
    for b in range(B):
        fin = x_in[b, :3]
        fout = x_out[b, :3]
        din = np.linalg.norm(fin[:, None] - fin[None, :], axis=-1)
        dout = np.linalg.norm(fout[:, None] - fout[None, :], axis=-1)
        # known part is re-noised at gamma_s~0 for the last step, so only
        # approximate preservation is expected
        assert np.abs(din - dout).max() < 1.5


def test_inpaint_center_pocket(setup):
    core, module, params, pocket, ligand, lig_fixed = setup
    sampler = InpaintSampler(core, module, params, SampleConfig(), DP)
    res = sampler.inpaint(jax.random.PRNGKey(4), ligand, lig_fixed, pocket,
                          center="pocket")
    assert np.all(np.isfinite(np.asarray(res.ligand.x)))


def test_inpaint_guidance_hooks(setup):
    core, module, params, pocket, ligand, lig_fixed = setup
    cfg = SampleConfig(
        spsa=SPSAConfig(num_probes=2),
        atp=ATPConfig(num_groups=2),
        inpaint=InpaintConfig(spsa_low=2, spsa_high=5, atp_start_step=4,
                              atp_every=2))
    sampler = InpaintSampler(core, module, params, cfg, DP)
    res = sampler.inpaint(jax.random.PRNGKey(5), ligand, lig_fixed, pocket,
                          svdd=True, spsa=True, resamplings=2)
    assert np.all(np.isfinite(np.asarray(res.ligand.x)))


def test_diversify(setup):
    core, module, params, pocket, ligand, lig_fixed = setup
    div = DiversifySampler(core, module, params)
    res = div.diversify(jax.random.PRNGKey(6), ligand, pocket,
                        noising_steps=4)
    x_out = np.asarray(res.ligand.x)
    assert np.all(np.isfinite(x_out))
    # light noising must keep the ligand near its original location
    assert np.abs(x_out - np.asarray(ligand.x)).mean() < 5.0
    # but not identical
    assert np.abs(x_out - np.asarray(ligand.x)).max() > 1e-3
