"""Host-orchestrated guided inpainting must match the fused io_callback
RePaint loop: same position-based keys, same oracle, same math."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffndm_tpu.config import (ATPConfig, DiffusionConfig, EGNNConfig,
                                InpaintConfig, SampleConfig, SPSAConfig)
from diffndm_tpu.constants import dataset_params
from diffndm_tpu.diffusion import schedules as S
from diffndm_tpu.diffusion.core import CondDiffusion
from diffndm_tpu.diffusion.inpaint import InpaintSampler
from diffndm_tpu.models.dynamics import EGNNDynamics
from diffndm_tpu.structs import NodeBatch

ATOM_NF = 10
T = 8
B, NL, NP = 2, 8, 12
DP = dataset_params["crossdock_full"]


@pytest.fixture(scope="module")
def setup():
    cfg = EGNNConfig(hidden_nf=16, joint_nf=8, n_layers=1, row_tile=16,
                     attention=False, reflection_equivariant=True)
    module = EGNNDynamics(cfg, atom_nf=ATOM_NF, residue_nf=ATOM_NF)
    key = jax.random.PRNGKey(0)
    params = module.init(key, jnp.zeros((1, NL, 13)),
                         jnp.zeros((1, NP, 13)), jnp.zeros((1,)),
                         jnp.ones((1, NL)), jnp.ones((1, NP)))
    core = CondDiffusion(S.make_schedule("polynomial_2", T, 5e-4),
                         DiffusionConfig(timesteps=T), ATOM_NF, ATOM_NF)
    kl, kp = jax.random.split(key)
    ligand = NodeBatch(
        x=jax.random.normal(kl, (B, NL, 3)) * 2,
        h=jax.nn.one_hot(jax.random.randint(kl, (B, NL), 0, 4), ATOM_NF),
        mask=jnp.ones((B, NL)))
    pocket = NodeBatch(
        x=jax.random.normal(kp, (B, NP, 3)) * 3 + 5,
        h=jax.nn.one_hot(jax.random.randint(kp, (B, NP), 0, 4), ATOM_NF),
        mask=jnp.ones((B, NP)))
    lig_fixed = jnp.asarray(
        (np.arange(NL)[None, :] < 3).astype(np.float32).repeat(B, 0)
        .reshape(B, NL))
    scfg = SampleConfig(
        spsa=SPSAConfig(num_probes=2),
        atp=ATPConfig(num_groups=3),
        inpaint=InpaintConfig(spsa_low=2, spsa_high=4, atp_start_step=5,
                              atp_every=2))
    return core, module, params, ligand, lig_fixed, pocket, scfg


@pytest.mark.parametrize("svdd,spsa", [(True, True), (True, False),
                                       (False, True)])
def test_host_inpaint_matches_fused(setup, svdd, spsa):
    core, module, params, ligand, lig_fixed, pocket, scfg = setup
    fused = InpaintSampler(core, module, params, scfg, DP)
    r1 = fused.inpaint(jax.random.PRNGKey(11), ligand, lig_fixed, pocket,
                       timesteps=T, resamplings=2, svdd=svdd, spsa=spsa)

    host = InpaintSampler(core, module, params, scfg, DP)
    os.environ["DIFFNDM_HOST_GUIDANCE"] = "1"
    try:
        r2 = host.inpaint(jax.random.PRNGKey(11), ligand, lig_fixed,
                          pocket, timesteps=T, resamplings=2, svdd=svdd,
                          spsa=spsa)
    finally:
        os.environ.pop("DIFFNDM_HOST_GUIDANCE", None)

    np.testing.assert_array_equal(np.asarray(r1.ligand.mask),
                                  np.asarray(r2.ligand.mask))
    np.testing.assert_allclose(np.asarray(r1.ligand.x),
                               np.asarray(r2.ligand.x), atol=5e-4)
    np.testing.assert_array_equal(np.asarray(r1.ligand.h),
                                  np.asarray(r2.ligand.h))


def test_host_inpaint_unguided_uses_fused_path(setup):
    """Unguided requests never take the host loop (no oracle needed)."""
    core, module, params, ligand, lig_fixed, pocket, scfg = setup
    s = InpaintSampler(core, module, params, scfg, DP)
    os.environ["DIFFNDM_HOST_GUIDANCE"] = "1"
    try:
        r = s.inpaint(jax.random.PRNGKey(3), ligand, lig_fixed, pocket,
                      timesteps=T, resamplings=1, svdd=False, spsa=False)
    finally:
        os.environ.pop("DIFFNDM_HOST_GUIDANCE", None)
    assert np.isfinite(np.asarray(r.ligand.x)).all()
    assert "host" not in s._cache
