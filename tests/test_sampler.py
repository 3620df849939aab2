"""End-to-end conditional sampler tests on a tiny model: baseline, SPSA,
ATP, RL-adjusted sampling; shapes, COM invariants, determinism."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffndm_tpu.config import (ATPConfig, DiffusionConfig, EGNNConfig,
                                RLConfig, SampleConfig, SPSAConfig)
from diffndm_tpu.diffusion import schedules as S
from diffndm_tpu.diffusion.core import CondDiffusion, assert_mean_zero
from diffndm_tpu.diffusion.sampler import ConditionalSampler
from diffndm_tpu.models.adjust_net import AdjustNetState
from diffndm_tpu.models.dynamics import EGNNDynamics
from diffndm_tpu.constants import dataset_params
from diffndm_tpu.structs import NodeBatch

ATOM_NF = 10
T = 12
B, NL, NP = 3, 8, 24
DP = dataset_params["crossdock_full"]


@pytest.fixture(scope="module")
def setup():
    cfg = EGNNConfig(hidden_nf=16, joint_nf=8, n_layers=1, row_tile=16,
                     attention=False, reflection_equivariant=True)
    module = EGNNDynamics(cfg, atom_nf=ATOM_NF, residue_nf=ATOM_NF)
    key = jax.random.PRNGKey(0)
    xh_l = jnp.zeros((B, NL, 3 + ATOM_NF))
    xh_p = jnp.zeros((B, NP, 3 + ATOM_NF))
    params = module.init(key, xh_l, xh_p, jnp.zeros((B,)),
                         jnp.ones((B, NL)), jnp.ones((B, NP)))
    sched = S.make_schedule("polynomial_2", T, 5e-4)
    core = CondDiffusion(sched, DiffusionConfig(timesteps=T),
                         atom_nf=ATOM_NF, residue_nf=ATOM_NF)

    kp = jax.random.PRNGKey(1)
    pocket = NodeBatch(
        x=jax.random.normal(kp, (B, NP, 3)) * 2 + 10.0,
        h=jax.nn.one_hot(
            jax.random.randint(kp, (B, NP), 0, ATOM_NF), ATOM_NF),
        mask=jnp.ones((B, NP)))
    return core, module, params, pocket


def make_sampler(core, module, params, **over):
    cfg = SampleConfig(**over)
    return ConditionalSampler(core, module, params, cfg, DP)


def test_baseline_sampling(setup):
    core, module, params, pocket = setup
    sampler = make_sampler(core, module, params)
    res = sampler.sample_given_pocket(jax.random.PRNGKey(2), pocket,
                                      np.array([5, 7, 6]))
    lig = res.ligand
    assert lig.x.shape == (B, 8, 3)
    assert np.all(np.isfinite(np.asarray(lig.x)))
    # hard one-hot types on real nodes
    hs = np.asarray(lig.h).sum(-1)
    np.testing.assert_allclose(hs * np.asarray(lig.mask),
                               np.asarray(lig.mask), atol=1e-6)
    # ligand lands near the pocket (same frame)
    pocket_com = np.asarray(pocket.x).mean(axis=1)
    lig_com = (np.asarray(lig.x).sum(1)
               / np.asarray(lig.mask).sum(1, keepdims=True))
    assert np.linalg.norm(lig_com - pocket_com, axis=-1).max() < 15.0


def test_determinism(setup):
    core, module, params, pocket = setup
    sampler = make_sampler(core, module, params)
    r1 = sampler.sample_given_pocket(jax.random.PRNGKey(3), pocket,
                                     np.array([5, 7, 6]))
    r2 = sampler.sample_given_pocket(jax.random.PRNGKey(3), pocket,
                                     np.array([5, 7, 6]))
    np.testing.assert_allclose(np.asarray(r1.ligand.x),
                               np.asarray(r2.ligand.x), atol=1e-5)
    r3 = sampler.sample_given_pocket(jax.random.PRNGKey(4), pocket,
                                     np.array([5, 7, 6]))
    assert np.abs(np.asarray(r1.ligand.x) - np.asarray(r3.ligand.x)).max() \
        > 1e-3


def test_timesteps_override(setup):
    """Sampling with more steps than T (reference uses 600 on a T=500
    model, my_test.py:86-88)."""
    core, module, params, pocket = setup
    sampler = make_sampler(core, module, params)
    res = sampler.sample_given_pocket(jax.random.PRNGKey(5), pocket,
                                      np.array([5, 7, 6]), timesteps=T + 5)
    assert np.all(np.isfinite(np.asarray(res.ligand.x)))


def test_spsa_sampling(setup):
    core, module, params, pocket = setup
    sampler = make_sampler(
        core, module, params,
        spsa=SPSAConfig(enabled=True, num_probes=2, start_step=4, every=2))
    res = sampler.sample_given_pocket(jax.random.PRNGKey(6), pocket,
                                      np.array([5, 7, 6]))
    assert np.all(np.isfinite(np.asarray(res.ligand.x)))


def test_atp_sampling(setup):
    core, module, params, pocket = setup
    sampler = make_sampler(
        core, module, params,
        atp=ATPConfig(enabled=True, num_groups=3, start_step=4, every=2))
    res = sampler.sample_given_pocket(jax.random.PRNGKey(7), pocket,
                                      np.array([5, 7, 6]))
    assert np.all(np.isfinite(np.asarray(res.ligand.x)))


def test_rl_adjust_and_update(setup):
    core, module, params, pocket = setup
    rl = RLConfig(enabled=True, train=True, input_dim=3 + ATOM_NF)
    adjust = AdjustNetState(rl)
    sampler = ConditionalSampler(
        core, module, params,
        SampleConfig(rl=rl), DP, adjust_module=adjust.module)
    res = sampler.sample_given_pocket(
        jax.random.PRNGKey(8), pocket, np.array([5, 7, 6]),
        adjust_params=adjust.params, optimize=True, collect_rl=True)
    assert res.rl_traj is not None
    z_stack, eps_stack = res.rl_traj
    assert z_stack.shape[0] == T
    old = np.asarray(adjust.params["params"]["fc1"]["kernel"]).copy()
    loss, gnorm, reward = sampler.rl_update(adjust, res, pocket)
    assert np.isfinite(loss) and np.isfinite(gnorm)
    new = np.asarray(adjust.params["params"]["fc1"]["kernel"])
    if reward != 0.0:
        assert np.abs(new - old).max() > 0


def test_adjustnet_checkpoint_roundtrip(tmp_path):
    rl = RLConfig(input_dim=13)
    a = AdjustNetState(rl)
    path = str(tmp_path / "adjust.npz")
    a.save(path)
    b = AdjustNetState(rl, key=jax.random.PRNGKey(9))
    b.load(path)
    for k in ("fc1", "fc2"):
        np.testing.assert_allclose(
            np.asarray(a.params["params"][k]["kernel"]),
            np.asarray(b.params["params"][k]["kernel"]))
