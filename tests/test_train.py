"""Training tests: loss decreases on a tiny overfitting task, adaptive
clipping, multi-device data parallelism on the virtual CPU mesh,
checkpoint roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffndm_tpu.config import (DiffusionConfig, EGNNConfig, TrainConfig)
from diffndm_tpu.constants import dataset_params
from diffndm_tpu.diffusion import schedules as S
from diffndm_tpu.diffusion.core import CondDiffusion
from diffndm_tpu.models.dynamics import EGNNDynamics
from diffndm_tpu.parallel.mesh import make_mesh
from diffndm_tpu.structs import NodeBatch
from diffndm_tpu.train.trainer import Trainer

ATOM_NF = 10
T = 20
B, NL, NP = 8, 8, 16
DP = dataset_params["crossdock_full"]


def make_batch(key):
    kl, kp, kh = jax.random.split(key, 3)
    ligand = NodeBatch(
        x=jax.random.normal(kl, (B, NL, 3)),
        h=jax.nn.one_hot(jax.random.randint(kh, (B, NL), 0, 4), ATOM_NF),
        mask=jnp.ones((B, NL)))
    pocket = NodeBatch(
        x=jax.random.normal(kp, (B, NP, 3)) * 2,
        h=jax.nn.one_hot(jax.random.randint(kp, (B, NP), 0, 4), ATOM_NF),
        mask=jnp.ones((B, NP)))
    return ligand, pocket


@pytest.fixture(scope="module")
def trainer():
    cfg = EGNNConfig(hidden_nf=16, joint_nf=8, n_layers=1, row_tile=16,
                     attention=False, reflection_equivariant=True)
    module = EGNNDynamics(cfg, atom_nf=ATOM_NF, residue_nf=ATOM_NF)
    key = jax.random.PRNGKey(0)
    params = module.init(key, jnp.zeros((1, NL, 13)), jnp.zeros((1, NP, 13)),
                         jnp.zeros((1,)), jnp.ones((1, NL)),
                         jnp.ones((1, NP)))
    core = CondDiffusion(S.make_schedule("polynomial_2", T, 5e-4),
                         DiffusionConfig(timesteps=T), ATOM_NF, ATOM_NF)
    tcfg = TrainConfig(lr=1e-3, accumulate_grad_batches=1,
                       auxiliary_loss=True)
    return Trainer(core, module, params, tcfg,
                   lj_rm=DP["lennard_jones_rm"])


def test_multi_device_mesh(trainer):
    assert trainer.mesh.devices.size == 8  # virtual CPU mesh from conftest


def test_loss_decreases(trainer):
    ligand, pocket = make_batch(jax.random.PRNGKey(1))
    losses = []
    for i in range(30):
        loss, info = trainer.train_step(jax.random.PRNGKey(i), ligand,
                                        pocket)
        losses.append(loss)
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    assert "grad_norm" in info and np.isfinite(info["grad_norm"])
    assert "clip_threshold" in info


def test_cross_term_finite_grads_with_padding():
    """Regression: the reflection-breaking cross-product term
    (egnn.py, cf. egnn_new.py:305-310) hit jnp.linalg.norm's NaN
    gradient at 0 whenever a padded node pair made cross(va, vb)
    exactly zero — padded rows sit at the origin, so va == vb == -ctr.
    The reference never evaluates such pairs (flat edge lists); the
    padded dense design must guard the backward instead."""
    cfg = EGNNConfig(hidden_nf=16, joint_nf=8, n_layers=1, row_tile=16,
                     attention=True, reflection_equivariant=False)
    module = EGNNDynamics(cfg, atom_nf=ATOM_NF, residue_nf=ATOM_NF)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, NL, 13)),
                         jnp.zeros((1, NP, 13)), jnp.zeros((1,)),
                         jnp.ones((1, NL)), jnp.ones((1, NP)))
    core = CondDiffusion(S.make_schedule("polynomial_2", T, 5e-4),
                         DiffusionConfig(timesteps=T), ATOM_NF, ATOM_NF)
    trainer = Trainer(core, module, params, TrainConfig(lr=1e-3),
                      lj_rm=DP["lennard_jones_rm"])
    ligand, pocket = make_batch(jax.random.PRNGKey(4))
    # off-center system with padded tail rows (coords zeroed): the exact
    # configuration that zeroed the cross product
    lig_mask = jnp.asarray(np.repeat([[1.0] * (NL - 3) + [0.0] * 3], B, 0))
    poc_mask = jnp.asarray(np.repeat([[1.0] * (NP - 5) + [0.0] * 5], B, 0))
    ligand = NodeBatch(x=(ligand.x + 5.0) * lig_mask[..., None],
                       h=ligand.h * lig_mask[..., None], mask=lig_mask)
    pocket = NodeBatch(x=(pocket.x + 5.0) * poc_mask[..., None],
                       h=pocket.h * poc_mask[..., None], mask=poc_mask)
    loss, info = trainer.train_step(jax.random.PRNGKey(5), ligand, pocket)
    assert np.isfinite(loss)
    assert np.isfinite(info["grad_norm"])


def test_eval_step(trainer):
    ligand, pocket = make_batch(jax.random.PRNGKey(2))
    loss, info = trainer.eval_step(jax.random.PRNGKey(3), ligand, pocket)
    assert np.isfinite(loss)


def test_learned_gamma_receives_gradients():
    """With noise_schedule='learned' the GammaNetwork params must be part
    of the optimized tree (reference trains it inside the module,
    en_diffusion.py:37-38) — they must CHANGE after a train step."""
    from diffndm_tpu.diffusion.learned_gamma import make_learned_gamma

    cfg = EGNNConfig(hidden_nf=16, joint_nf=8, n_layers=1, row_tile=16,
                     attention=False, reflection_equivariant=True)
    module = EGNNDynamics(cfg, atom_nf=ATOM_NF, residue_nf=ATOM_NF)
    key = jax.random.PRNGKey(0)
    params = module.init(key, jnp.zeros((1, NL, 13)),
                         jnp.zeros((1, NP, 13)), jnp.zeros((1,)),
                         jnp.ones((1, NL)), jnp.ones((1, NP)))
    sched = make_learned_gamma(T, key)
    core = CondDiffusion(sched,
                         DiffusionConfig(timesteps=T, loss_type="vlb",
                                         noise_schedule="learned"),
                         ATOM_NF, ATOM_NF)
    trainer = Trainer(core, module,
                      {"dynamics": params, "gamma": sched.params},
                      TrainConfig(lr=1e-2, accumulate_grad_batches=1),
                      gamma_module=sched.module)
    ligand, pocket = make_batch(jax.random.PRNGKey(4))
    g0 = jax.device_get(trainer.state.params["gamma"])
    loss, _ = trainer.train_step(jax.random.PRNGKey(5), ligand, pocket)
    assert np.isfinite(loss)
    g1 = jax.device_get(trainer.state.params["gamma"])
    moved = jax.tree.map(lambda a, b: not np.allclose(a, b), g0, g1)
    assert any(jax.tree.leaves(moved)), "gamma params did not move"


def test_checkpoint_roundtrip(trainer, tmp_path):
    path = str(tmp_path / "ckpt")
    trainer.save_checkpoint(path)
    before = jax.device_get(trainer.state.params)
    # perturb then restore
    trainer.state = trainer.state._replace(
        params=jax.tree.map(lambda p: p + 1.0, trainer.state.params))
    trainer.load_checkpoint(path)
    after = jax.device_get(trainer.state.params)
    chk = jax.tree.map(np.allclose, before, after)
    assert all(jax.tree.leaves(chk))
