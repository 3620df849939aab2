"""Virtual-node transform, decode stripping, and the frame-dump tap."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from diffndm_tpu.config import (DiffusionConfig, EGNNConfig, SampleConfig)
from diffndm_tpu.constants import dataset_params
from diffndm_tpu.data.dataset import LigandPocketPair
from diffndm_tpu.data.virtual import AppendVirtualNodes, strip_virtual_nodes
from diffndm_tpu.diffusion import schedules as S
from diffndm_tpu.diffusion.core import CondDiffusion
from diffndm_tpu.diffusion.sampler import (ConditionalSampler,
                                           make_sdf_frame_tap)
from diffndm_tpu.models.dynamics import EGNNDynamics
from diffndm_tpu.structs import NodeBatch

DP11 = dataset_params["crossdock_full"]


def test_append_virtual_nodes(rng):
    pair = LigandPocketPair(
        rng.normal(size=(6, 3)).astype(np.float32),
        np.eye(10, dtype=np.float32)[rng.integers(0, 4, 6)],
        rng.normal(size=(12, 3)).astype(np.float32),
        np.eye(10, dtype=np.float32)[rng.integers(0, 4, 12)])
    tr = AppendVirtualNodes(10, DP11["atom_encoder"], "others")
    out = tr(pair)
    assert out.lig_coords.shape == (10, 3)
    assert out.lig_one_hot.shape == (10, 11)  # virtual column inserted
    vidx = DP11["atom_encoder"]["others"]
    assert out.lig_one_hot[6:, vidx].all()
    assert out.lig_one_hot[:6, vidx].sum() == 0


def test_strip_virtual_nodes():
    h = jnp.asarray(np.eye(11, dtype=np.float32)[[0, 1, 10, 2]])[None]
    batch = NodeBatch(x=jnp.ones((1, 4, 3)), h=h, mask=jnp.ones((1, 4)))
    out = strip_virtual_nodes(batch, vidx=10)
    assert float(out.mask.sum()) == 3
    assert float(out.x[0, 2].sum()) == 0


def test_frame_tap(tmp_path):
    T, B, NL, NP = 6, 2, 8, 12
    cfg = EGNNConfig(hidden_nf=16, joint_nf=8, n_layers=1, row_tile=16,
                     attention=False, reflection_equivariant=True)
    module = EGNNDynamics(cfg, atom_nf=10, residue_nf=10)
    key = jax.random.PRNGKey(0)
    params = module.init(key, jnp.zeros((1, NL, 13)),
                         jnp.zeros((1, NP, 13)), jnp.zeros((1,)),
                         jnp.ones((1, NL)), jnp.ones((1, NP)))
    core = CondDiffusion(S.make_schedule("polynomial_2", T, 5e-4),
                         DiffusionConfig(timesteps=T), 10, 10)
    pocket = NodeBatch(
        x=jax.random.normal(key, (B, NP, 3)) * 2 + 5,
        h=jax.nn.one_hot(jax.random.randint(key, (B, NP), 0, 4), 10),
        mask=jnp.ones((B, NP)))
    sampler = ConditionalSampler(core, module, params, SampleConfig(),
                                 DP11)
    out_dir = str(tmp_path / "frames")
    sampler.set_frame_tap(make_sdf_frame_tap(out_dir, DP11, core, every=2))
    sampler.sample_given_pocket(jax.random.PRNGKey(1), pocket,
                                np.array([5, 6]))
    frames = sorted(os.listdir(out_dir))
    assert "try_0.sdf" in frames and "try_2.sdf" in frames
