"""Checkpoint conversion tests: flax -> torch-style state dict -> flax
roundtrip must be exact, and the high-level DiffNDM API must work from a
YAML config (the reference's own config file)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffndm_tpu.config import EGNNConfig, ModelConfig
from diffndm_tpu.convert import convert_state_dict, export_state_dict
from diffndm_tpu.models.dynamics import EGNNDynamics

REF_YAML = "/root/reference/configs/crossdock_fullatom_cond.yml"


def make_cfg():
    return ModelConfig(
        atom_nf=10, residue_nf=10,
        egnn=EGNNConfig(hidden_nf=8, joint_nf=4, n_layers=2,
                        inv_sublayers=1, attention=True,
                        reflection_equivariant=False))


def test_state_dict_roundtrip():
    cfg = make_cfg()
    module = EGNNDynamics(cfg.egnn, atom_nf=cfg.atom_nf,
                          residue_nf=cfg.residue_nf)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 13)),
                         jnp.zeros((1, 6, 13)), jnp.zeros((1,)),
                         jnp.ones((1, 4)), jnp.ones((1, 6)))
    sd = export_state_dict(params, cfg)
    assert "dynamics.egnn.e_block_0.gcl_0.edge_mlp.0.weight" in sd
    back = convert_state_dict(sd, cfg)

    flat_a = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(params)}
    flat_b = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(back)}
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_allclose(np.asarray(flat_a[k]),
                                   np.asarray(flat_b[k]), atol=1e-7,
                                   err_msg=k)


def test_converted_params_run():
    """Converted parameters must drive the dynamics identically."""
    cfg = make_cfg()
    module = EGNNDynamics(cfg.egnn, atom_nf=cfg.atom_nf,
                          residue_nf=cfg.residue_nf)
    key = jax.random.PRNGKey(1)
    xh_l = jax.random.normal(key, (2, 4, 13))
    xh_p = jax.random.normal(key, (2, 6, 13))
    lm, pm = jnp.ones((2, 4)), jnp.ones((2, 6))
    params = module.init(key, xh_l, xh_p, jnp.zeros((2,)), lm, pm)
    back = convert_state_dict(export_state_dict(params, cfg), cfg)
    a, _ = module.apply(params, xh_l, xh_p, jnp.full((2,), 0.4), lm, pm)
    b, _ = module.apply(back, xh_l, xh_p, jnp.full((2,), 0.4), lm, pm)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.skipif(not os.path.exists(REF_YAML),
                    reason="reference configs not mounted")
def test_model_from_reference_yaml():
    from diffndm_tpu.model import DiffNDM

    model = DiffNDM.from_yaml(REF_YAML)
    assert model.cfg.egnn.hidden_nf == 256
    assert model.cfg.egnn.n_layers == 6
    assert model.cfg.diffusion.timesteps == 500
    assert model.cfg.diffusion.norm_values == (1, 4)
    assert model.cfg.atom_nf == 10  # 'others' column dropped
    assert not model.cfg.egnn.reflection_equivariant
