"""CA pocket representation end to end (half the reference configs use
it: residues become single C-alpha nodes with 20-dim amino-acid one-hots)
plus constructibility of every committed config."""

import glob
import os

import jax
import numpy as np
import pytest

from diffndm_tpu.config import (DiffusionConfig, EGNNConfig, ModelConfig,
                                SampleConfig)
from diffndm_tpu.model import DiffNDM

EXAMPLE = "/root/reference/example"


@pytest.mark.skipif(not os.path.exists(EXAMPLE + "/3rfm.pdb"),
                    reason="reference example not mounted")
def test_ca_mode_generation_end_to_end(monkeypatch):
    monkeypatch.setenv("DIFFNDM_AUTO_BAND", "0")
    cfg = ModelConfig(
        dataset="crossdock",
        pocket_representation="CA",
        atom_nf=10, residue_nf=20,
        egnn=EGNNConfig(hidden_nf=16, joint_nf=8, n_layers=1,
                        inv_sublayers=1, attention=False,
                        reflection_equivariant=True, row_tile=16),
        diffusion=DiffusionConfig(timesteps=6))
    model = DiffNDM(cfg, sample_cfg=SampleConfig(lig_pad_multiple=8,
                                                 pocket_pad_multiple=16))
    pocket = model.pocket_from_pdb(EXAMPLE + "/3rfm.pdb",
                                   EXAMPLE + "/3rfm_B_CFF.sdf", 3)
    # CA mode: far fewer nodes than full-atom (one per residue), 20-dim h
    assert pocket.h.shape[-1] == 20
    assert int(np.asarray(pocket.mask).sum(1).max()) < 80
    mols, _ = model.generate_ligands(EXAMPLE + "/3rfm.pdb", 3,
                                     EXAMPLE + "/3rfm_B_CFF.sdf",
                                     key=jax.random.PRNGKey(0),
                                     timesteps=6)
    assert len(mols) == 3 and any(m is not None for m in mols)


def test_all_committed_configs_construct():
    """Every configs/*.yml must produce a constructible DiffNDM — the
    README quickstart's promise for all 8 reference configurations."""
    from diffndm_tpu.config import load_yaml, model_config_from_yaml

    paths = sorted(glob.glob(
        os.path.join(os.path.dirname(__file__), "..", "configs", "*.yml")))
    # 8 reference configurations + the virtual-pocket training demo
    assert len(paths) >= 8
    for path in paths:
        mcfg = model_config_from_yaml(load_yaml(path))
        # shrink the net so the init stays fast; the mapping itself (mode,
        # dataset, feature dims, cutoffs, norm values) is what's under test
        import dataclasses as dc

        small = dc.replace(mcfg, egnn=dc.replace(
            mcfg.egnn, hidden_nf=16, joint_nf=8, n_layers=1))
        model = DiffNDM(small)
        assert model.cfg.diffusion.timesteps == 500, path
        if "joint" in path:
            assert model.joint_sampler is not None, path
