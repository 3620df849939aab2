"""Sorted-band sparsity: banded message passing must match the dense
path exactly when the window satisfies the 1-D projection bound."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffndm_tpu.config import EGNNConfig
from diffndm_tpu.models.banding import (band_halfwidth_atoms,
                                        principal_axis_order)
from diffndm_tpu.models.dynamics import EGNNDynamics

FEAT = 6
B, NL, NP = 2, 8, 48


def _protein_like_pocket(rng, b, n):
    """Elongated point cloud (distinct principal axis)."""
    x = rng.normal(size=(b, n, 3)).astype(np.float32)
    x[..., 0] *= 6.0  # stretch along x
    x[..., 1:] *= 2.0
    return x


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    xh_lig = rng.normal(size=(B, NL, 3 + FEAT)).astype(np.float32)
    xh_poc = np.concatenate(
        [_protein_like_pocket(rng, B, NP),
         rng.normal(size=(B, NP, FEAT)).astype(np.float32)], -1)
    t = np.array([0.3, 0.7], np.float32)
    lm = (np.arange(NL)[None] < np.array([[6], [8]])).astype(np.float32)
    pm = (np.arange(NP)[None] < np.array([[40], [48]])).astype(np.float32)
    return tuple(jnp.asarray(a)
                 for a in (xh_lig, xh_poc, t, lm, pm))


def test_principal_axis_order_sorts_real_atoms_first():
    rng = np.random.default_rng(1)
    x = jnp.asarray(_protein_like_pocket(rng, 1, 16))
    mask = jnp.asarray((np.arange(16) < 12).astype(np.float32))[None]
    order, proj = principal_axis_order(x, mask)
    taken = np.asarray(jnp.take_along_axis(mask, order, axis=1))
    # real atoms first, padding last
    assert (taken[0, :12] == 1).all() and (taken[0, 12:] == 0).all()
    p = np.asarray(jnp.take_along_axis(proj, order, axis=1))[0, :12]
    assert (np.diff(p) >= 0).all()


def test_band_halfwidth_bound():
    rng = np.random.default_rng(2)
    x = _protein_like_pocket(rng, 2, 64)
    m = np.ones((2, 64), np.float32)
    h = band_halfwidth_atoms(x, m, cutoff=5.0)
    assert 0 < h < 64


@pytest.mark.parametrize("reflection", [True, False])
def test_banded_matches_dense(inputs, reflection):
    xh_lig, xh_poc, t, lm, pm = inputs
    base = EGNNConfig(hidden_nf=16, joint_nf=8, n_layers=2,
                      inv_sublayers=1, attention=True, tanh=True,
                      reflection_equivariant=reflection,
                      edge_cutoff_ligand=None, edge_cutoff_pocket=5.0,
                      edge_cutoff_interaction=5.0, row_tile=8)
    # window wide enough for exactness: (W - tile)/2 >= halfwidth
    hw = band_halfwidth_atoms(np.asarray(xh_poc)[..., :3],
                              np.asarray(pm), 5.0)
    W = min(2 * hw + base.row_tile + 2, NP - 1)
    banded_cfg = dataclasses.replace(base, band_window=W)

    dense = EGNNDynamics(base, atom_nf=FEAT, residue_nf=FEAT)
    banded = EGNNDynamics(banded_cfg, atom_nf=FEAT, residue_nf=FEAT)
    params = dense.init(jax.random.PRNGKey(0), xh_lig, xh_poc, t, lm, pm)

    out_d = dense.apply(params, xh_lig, xh_poc, t, lm, pm)
    out_b = banded.apply(params, xh_lig, xh_poc, t, lm, pm)
    for d, b_ in zip(out_d, out_b):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(d),
                                   atol=2e-5, rtol=1e-4)


def test_banded_jit_compiles(inputs):
    xh_lig, xh_poc, t, lm, pm = inputs
    cfg = EGNNConfig(hidden_nf=16, joint_nf=8, n_layers=1,
                     inv_sublayers=1, attention=False,
                     reflection_equivariant=True, row_tile=8,
                     band_window=24)
    mod = EGNNDynamics(cfg, atom_nf=FEAT, residue_nf=FEAT)
    params = mod.init(jax.random.PRNGKey(0), xh_lig, xh_poc, t, lm, pm)
    out = jax.jit(lambda *a: mod.apply(params, *a))(
        xh_lig, xh_poc, t, lm, pm)
    assert np.isfinite(np.asarray(out[0])).all()


def test_enable_banding_end_to_end():
    """DiffNDM.enable_banding picks an exact window and samples match the
    dense model to fp-reordering tolerance."""
    import jax

    from diffndm_tpu.config import (DiffusionConfig, EGNNConfig,
                                    ModelConfig)
    from diffndm_tpu.model import DiffNDM
    from diffndm_tpu.structs import NodeBatch

    rng = np.random.default_rng(5)
    cfg = ModelConfig(
        egnn=EGNNConfig(hidden_nf=16, joint_nf=8, n_layers=1,
                        inv_sublayers=1, attention=False,
                        reflection_equivariant=True, row_tile=8),
        diffusion=DiffusionConfig(timesteps=6))
    model = DiffNDM(cfg)
    # long pocket so a window is actually narrower than the full width
    x = rng.normal(size=(2, 128, 3)).astype(np.float32)
    x[..., 0] *= 12.0
    x[..., 1:] *= 2.0
    pocket = NodeBatch(
        x=jnp.asarray(x),
        h=jnp.asarray(np.eye(10, dtype=np.float32)[
            rng.integers(0, 4, (2, 128))]),
        mask=jnp.ones((2, 128)))
    sizes = np.array([5, 7])
    r_dense = model.sampler.sample_given_pocket(jax.random.PRNGKey(4),
                                                pocket, sizes)
    w = model.enable_banding(pocket)
    assert w > 0 and model.cfg.egnn.band_window == w
    r_band = model.sampler.sample_given_pocket(jax.random.PRNGKey(4),
                                               pocket, sizes)
    np.testing.assert_allclose(np.asarray(r_band.ligand.x),
                               np.asarray(r_dense.ligand.x),
                               atol=5e-3, rtol=1e-3)


def test_banded_joint_mode_matches_dense(inputs):
    """update_pocket_coords=True (joint model): the zero-COM projection
    must use the caller's row order after un-permutation."""
    xh_lig, xh_poc, t, lm, pm = inputs
    base = EGNNConfig(hidden_nf=16, joint_nf=8, n_layers=1,
                      inv_sublayers=1, attention=False,
                      reflection_equivariant=True, row_tile=8,
                      update_pocket_coords=True,
                      edge_cutoff_pocket=5.0, edge_cutoff_interaction=5.0)
    hw = band_halfwidth_atoms(np.asarray(xh_poc)[..., :3],
                              np.asarray(pm), 5.0)
    W = min(2 * hw + base.row_tile + 2, NP - 1)
    dense = EGNNDynamics(base, atom_nf=FEAT, residue_nf=FEAT)
    banded = EGNNDynamics(dataclasses.replace(base, band_window=W),
                          atom_nf=FEAT, residue_nf=FEAT)
    params = dense.init(jax.random.PRNGKey(1), xh_lig, xh_poc, t, lm, pm)
    out_d = dense.apply(params, xh_lig, xh_poc, t, lm, pm)
    out_b = banded.apply(params, xh_lig, xh_poc, t, lm, pm)
    for d, b_ in zip(out_d, out_b):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(d),
                                   atol=2e-5, rtol=1e-4)


def test_ensure_band_revalidates_per_pocket():
    """A sweep's later pocket with a wider halfwidth must widen (or drop)
    the band — the first pocket's window must never silently truncate a
    harder pocket's neighbourhoods."""
    import jax

    from diffndm_tpu.config import (DiffusionConfig, EGNNConfig,
                                    ModelConfig)
    from diffndm_tpu.model import DiffNDM
    from diffndm_tpu.structs import NodeBatch

    rng = np.random.default_rng(7)
    cfg = ModelConfig(
        egnn=EGNNConfig(hidden_nf=16, joint_nf=8, n_layers=1,
                        inv_sublayers=1, attention=False,
                        reflection_equivariant=True, row_tile=8),
        diffusion=DiffusionConfig(timesteps=4))

    def pocket_with_stretch(stretch, n=128):
        x = rng.normal(size=(2, n, 3)).astype(np.float32)
        x[..., 0] *= stretch
        x[..., 1:] *= 2.0
        return NodeBatch(
            x=jnp.asarray(x),
            h=jnp.asarray(np.eye(10, dtype=np.float32)[
                rng.integers(0, 4, (2, n))]),
            mask=jnp.ones((2, n)))

    model = DiffNDM(cfg)
    easy = pocket_with_stretch(14.0)   # elongated -> narrow exact window
    hard = pocket_with_stretch(5.0)    # blob -> wider window needed
    w_easy = model.ensure_band_for(easy)
    assert w_easy > 0
    w_hard = model.ensure_band_for(hard)
    # either widened or dropped to dense — never kept too narrow
    if w_hard > 0:
        from diffndm_tpu.models.banding import band_halfwidth_atoms

        hw = band_halfwidth_atoms(np.asarray(hard.x),
                                  np.asarray(hard.mask), 5.0)
        assert w_hard >= 2 * hw + model.cfg.egnn.row_tile
    else:
        assert model.cfg.egnn.band_window is None
    # the easy pocket still validates under the new state
    assert model.ensure_band_for(easy) >= 0


def test_band_approx_env_caps_window(monkeypatch):
    """DIFFNDM_BAND_APPROX caps the auto window below the exact bound
    (opt-in speed knob, round-3 measured in NOTES_NEXT_ROUND.md); empty
    string behaves as unset."""
    import jax

    from diffndm_tpu.config import (DiffusionConfig, EGNNConfig,
                                    ModelConfig)
    from diffndm_tpu.model import DiffNDM
    from diffndm_tpu.structs import NodeBatch

    rng = np.random.default_rng(6)
    cfg = ModelConfig(
        egnn=EGNNConfig(hidden_nf=16, joint_nf=8, n_layers=1,
                        inv_sublayers=1, attention=False,
                        reflection_equivariant=True, row_tile=8),
        diffusion=DiffusionConfig(timesteps=6))
    model = DiffNDM(cfg)
    x = rng.normal(size=(1, 128, 3)).astype(np.float32)
    x[..., 0] *= 12.0
    x[..., 1:] *= 2.0
    pocket = NodeBatch(
        x=jnp.asarray(x),
        h=jnp.asarray(np.eye(10, dtype=np.float32)[
            rng.integers(0, 4, (1, 128))]),
        mask=jnp.ones((1, 128)))
    monkeypatch.setenv("DIFFNDM_BAND_APPROX", "")
    w_exact = model.enable_banding(pocket)
    assert w_exact > 32
    monkeypatch.setenv("DIFFNDM_BAND_APPROX", "32")
    w_capped = model.enable_banding(pocket)
    assert w_capped == 32


def test_large_real_pocket_band_exactness_np512():
    """NP >= 512 with REAL protein geometry (VERDICT r3 #6): the 5ndu
    structure at a 12 A extraction radius yields a 482-atom full-atom
    pocket (padded 512).  ensure_band_for must pick a window satisfying
    the 1-D projection bound, and the banded forward must match dense to
    float tolerance at that window."""
    import os

    from diffndm_tpu.config import DiffusionConfig, ModelConfig
    from diffndm_tpu.data.pdb import parse_pdb
    from diffndm_tpu.data.pocket import (get_pocket_from_ligand,
                                         prepare_pocket)
    from diffndm_tpu.constants import dataset_params
    from diffndm_tpu.model import DiffNDM
    from diffndm_tpu.structs import NodeBatch

    pdb = "/root/reference/example/5ndu.pdb"
    sdf = "/root/reference/example/5ndu_C_8V2.sdf"
    if not os.path.exists(pdb):
        pytest.skip("reference example structures not mounted")
    enc = {k: v for k, v in
           dataset_params["crossdock_full"]["atom_encoder"].items()
           if v < 10}
    residues = get_pocket_from_ligand(parse_pdb(pdb), sdf, 12.0)
    pocket = prepare_pocket(residues, enc, "full-atom", repeats=2,
                            pad_multiple=64)
    n_real = int(np.asarray(pocket.mask).sum(1)[0])
    npad = pocket.x.shape[1]
    assert n_real >= 450 and npad >= 512, (n_real, npad)

    cfg = ModelConfig(
        egnn=EGNNConfig(hidden_nf=16, joint_nf=8, n_layers=2,
                        inv_sublayers=1, attention=True, tanh=True,
                        reflection_equivariant=False,
                        edge_cutoff_pocket=5.0,
                        edge_cutoff_interaction=5.0, row_tile=8),
        diffusion=DiffusionConfig(timesteps=4))
    model = DiffNDM(cfg)
    w = model.ensure_band_for(pocket)
    hw = band_halfwidth_atoms(np.asarray(pocket.x),
                              np.asarray(pocket.mask), 5.0)
    assert w > 0, "banding must engage on a 512-pad pocket"
    assert w >= 2 * hw + cfg.egnn.row_tile, (w, hw)
    assert w < npad, "window must actually be sparse"

    # exactness: banded forward == dense forward on real geometry
    nl = 16
    rng = np.random.default_rng(3)
    xh_lig = jnp.asarray(rng.normal(size=(2, nl, 13)).astype(np.float32))
    xh_poc = jnp.concatenate(
        [pocket.x, pocket.h[..., :10]], -1)
    t = jnp.asarray([0.4, 0.6], jnp.float32)
    lm = jnp.ones((2, nl))
    banded_cfg = model.cfg.egnn
    dense_cfg = dataclasses.replace(banded_cfg, band_window=None)
    dense = EGNNDynamics(dense_cfg, atom_nf=10, residue_nf=10)
    banded = EGNNDynamics(banded_cfg, atom_nf=10, residue_nf=10)
    params = dense.init(jax.random.PRNGKey(0), xh_lig, xh_poc, t, lm,
                        pocket.mask)
    out_d = dense.apply(params, xh_lig, xh_poc, t, lm, pocket.mask)
    out_b = banded.apply(params, xh_lig, xh_poc, t, lm, pocket.mask)
    for d, b_ in zip(out_d, out_b):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(d),
                                   atol=2e-5, rtol=1e-4)
