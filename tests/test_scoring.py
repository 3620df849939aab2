"""Native Vina-style scoring: physics sanity + real-pocket smoke."""

import os

import numpy as np
import pytest

from diffndm_tpu.chem.mol import Molecule
from diffndm_tpu.chem.scoring import VinaScorer, vina_score_like


def _ethane_at(offset):
    return Molecule(["C", "C"], [(0, 1, 1)],
                    coords=np.array([[0.0, 0, 0], [1.5, 0, 0]]) + offset)


@pytest.fixture
def slab_receptor():
    """A carbon slab at z=0 (hydrophobic surface)."""
    xs, ys = np.meshgrid(np.arange(-6, 7, 1.5), np.arange(-6, 7, 1.5))
    coords = np.stack([xs.ravel(), ys.ravel(),
                       np.zeros(xs.size)], axis=-1)
    return VinaScorer(coords, ["C"] * len(coords))


def test_distance_profile(slab_receptor):
    """Clash >> 0; contact < 0; far away ~ 0."""
    clash = slab_receptor.score(_ethane_at([0.0, 0.0, 0.5]))
    contact = slab_receptor.score(_ethane_at([0.0, 0.0, 4.0]))
    far = slab_receptor.score(_ethane_at([0.0, 0.0, 50.0]))
    assert clash > 1.0
    assert contact < -0.1
    assert abs(far) < 1e-9
    assert contact < far < clash


def test_hbond_term_prefers_polar_contact():
    """An N-H...O-style contact scores better than the same geometry with
    carbons."""
    rec_polar = VinaScorer(np.array([[0.0, 0, 0]]), ["O"])
    rec_apolar = VinaScorer(np.array([[0.0, 0, 0]]), ["C"])
    # single nitrogen 2.9 A away (typical H-bond heavy-atom distance)
    amine = Molecule(["N"], [], coords=np.array([[2.9, 0, 0]]))
    assert rec_polar.score(amine) < rec_apolar.score(amine)


def test_rotatable_penalty():
    """More rotatable bonds shrink the magnitude of a favourable score."""
    rec = VinaScorer(np.array([[0.0, 0, -4.0]]), ["C"])
    rigid = Molecule(["C", "C"], [(0, 1, 1)],
                     coords=np.array([[0.0, 0, 0], [1.5, 0, 0]]))
    floppy = Molecule(
        ["C"] * 6, [(i, i + 1, 1) for i in range(5)],
        coords=np.array([[1.5 * i, 0, 0] for i in range(6)]))
    s_rigid, s_floppy = rec.score(rigid), rec.score(floppy)
    # same leading contact; the floppy chain pays the N_rot divisor
    assert s_rigid < 0
    terms_r = rec.interaction_terms(rigid)
    terms_f = rec.interaction_terms(floppy)
    assert terms_f["gauss1"] >= terms_r["gauss1"] - 1e-9
    from diffndm_tpu.chem.descriptors import num_rotatable_bonds

    assert num_rotatable_bonds(floppy) > num_rotatable_bonds(rigid)


@pytest.mark.skipif(not os.path.exists("/root/reference/example/3rfm.pdb"),
                    reason="reference example not mounted")
def test_real_pocket_scores_reference_ligand():
    """The crystallographic ligand (caffeine in 3rfm) must score
    favourably in its own pocket, and much worse when shifted into the
    protein."""
    from diffndm_tpu.chem.io import read_sdf

    lig = read_sdf("/root/reference/example/3rfm_B_CFF.sdf")[0]
    scorer = VinaScorer.from_pdb("/root/reference/example/3rfm.pdb")
    native = scorer.score(lig)
    assert native < -2.0, native  # bound pose is favourable

    shifted = Molecule(lig.symbols, lig.bonds,
                       coords=np.asarray(lig.coords) + [1.5, 1.5, 1.5])
    assert scorer.score(shifted) > native  # clash on displacement

    scores = vina_score_like([lig, None], "/root/reference/example/3rfm.pdb")
    assert scores[0] == native and np.isnan(scores[1])


def test_oracle_affinity_reward_term():
    """With a receptor attached and w_vina set, a clashing pose earns a
    lower reward than a well-placed identical molecule."""
    from diffndm_tpu.constants import dataset_params
    from diffndm_tpu.guidance.oracle import RewardOracle

    rec_coords = np.array([[0.0, 0, 0], [1.5, 0, 0], [3.0, 0, 0]])
    oracle = RewardOracle(dataset_params["crossdock_full"])
    oracle.set_receptor(VinaScorer(rec_coords, ["C", "C", "C"]))

    # same propane twice: once clashing into the receptor, once 4 A away
    def coords_at(z):
        return np.array([[0.0, 0.5, z], [1.5, 0.5, z], [2.3, 1.7, z]],
                        np.float32)

    coords = np.stack([coords_at(0.3), coords_at(4.0)])
    h = np.zeros((2, 3, 10), np.float32)
    h[..., 1] = 1.0  # carbon
    mask = np.ones((2, 3), np.float32)
    weights = (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0)  # pure affinity reward
    r = oracle.score_batch_host(coords, h, mask, weights)
    assert r[1] > r[0], r  # contact pose beats clash
    # w_vina = 0 -> affinity ignored entirely (reference behaviour)
    r0 = oracle.score_batch_host(coords, h, mask,
                                 (0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    np.testing.assert_allclose(r0, 0.0)
