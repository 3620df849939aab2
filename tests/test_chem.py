"""Chemistry-oracle tests: bond perception, sanitize, descriptors against
known RDKit anchor values, QED/SA/Lipinski behaviour, fingerprints, I/O."""

import math

import numpy as np
import pytest

from diffndm_tpu.chem.bonds import bond_order_matrix, build_molecule
from diffndm_tpu.chem.descriptors import (crippen_logp, num_hba, num_hbd,
                                          num_rotatable_bonds, tpsa)
from diffndm_tpu.chem.fingerprints import similarity, wl_canonical_key
from diffndm_tpu.chem.io import mol_to_sdf_block, read_sdf, write_sdf
from diffndm_tpu.chem.metrics import (BasicMolecularMetrics,
                                      MoleculeProperties)
from diffndm_tpu.chem.mol import Molecule
from diffndm_tpu.chem.properties import lipinski_count, qed, sa_score
from diffndm_tpu.chem.sanitize import is_valid, process_molecule
from diffndm_tpu.constants import dataset_params

DP = dataset_params["crossdock_full"]
C, N, O = 0, 1, 2


def hexagon(r=1.39):
    ang = np.linspace(0, 2 * np.pi, 7)[:6]
    return np.stack([r * np.cos(ang), r * np.sin(ang), np.zeros(6)], 1)


@pytest.fixture
def benzene():
    return build_molecule(hexagon(), np.zeros(6, int), DP)


def test_benzene_perception(benzene):
    assert sorted(o for _, _, o in benzene.bonds) == [1, 1, 1, 2, 2, 2]
    assert len(benzene.aromatic_rings) == 1
    assert all(benzene.implicit_h(i) == 1 for i in range(6))
    assert is_valid(benzene)


def test_benzene_descriptors(benzene):
    # RDKit: MolLogP=1.6866, ExactMolWt=78.047, TPSA=0
    assert abs(crippen_logp(benzene) - 1.687) < 0.01
    assert abs(benzene.mol_weight - 78.047) < 0.01
    assert tpsa(benzene) == 0.0
    assert num_hbd(benzene) == 0 and num_hba(benzene) == 0


def test_pyridine(benzene):
    mol = build_molecule(hexagon(), np.array([N, C, C, C, C, C]), DP)
    # RDKit: MolLogP=1.08, TPSA=12.89
    assert abs(crippen_logp(mol) - 1.08) < 0.02
    assert abs(tpsa(mol) - 12.89) < 0.01
    assert num_hba(mol) == 1 and num_hbd(mol) == 0


def test_phenol():
    coords = np.vstack([hexagon(), hexagon()[0] * (2.75 / 1.39)])
    mol = build_molecule(coords, np.array([C] * 6 + [O]), DP)
    # RDKit: MolLogP=1.3922, TPSA=20.23, HBD=1
    assert abs(crippen_logp(mol) - 1.392) < 0.02
    assert abs(tpsa(mol) - 20.23) < 0.01
    assert num_hbd(mol) == 1


def test_acetic_acid():
    coords = np.array([[0, 0, 0], [1.52, 0, 0], [2.12, 1.05, 0],
                       [2.12, -1.13, 0]])
    mol = build_molecule(coords, np.array([C, C, O, O]), DP)
    # one C=O double bond perceived, OH single
    assert sorted(o for _, _, o in mol.bonds) == [1, 1, 2]
    # RDKit: MolLogP=0.0909
    assert abs(crippen_logp(mol) - 0.09) < 0.05
    assert num_hbd(mol) == 1 and num_hba(mol) == 2


def test_ethanol_logp():
    coords = np.array([[0, 0, 0], [1.54, 0, 0], [2.3, 1.2, 0]])
    mol = build_molecule(coords, np.array([C, C, O]), DP)
    # RDKit: MolLogP=-0.0014
    assert abs(crippen_logp(mol) - (-0.0014)) < 0.01
    assert num_rotatable_bonds(mol) == 0  # terminal bonds don't rotate


def test_valence_violation_invalid():
    # 5 carbons all within bonding distance of a central carbon with
    # pairwise double-bond distances -> impossible valence
    mol = Molecule(["C", "O", "O", "O"],
                   [(0, 1, 2), (0, 2, 2), (0, 3, 2)])
    assert not is_valid(mol)


def test_perception_respects_valence():
    # three O at double-bond distance from one C: blind EDM would assign
    # three C=O (valence 6); perception must keep C <= 4
    coords = np.array([[0, 0, 0], [1.2, 0, 0], [-0.6, 1.04, 0],
                       [-0.6, -1.04, 0]])
    mol = build_molecule(coords, np.array([C, O, O, O]), DP)
    assert mol.bond_order_sum(0) <= 4
    edm = bond_order_matrix(coords, np.array([C, O, O, O]), DP)
    assert edm[0].sum() == 6  # the blind rule does over-assign


def test_qed_range_and_ordering(benzene):
    # toluene-like ring scores a plausible QED; a bare C2 fragment is worse
    q_ring = qed(benzene)
    tiny = Molecule(["C", "C"], [(0, 1, 1)])
    assert 0.2 < q_ring < 0.6
    assert qed(tiny) < q_ring


def test_sa_score_ordering(benzene):
    simple = sa_score(benzene)
    # spiro + bridged cage should be harder than benzene
    cage = Molecule(["C"] * 7,
                    [(0, 1, 1), (1, 2, 1), (2, 0, 1), (2, 3, 1), (3, 4, 1),
                     (4, 2, 1), (4, 5, 1), (5, 6, 1), (6, 4, 1)])
    assert 0 <= sa_score(cage) < simple <= 1.0


def test_lipinski(benzene):
    assert lipinski_count(benzene) == 5
    # walrus-compat: huge logp still passes rule 4 under compat mode
    greasy = Molecule(["C"] * 30,
                      [(i, i + 1, 1) for i in range(29)])
    assert lipinski_count(greasy, compat_walrus=True) >= \
        lipinski_count(greasy, compat_walrus=False)


def test_fingerprint_similarity(benzene):
    other = build_molecule(hexagon(), np.array([N, C, C, C, C, C]), DP)
    assert similarity(benzene, benzene) == 1.0
    assert similarity(benzene, other) < 1.0
    assert wl_canonical_key(benzene) != wl_canonical_key(other)
    # isomorphic relabeling maps to the same key
    perm = build_molecule(hexagon()[::-1], np.zeros(6, int), DP)
    assert wl_canonical_key(benzene) == wl_canonical_key(perm)


def test_metrics_pipeline(benzene):
    props = MoleculeProperties()
    qeds, sas, logps, lips = props.evaluate_new([[benzene, None]])
    assert len(qeds[0]) == 2
    assert qeds[0][1] == 0  # invalid molecule gets 0 reward
    basic = BasicMolecularMetrics(DP)
    (validity, connectivity, uniq, novelty), _ = basic.evaluate_rdmols(
        [benzene, benzene])
    assert validity == 1.0 and connectivity == 1.0
    assert uniq == 0.5


def test_sdf_roundtrip(benzene, tmp_path):
    path = str(tmp_path / "out.sdf")
    write_sdf(path, [benzene])
    back = read_sdf(path)
    assert len(back) == 1
    assert back[0].symbols == benzene.symbols
    assert sorted(o for _, _, o in back[0].bonds) == \
        sorted(o for _, _, o in benzene.bonds)
    np.testing.assert_allclose(back[0].coords, benzene.coords, atol=1e-3)


def test_process_molecule_fragments():
    # two disconnected fragments; largest_frag keeps the bigger one
    coords = np.array([[0, 0, 0], [1.5, 0, 0], [3.0, 0, 0],
                       [50, 50, 50]])
    mol = build_molecule(coords, np.array([C, C, C, C]), DP)
    out = process_molecule(mol, sanitize_flag=True, largest_frag=True)
    assert out is not None and out.n_atoms == 3
