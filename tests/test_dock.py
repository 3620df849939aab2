"""Native docking search (chem/dock.py) — the qvina2 analogue
(reference analysis/docking.py:53-130) as batched pose optimisation."""

import numpy as np
import pytest

from diffndm_tpu.chem.descriptors import num_rotatable_bonds
from diffndm_tpu.chem.dock import (TorsionTree, dock_molecule,
                                   make_pose_fn, make_score_fn)
from diffndm_tpu.chem.io import read_sdf
from diffndm_tpu.chem.scoring import (W_GAUSS1, W_GAUSS2, W_HBOND,
                                      W_HYDROPHOBIC, W_REPULSION,
                                      VinaScorer)

RIGID_SDF = "/root/reference/example/3rfm_B_CFF.sdf"
RIGID_PDB = "/root/reference/example/3rfm.pdb"
FLEX_SDF = "/root/reference/example/5ndu_C_8V2.sdf"


@pytest.fixture(scope="module")
def rigid():
    mol = read_sdf(RIGID_SDF)[0]
    return mol, VinaScorer.from_pdb(RIGID_PDB)


@pytest.fixture(scope="module")
def flex_mol():
    return read_sdf(FLEX_SDF)[0]


def test_torsion_tree_matches_descriptor_count(flex_mol):
    tree = TorsionTree.from_molecule(flex_mol)
    assert tree.n_rot == num_rotatable_bonds(flex_mol) == 12
    # axis atom a is on the fixed (root) side; b sits ON the axis, so its
    # membership in the moving set is geometrically irrelevant
    for k in range(tree.n_rot):
        a, b = tree.axes[k]
        assert not tree.move[k][a]
        assert tree.move[k][b]
        assert 1 < tree.move[k].sum() < tree.n_atoms


def _dihedral(x, a, b, c, d):
    b1, b2, b3 = x[b] - x[a], x[c] - x[b], x[d] - x[c]
    n1, n2 = np.cross(b1, b2), np.cross(b2, b3)
    m1 = np.cross(n1, b2 / np.linalg.norm(b2))
    return np.arctan2(m1 @ n2, n1 @ n2)


def test_torsion_rotates_dihedral_and_preserves_bonds(flex_mol):
    import jax.numpy as jnp

    mol = flex_mol
    tree = TorsionTree.from_molecule(mol)
    x0 = np.asarray(mol.coords, np.float32)
    pose = make_pose_fn(tree, x0)
    nb = {i: [] for i in range(mol.n_atoms)}
    for i, j, _ in mol.bonds:
        nb[i].append(j)
        nb[j].append(i)
    k = 0
    a, b = tree.axes[k]
    p = [u for u in nb[a] if u != b and not tree.move[k][u]][0]
    q = [u for u in nb[b] if u != a and tree.move[k][u]][0]
    th = np.zeros(tree.n_rot, np.float32)
    th[k] = 0.7
    x1 = np.asarray(pose(jnp.asarray(x0.mean(0)),
                         jnp.asarray([1.0, 0, 0, 0]), jnp.asarray(th)))
    d0 = _dihedral(x0, p, a, b, q)
    d1 = _dihedral(x1, p, a, b, q)
    delta = (d1 - d0 + np.pi) % (2 * np.pi) - np.pi
    assert abs(abs(delta) - 0.7) < 1e-3
    bl0 = np.array([np.linalg.norm(x0[i] - x0[j])
                    for i, j, _ in mol.bonds])
    bl1 = np.array([np.linalg.norm(x1[i] - x1[j])
                    for i, j, _ in mol.bonds])
    assert np.abs(bl0 - bl1).max() < 1e-4


def test_identity_pose_inter_matches_rescoring(rigid):
    import jax.numpy as jnp

    mol, scorer = rigid
    tree = TorsionTree.from_molecule(mol)
    ctr = np.asarray(mol.coords).mean(0)
    _, inter_of, pose = make_score_fn(tree, mol, scorer, ctr, 20.0)
    t = jnp.asarray(ctr)[None]
    q = jnp.asarray([[1.0, 0, 0, 0]])
    th = jnp.zeros((1, tree.n_rot))
    x = np.asarray(pose(t[0], q[0], th[0]))
    assert np.abs(x - np.asarray(mol.coords)).max() < 1e-4
    inter = float(inter_of(t, q, th)[0])
    terms = scorer.interaction_terms(mol)
    ref = (W_GAUSS1 * terms["gauss1"] + W_GAUSS2 * terms["gauss2"]
           + W_REPULSION * terms["repulsion"]
           + W_HYDROPHOBIC * terms["hydrophobic"]
           + W_HBOND * terms["hbond"])
    assert abs(inter - ref) < 2e-3


def test_dock_finds_favourable_pose_and_is_deterministic(rigid):
    mol, scorer = rigid
    res = dock_molecule(mol, scorer, n_restarts=12, steps=40,
                        mc_rounds=0, seed=0)
    # a favourable (negative) pose at least as good as the committed
    # crystal rescoring anchor (-3.918, tests/test_scoring.py)
    assert res.affinity < -3.0
    # box respected: best pose stays near the search centre
    assert np.linalg.norm(res.coords.mean(0)
                          - np.asarray(mol.coords).mean(0)) < 15.0
    res2 = dock_molecule(mol, scorer, n_restarts=12, steps=40,
                         mc_rounds=0, seed=0)
    assert res2.affinity == pytest.approx(res.affinity, abs=1e-5)


def test_torsion_tree_covers_disconnected_fragments():
    """Generated molecules are often fragmented; every fragment's
    rotatable bonds must be parameterised (regression: the BFS used to
    start only from the global largest rigid group, freezing torsions in
    other fragments and skewing the 1 + w*N_rot affinity denominator
    against num_rotatable_bonds)."""
    from diffndm_tpu.chem.mol import Molecule

    # two disconnected butane chains, 50 A apart
    coords = np.zeros((8, 3), np.float32)
    coords[:4, 0] = np.arange(4) * 1.5
    coords[4:, 0] = np.arange(4) * 1.5 + 50.0
    mol = Molecule(symbols=["C"] * 8,
                   bonds=[(0, 1, 1), (1, 2, 1), (2, 3, 1),
                          (4, 5, 1), (5, 6, 1), (6, 7, 1)],
                   coords=coords)
    tree = TorsionTree.from_molecule(mol)
    assert tree.n_rot == num_rotatable_bonds(mol) == 2
    for k in range(tree.n_rot):
        mv = tree.move[k]
        # the moving set stays within the torsion's own fragment
        frag = set(np.where(mv)[0])
        assert frag <= {0, 1, 2, 3} or frag <= {4, 5, 6, 7}


def test_batched_docking_matches_semantics(rigid, flex_mol):
    """dock_molecules buckets by padded shape and runs one jitted
    [M, P] optimisation per bucket; padded torsion axes (a == b) and
    padded intra pairs sit at exactly zero distance, which NaNs the
    gradient through jnp.linalg.norm — _safe_norm keeps it finite
    (regression for the batched-path NaN)."""
    from diffndm_tpu.chem.dock import dock_molecules

    mol, scorer = rigid
    res = dock_molecules([mol, None, flex_mol], scorer, n_restarts=8,
                         steps=30, mc_rounds=0, seed=0)
    assert res[1] is None
    # rigid molecule lands in a bucket with k_pad=4 padded torsions —
    # the NaN regression case; a finite favourable pose must come out
    assert np.isfinite(res[0].affinity) and res[0].affinity < 0.0
    assert res[0].coords.shape == (mol.n_atoms, 3)
    assert np.isfinite(res[0].coords).all()
    # flex_mol is docked against the WRONG receptor here (3rfm); only
    # shape handling is asserted
    assert res[2].coords.shape == (flex_mol.n_atoms, 3)
    assert np.isfinite(res[2].coords).all()
    res2 = dock_molecules([mol, None, flex_mol], scorer, n_restarts=8,
                          steps=30, mc_rounds=0, seed=0)
    assert res2[0].affinity == pytest.approx(res[0].affinity, abs=1e-5)


def test_redock_artifact_claims():
    """Pins the committed redocking artifact (examples/dock_redock.json,
    scripts/dock_redock_eval.py) after the round-5 scoring upgrade
    (typed donor/acceptor + directional hbond):

    - both searches find poses scoring below the crystal rescoring value
      (the search optimises its objective);
    - 3rfm (rigid caffeine): the function holds a near-native local
      minimum — pure local refinement from the crystal stays < 2 A —
      and the global best pose is < 4 A (was 7.87 A in round 4).  The
      residual misranking (a flipped orientation ~0.5 kcal better) is a
      contact-count preference of the published distance-only gauss
      terms; caffeine/3RFM's own crystallographic orientation is weakly
      determined (B-factors ~147).
    - 5ndu (12 rotatable bonds, 91 atoms): best pose < 8 A (was 10.7)."""
    import json
    import os

    art = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "dock_redock.json")
    if not os.path.exists(art):
        pytest.skip("dock_redock.json not generated")
    d = json.load(open(art))
    assert set(d["complexes"]) == {"3rfm", "5ndu"}
    for name, row in d["complexes"].items():
        assert row["improved_over_crystal"], (name, row)
        assert row["docked_affinity"] < row["crystal_score"]
    r3 = d["complexes"]["3rfm"]
    assert r3["crystal_basin_rmsd_A"] < 2.0, r3
    assert r3["rmsd_best_to_crystal_A"] < 4.0, r3
    assert r3["crystal_basin_affinity"] < r3["crystal_score"]
    assert d["complexes"]["5ndu"]["rmsd_best_to_crystal_A"] < 8.0


def test_batch_docking_cli_native_engine(tmp_path):
    """The reference's __main__ batch scorer (docking.py:133-197) with
    the native engine: name-convention receptor lookup + csv/json out."""
    import csv
    import json
    import shutil

    from diffndm_tpu.chem.docking import _main

    rec = tmp_path / "rec"
    sdf = tmp_path / "sdf"
    rec.mkdir()
    sdf.mkdir()
    shutil.copy(RIGID_PDB, rec / "3rfm.pdb")
    shutil.copy(RIGID_SDF, sdf / "3rfm_B_gen.sdf")
    out = tmp_path / "out"
    _main(["--pdbqt_dir", str(rec), "--sdf_dir", str(sdf),
           "--out_dir", str(out), "--write_csv", "--write_dict",
           "--dataset", "moad", "--engine", "native",
           "--restarts", "6"])
    with open(out / "qvina2_scores.csv") as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["receptor", "ligand", "scores"]
    assert len(rows) == 2
    d = json.load(open(out / "qvina2_scores.json"))
    assert "3rfm_B_gen" in d
    assert d["3rfm_B_gen"]["scores"][0] < 0.0
