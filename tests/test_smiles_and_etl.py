"""SMILES parser, MOAD QED filter, fixed-name splits + test-set export,
and the PDB-atom-name inpaint substructure mode."""

import os

import numpy as np
import pytest

from diffndm_tpu.chem.properties import qed
from diffndm_tpu.chem.smiles import SmilesError, parse_smiles


# ---------------------------------------------------------------------------
# SMILES parsing
# ---------------------------------------------------------------------------

def test_parse_basic_molecules():
    m = parse_smiles("CCO")  # ethanol
    assert m.symbols == ["C", "C", "O"]
    assert sorted((i, j) for i, j, _ in m.bonds) == [(0, 1), (1, 2)]
    assert m.implicit_h(2) == 1

    m = parse_smiles("C=C")  # ethene
    assert m.bonds[0][2] == 2
    m = parse_smiles("C#N")  # hydrogen cyanide
    assert m.bonds[0][2] == 3


def test_parse_rings_and_branches():
    m = parse_smiles("CC(C)C")  # isobutane
    assert m.degree(1) == 3
    m = parse_smiles("C1CCCCC1")  # cyclohexane
    assert len(m.rings) == 1 and len(m.rings[0]) == 6
    m = parse_smiles("C1CC2CCC1CC2")  # bicyclic with two ring numbers
    assert all(m.valence_ok(i) for i in range(m.n_atoms))


def test_kekulization():
    m = parse_smiles("c1ccccc1")  # benzene
    orders = sorted(o for _, _, o in m.bonds)
    assert orders == [1, 1, 1, 2, 2, 2]
    assert all(m.is_aromatic_atom(i) for i in range(6))

    # pyrrole: the [nH] contributes its lone pair, so only 2 doubles
    m = parse_smiles("c1cc[nH]c1")
    assert sorted(o for _, _, o in m.bonds) == [1, 1, 1, 2, 2]
    n_idx = m.symbols.index("N")
    assert m.implicit_h(n_idx) == 1

    # pyridine: the n needs a double bond
    m = parse_smiles("c1ccncc1")
    n_idx = m.symbols.index("N")
    assert m.implicit_h(n_idx) == 0
    assert int(m.adjacency[n_idx].max()) == 2

    # fused aromatics
    m = parse_smiles("c1ccc2ccccc2c1")  # naphthalene
    assert sorted(o for _, _, o in m.bonds).count(2) == 5


def test_charges_and_brackets():
    m = parse_smiles("CC(=O)[O-]")  # acetate
    o_minus = [i for i in range(m.n_atoms)
               if m.symbols[i] == "O" and m.charge(i) == -1][0]
    assert m.implicit_h(o_minus) == 0
    m = parse_smiles("C[N+](C)(C)C")  # tetramethylammonium
    n_idx = m.symbols.index("N")
    assert m.charge(n_idx) == 1 and m.implicit_h(n_idx) == 0
    m = parse_smiles("[nH+]1ccccc1")  # pyridinium
    assert m.charge(0) == 1


def test_dot_separated_and_percent_rings():
    m = parse_smiles("[Na+].[Cl-]" .replace("Na", "N"))  # two fragments
    assert m.n_atoms == 2
    assert int(m.adjacency.sum()) == 0
    m = parse_smiles("C%10CCCCC%10")
    assert len(m.rings) == 1


def test_parse_errors():
    for bad in ("C1CC", "C(", "C)", "Cc1cc1q", ""):
        with pytest.raises(SmilesError):
            parse_smiles(bad)


def test_qed_near_rdkit_anchor_values():
    # RDKit QED anchors for common drugs
    anchors = {
        "c1ccccc1": 0.447,                    # benzene
        "Cn1cnc2c1c(=O)n(C)c(=O)n2C": 0.538,  # caffeine
    }
    for smi, ref in anchors.items():
        assert abs(qed(parse_smiles(smi)) - ref) < 0.05, smi


# ---------------------------------------------------------------------------
# MOAD QED filter
# ---------------------------------------------------------------------------

def test_moad_qed_filter():
    from diffndm_tpu.data.process_bindingmoad import (compute_druglikeness,
                                                      filter_and_split)

    ligand_dict = {
        "1abc": [("LIG:A:1", "valid", "1.1.1.1",
                  "Cn1cnc2c1c(=O)n(C)c(=O)n2C")],   # caffeine, QED ~0.54
        "2def": [("ETH:A:1", "valid", "2.1.1.1", "CCO")],  # QED ~0.41
        "3ghi": [("BAD:A:1", "invalid", "3.1.1.1", "CCO")],
        "4jkl": [("UNP:A:1", "valid", "4.1.1.1", "not_a_smiles(((")],
    }
    with pytest.warns(UserWarning):
        scored = compute_druglikeness(ligand_dict)
    assert scored["1abc"][0][4] > 0.5
    assert scored["4jkl"][0][4] is None

    valid, _ = filter_and_split(scored, qed_thresh=0.45)
    assert "1abc" in valid            # caffeine passes
    assert "2def" not in valid        # ethanol filtered by QED
    assert "3ghi" not in valid        # invalid label
    assert "4jkl" not in valid        # unscorable SMILES

    # occurrence cap: same ligand name everywhere, keep at most 1
    many = {f"p{i}": [("DUP:A:1", "valid", "1", "CCO")] for i in range(5)}
    valid, _ = filter_and_split(many, qed_thresh=0.0, max_occurrences=1)
    assert len(valid) == 1




def pdb_line(rec, serial, name, resname, chain, resi, x, y, z, element):
    """Fixed-column PDB record (name cols 13-16, resname 18-20, chain 22,
    resi 23-26, coords 31-54, element 77-78)."""
    return (f"{rec:<6s}{serial:5d} {name:<4s} {resname:>3s} {chain}"
            f"{resi:4d}    {x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00"
            f"          {element:>2s}")

# ---------------------------------------------------------------------------
# fixed-name split + test-set export
# ---------------------------------------------------------------------------

@pytest.fixture
def tiny_complex(tmp_path):
    pdb = tmp_path / "rec.pdb"
    lines = []
    coords = [(0.0, 0.0, 0.0), (1.5, 0.0, 0.0), (2.2, 1.2, 0.0),
              (3.6, 1.3, 0.4)]
    names = ["N", "CA", "C", "O"]
    for k, ((x, y, z), nm) in enumerate(zip(coords, names)):
        lines.append(pdb_line("ATOM", k + 1, nm, "ALA", "A", 1, x, y, z,
                              nm[0]))
    pdb.write_text("\n".join(lines) + "\nEND\n")

    sdf = tmp_path / "lig.sdf"
    sdf.write_text(
        "lig\n  gen\n\n"
        "  3  2  0  0  0  0  0  0  0  0999 V2000\n"
        "    0.5000    1.0000    0.0000 C   0  0\n"
        "    1.9000    1.2000    0.0000 C   0  0\n"
        "    2.6000    2.2000    0.5000 O   0  0\n"
        "  1  2  1  0\n  2  3  1  0\nM  END\n$$$$\n")
    return str(pdb), str(sdf)


def test_named_split_and_export(tiny_complex, tmp_path):
    from diffndm_tpu.constants import dataset_params
    from diffndm_tpu.data.process_crossdock import (load_split_file,
                                                    process_dataset)

    pdb, sdf = tiny_complex
    split = {"train": [[pdb, sdf]] * 3, "test": [[pdb, sdf]]}
    import json

    split_path = tmp_path / "split.json"
    split_path.write_text(json.dumps(split))
    loaded = load_split_file(str(split_path))
    assert len(loaded["train"]) == 3

    DP = dataset_params["crossdock_full"]
    out = tmp_path / "processed"
    process_dataset(None, str(out), DP["atom_encoder"],
                    DP["atom_encoder"], split_names=loaded,
                    val_from_train=1, export_test_data=True)
    assert (out / "train.npz").exists()
    assert (out / "test.npz").exists()
    # per-pocket export: pdb + sdf + pocket-residue txt
    exported = sorted(os.listdir(out / "test"))
    assert any(f.endswith(".pdb") for f in exported)
    assert any(f.endswith(".sdf") for f in exported)
    txts = [f for f in exported if f.endswith(".txt")]
    assert txts
    ids = (out / "test" / txts[0]).read_text().split()
    assert ids and all(":" in i for i in ids)
    # summary carries the bond/LJ arrays (reference :417-441)
    summary = (out / "summary.txt").read_text()
    for key in ("'bonds1'", "'lennard_jones_rm'", "'atom_hist'"):
        assert key in summary


def test_split_by_name_pt_roundtrip(tmp_path):
    import torch

    from diffndm_tpu.data.process_crossdock import load_split_file

    split = {"train": [("a.pdb", "a.sdf")], "test": [("b.pdb", "b.sdf")]}
    path = tmp_path / "split_by_name.pt"
    torch.save(split, path)
    loaded = load_split_file(str(path))
    assert loaded["test"] == [("b.pdb", "b.sdf")]


# ---------------------------------------------------------------------------
# PDB-atom-name inpaint substructure
# ---------------------------------------------------------------------------

def test_substructure_from_pdb_atom_names(tmp_path):
    from diffndm_tpu.cli.inpaint import substructure_coords_types

    pdb = tmp_path / "complex.pdb"
    lines = []
    # a HETATM ligand residue LIG B 330 with named atoms
    atoms = [("C1", "C", 0.0), ("C2", "C", 1.5), ("N1", "N", 3.0),
             ("O1", "O", 4.5)]
    for k, (nm, el, x) in enumerate(atoms):
        lines.append(pdb_line("HETATM", k + 1, nm, "LIG", "B", 330,
                              x, 0.0, 0.0, el))
    pdb.write_text("\n".join(lines) + "\nEND\n")

    class FakeModel:
        from diffndm_tpu.constants import dataset_params

        dataset_info = dataset_params["crossdock_full"]

        class cfg:
            atom_nf = 10

    coords, types = substructure_coords_types(
        FakeModel, ["C1", "N1"], pdbfile=str(pdb), ref_ligand="B:330")
    assert coords.shape == (2, 3)
    assert abs(coords[1][0] - 3.0) < 1e-6
    with pytest.raises(ValueError):
        substructure_coords_types(FakeModel, ["XX"], pdbfile=str(pdb),
                                  ref_ligand="B:330")


def test_smiles_fuzz_roundtrip_stability():
    """Parsed molecules must be internally consistent (valences, rings)
    and their canonical keys stable across re-parsing for a spread of
    drug-like SMILES."""
    drugs = [
        "CC(C)NCC(O)c1ccc(O)c(O)c1",                     # isoproterenol
        "CN1CCC[C@H]1c1cccnc1",                          # nicotine
        "COc1ccc2cc(ccc2c1)C(C)C(=O)O",                  # naproxen
        "Clc1ccccc1C2=NCC(=O)Nc3ccc(cc23)N(=O)=O",       # clonazepam-ish
        "CC(=O)Nc1nnc(s1)S(=O)(=O)N",                    # acetazolamide
        "OC(=O)c1cc(O)c(O)c(O)c1",                       # gallic acid
        "c1ccc2c(c1)oc1ccccc12",                         # dibenzofuran
        "CN(C)CCOC(c1ccccc1)c1ccccc1",                   # diphenhydramine
        "O=C(O)CCCCCCCCC=C",                             # undecylenic acid
        "C1CC2(C1)CC2",                                  # spiro
    ]
    for smi in drugs:
        m1 = parse_smiles(smi)
        m2 = parse_smiles(smi)
        assert all(m1.valence_ok(i) for i in range(m1.n_atoms)), smi
        assert m1.canonical_smiles_like() == m2.canonical_smiles_like()
        # QED finite and sane
        q = qed(m1)
        assert 0.0 < q < 1.0, (smi, q)


def test_pdb_parser_altloc_and_icode(tmp_path):
    """AltLoc B atoms are skipped (first conformer kept); insertion codes
    distinguish residues."""
    lines = [
        # residue 1 with altloc A/B pairs at different coords
        "ATOM      1  N  AALA A   1       0.000   0.000   0.000"
        "  0.50  0.00           N",
        "ATOM      2  N  BALA A   1       9.000   9.000   9.000"
        "  0.50  0.00           N",
        "ATOM      3  CA AALA A   1       1.500   0.000   0.000"
        "  0.50  0.00           C",
        # residue 52 and 52A (insertion code)
        "ATOM      4  CA  GLY A  52       5.000   0.000   0.000"
        "  1.00  0.00           C",
        "ATOM      5  CA  GLY A  52A      8.000   0.000   0.000"
        "  1.00  0.00           C",
    ]
    p = tmp_path / "alt.pdb"
    p.write_text("\n".join(lines) + "\nEND\n")
    from diffndm_tpu.data.pdb import parse_pdb

    structure = parse_pdb(str(p))
    res1 = [r for r in structure.residues if r.resi == 1]
    assert len(res1) == 1
    names = [a.name for a in res1[0].atoms]
    assert names.count("N") == 1  # altloc B dropped
    assert abs(res1[0].atoms[0].coord[0]) < 1e-6  # kept conformer A
    gly = [r for r in structure.residues if r.resi == 52]
    assert len(gly) == 2  # icode-separated
