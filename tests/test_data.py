"""Data layer tests: PDB parsing, pocket extraction, dataset npz
round-trip, bucketed loader, ETL."""

import os
import textwrap

import jax.numpy as jnp
import numpy as np
import pytest

from diffndm_tpu.constants import dataset_params
from diffndm_tpu.data.dataset import (BucketedLoader, LigandPocketPair,
                                      ProcessedLigandPocketDataset,
                                      collate_padded, save_npz_split)
from diffndm_tpu.data.pdb import parse_pdb
from diffndm_tpu.data.pocket import (get_pocket_from_ligand,
                                     ligand_node_batch, prepare_pocket)
from diffndm_tpu.data.process_crossdock import process_dataset

DP = dataset_params["crossdock_full"]
REF_PDB = "/root/reference/example/3rfm.pdb"
REF_SDF = "/root/reference/example/3rfm_B_CFF.sdf"


def _write_tiny_pdb(path):
    lines = []
    res = [("ALA", 1, [("N", "N", (0, 0, 0)), ("CA", "C", (1.4, 0, 0)),
                       ("C", "C", (2.0, 1.3, 0)), ("O", "O", (1.5, 2.4, 0))]),
           ("GLY", 2, [("N", "N", (3.3, 1.3, 0)), ("CA", "C", (4.1, 2.5, 0)),
                       ("C", "C", (5.5, 2.2, 0)), ("O", "O", (6.0, 1.1, 0))]),
           ("SER", 3, [("N", "N", (30, 30, 30)), ("CA", "C", (31, 30, 30)),
                       ("C", "C", (32, 31, 30)), ("O", "O", (33, 32, 30))])]
    serial = 1
    for resname, resi, atoms in res:
        for name, el, (x, y, z) in atoms:
            lines.append(
                f"ATOM  {serial:>5} {name:<4}{resname:>4} A{resi:>4}    "
                f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00          {el:>2}")
            serial += 1
    lines.append("END")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def _write_tiny_sdf(path):
    from diffndm_tpu.chem.io import write_sdf
    from diffndm_tpu.chem.mol import Molecule

    coords = np.array([[1.0, 1.0, 0.5], [2.4, 1.2, 0.5], [3.2, 2.3, 0.5]])
    write_sdf(path, [Molecule(["C", "C", "O"],
                              [(0, 1, 1), (1, 2, 1)], coords=coords)])


def test_parse_tiny_pdb(tmp_path):
    path = str(tmp_path / "tiny.pdb")
    _write_tiny_pdb(path)
    s = parse_pdb(path)
    assert len(s.residues) == 3
    assert s.residues[0].resname == "ALA"
    assert s.residues[0].ca is not None
    assert s.residues[0].is_standard_aa
    assert s.get_residue("A", 2).resname == "GLY"


def test_pocket_extraction(tmp_path):
    pdb = str(tmp_path / "tiny.pdb")
    sdf = str(tmp_path / "lig.sdf")
    _write_tiny_pdb(pdb)
    _write_tiny_sdf(sdf)
    s = parse_pdb(pdb)
    pocket = get_pocket_from_ligand(s, sdf, dist_cutoff=8.0)
    names = [r.resname for r in pocket]
    assert "ALA" in names and "GLY" in names and "SER" not in names

    batch = prepare_pocket(pocket, DP["atom_encoder"], "full-atom",
                           repeats=3, pad_multiple=8)
    assert batch.x.shape[0] == 3
    assert float(batch.size[0]) == 8  # 2 residues x 4 heavy atoms
    ca = prepare_pocket(pocket, dataset_params["crossdock"]["aa_encoder"],
                        "CA", repeats=1, pad_multiple=4)
    assert float(ca.size[0]) == 2


@pytest.mark.skipif(not os.path.exists(REF_PDB),
                    reason="reference example not mounted")
def test_real_pdb_pocket():
    s = parse_pdb(REF_PDB)
    assert len(s.residues) > 100
    pocket = get_pocket_from_ligand(s, REF_SDF, dist_cutoff=8.0)
    assert 10 < len(pocket) < 100
    batch = prepare_pocket(pocket, DP["atom_encoder"], "full-atom",
                           repeats=2)
    assert 100 < float(batch.size[0]) < 1000


def test_dataset_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pairs = []
    for i in range(7):
        nl, npk = rng.integers(5, 12), rng.integers(10, 30)
        pairs.append(LigandPocketPair(
            rng.normal(size=(nl, 3)).astype(np.float32),
            np.eye(11, dtype=np.float32)[rng.integers(0, 4, nl)],
            rng.normal(size=(npk, 3)).astype(np.float32),
            np.eye(11, dtype=np.float32)[rng.integers(0, 4, npk)],
            name=f"c{i}"))
    path = str(tmp_path / "train.npz")
    save_npz_split(path, pairs)
    ds = ProcessedLigandPocketDataset(path, center=True)
    assert len(ds) == 7
    # joint centering at load
    p0 = ds[0]
    joint = np.vstack([p0.lig_coords, p0.pocket_coords])
    np.testing.assert_allclose(joint.mean(0), 0.0, atol=1e-5)

    loader = BucketedLoader(ds, batch_size=3, drop_feature_cols=1)
    batches = list(loader)
    assert len(batches) == 3
    lig, poc = batches[0]
    assert lig.x.shape[0] == 3
    assert lig.h.shape[-1] == 10  # 'others' column dropped
    hist = ds.size_histogram()
    assert hist.sum() > 0


def test_etl(tmp_path):
    pdb = str(tmp_path / "rec.pdb")
    sdf = str(tmp_path / "lig.sdf")
    _write_tiny_pdb(pdb)
    _write_tiny_sdf(sdf)
    out = str(tmp_path / "processed")
    res = process_dataset([(pdb, sdf)] * 5, out, DP["atom_encoder"],
                          DP["atom_encoder"],
                          split_fractions=(0.6, 0.2, 0.2),
                          dataset_info=DP)
    assert os.path.exists(os.path.join(out, "train.npz"))
    assert os.path.exists(os.path.join(out, "size_distribution.npy"))
    assert os.path.exists(os.path.join(out, "train_smiles.npy"))
    ds = ProcessedLigandPocketDataset(os.path.join(out, "train.npz"))
    assert len(ds) >= 1
    assert res.atom_hist["C"] > 0
