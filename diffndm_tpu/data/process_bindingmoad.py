"""BindingMOAD ETL (reference process_bindingmoad.py:37-430).

Parses the every.csv ligand-label file, filters ligands by validity and
occurrence, splits by EC number, extracts pockets and writes processed
npz splits via the shared machinery in process_crossdock.
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import numpy as np


def read_label_file(csv_path: str) -> Dict[str, list]:
    """Parse BindingMOAD every.csv (reference :37-72): returns
    {pdb_id: [(ligand_name, validity, ec_number), ...]}."""
    ligand_dict: Dict[str, list] = defaultdict(list)
    pdb_id = None
    ec = None
    with open(csv_path) as f:
        for line in f:
            row = line.strip().split(",")
            if len(row) < 2:
                continue
            # the csv interleaves class/EC rows, pdb rows and ligand rows
            if row[0].strip():
                ec = row[0].strip()
            if len(row) > 2 and row[2].strip():
                pdb_id = row[2].strip().lower()
            if len(row) > 3 and row[3].strip() and pdb_id:
                name = row[3].strip()
                validity = row[4].strip() if len(row) > 4 else ""
                smiles = row[9].strip() if len(row) > 9 else ""
                ligand_dict[pdb_id].append((name, validity, ec, smiles))
    return dict(ligand_dict)


def compute_druglikeness(ligand_dict: Dict[str, list]) -> Dict[str, list]:
    """Append a QED value to each ligand entry, computed from its SMILES
    (reference compute_druglikeness, process_bindingmoad.py:75-93; RDKit's
    QED.qed replaced by the in-package SMILES parser + QED)."""
    import warnings

    from diffndm_tpu.chem.properties import qed
    from diffndm_tpu.chem.smiles import SmilesError, parse_smiles

    out: Dict[str, list] = {}
    for pdb, ligands in ligand_dict.items():
        rows = []
        for entry in ligands:
            name, validity, ec = entry[0], entry[1], entry[2]
            smiles = entry[3] if len(entry) > 3 else ""
            try:
                q = qed(parse_smiles(smiles)) if smiles else None
            except (SmilesError, Exception) as e:
                warnings.warn(
                    f"could not score ligand {pdb}:{name} from SMILES "
                    f"{smiles!r}: {e}")
                q = None
            rows.append((name, validity, ec, smiles, q))
        out[pdb] = rows
    return out


def filter_and_split(ligand_dict: Dict[str, list],
                     val_fraction: float = 0.05,
                     test_fraction: float = 0.05, seed: int = 0,
                     qed_thresh: float = 0.0,
                     max_occurrences: Optional[int] = None):
    """Keep 'valid' ligands above the QED threshold (reference
    filter_and_flatten, :96-119: qed_thresh default 0.3, per-ligand-name
    occurrence cap); split complexes by EC number so no enzyme family
    spans splits (:122-177)."""
    occ: Dict[str, int] = defaultdict(int)
    valid = {}
    for pdb, ligands in ligand_dict.items():
        keep = []
        for l in ligands:
            if l[1].lower() != "valid":
                continue
            if qed_thresh > 0:
                q = l[4] if len(l) > 4 else None
                if q is None or q <= qed_thresh:
                    continue
            name = l[0].split(":")[0]
            if max_occurrences is not None:
                if occ[name] >= max_occurrences:
                    continue
                occ[name] += 1
            keep.append(l)
        if keep:
            valid[pdb] = keep

    by_ec: Dict[str, List[str]] = defaultdict(list)
    for pdb, ligands in valid.items():
        ec = ligands[0][2] or "unknown"
        by_ec[ec.split(".")[0] if "." in ec else ec].append(pdb)

    rng = np.random.default_rng(seed)
    groups = list(by_ec.values())
    rng.shuffle(groups)
    n_total = sum(len(g) for g in groups)
    splits = {"train": [], "val": [], "test": []}
    for g in groups:
        if len(splits["test"]) < test_fraction * n_total:
            splits["test"] += g
        elif len(splits["val"]) < val_fraction * n_total:
            splits["val"] += g
        else:
            splits["train"] += g
    return valid, splits


def process_bindingmoad(data_dir: str, every_csv: str, outdir: str,
                        dataset_info: Optional[dict] = None,
                        dist_cutoff: float = 8.0, ca_only: bool = False,
                        qed_thresh: float = 0.3,
                        max_occurrences: Optional[int] = 50):
    """Full pipeline: expects <data_dir>/<pdb_id>.bio1 (PDB format) files.

    Ligands are the HETATM residues named in the label file; pockets are
    extracted with the shared 8 A rule.  Produces reference-format npz
    splits + statistics via process_crossdock.process_dataset machinery.
    """
    from diffndm_tpu.constants import dataset_params
    from diffndm_tpu.data.dataset import LigandPocketPair, save_npz_split
    from diffndm_tpu.data.pdb import parse_pdb
    from diffndm_tpu.diffusion.node_distribution import smoothed_histogram

    di = dataset_info or dataset_params["bindingmoad"]
    atom_enc = di["atom_encoder"]
    aa_enc = di["aa_encoder"] if ca_only else di["atom_encoder"]

    ligand_dict = read_label_file(every_csv)
    if qed_thresh > 0:
        ligand_dict = compute_druglikeness(ligand_dict)
    valid, splits = filter_and_split(ligand_dict, qed_thresh=qed_thresh,
                                     max_occurrences=max_occurrences)
    os.makedirs(outdir, exist_ok=True)

    def process_pdb(pdb_id):
        path = os.path.join(data_dir, f"{pdb_id}.bio1")
        if not os.path.exists(path):
            path = os.path.join(data_dir, f"{pdb_id}.pdb")
        if not os.path.exists(path):
            return []
        structure = parse_pdb(path)
        out = []
        for entry in valid.get(pdb_id, []):
            lig_name = entry[0]
            resname = lig_name.split(":")[0][:3]
            lig_res = [r for r in structure.residues
                       if r.resname == resname and not r.is_standard_aa]
            if not lig_res:
                continue
            lig = lig_res[0]
            coords = np.array([a.coord for a in lig.atoms
                               if a.element != "H"], np.float32)
            types = []
            ok = True
            for a in lig.atoms:
                if a.element == "H":
                    continue
                t = atom_enc.get(a.element)
                if t is None:
                    ok = False
                    break
                types.append(t)
            if not ok or len(coords) < 2:
                continue
            pocket_res = []
            for res in structure.residues:
                if not res.is_standard_aa:
                    continue
                rc = res.coords()
                d = np.linalg.norm(rc[:, None] - coords[None], axis=-1)
                if d.min() < dist_cutoff:
                    pocket_res.append(res)
            if not pocket_res:
                continue
            if ca_only:
                pc = np.array([r.ca.coord for r in pocket_res
                               if r.ca is not None], np.float32)
                pt = [aa_enc[r.one_letter] for r in pocket_res
                      if r.ca is not None]
            else:
                pc, pt = [], []
                for r in pocket_res:
                    for a in r.atoms:
                        if a.element == "H" or a.element not in aa_enc:
                            continue
                        pc.append(a.coord)
                        pt.append(aa_enc[a.element])
                pc = np.array(pc, np.float32)
            out.append(LigandPocketPair(
                coords,
                np.eye(len(atom_enc), dtype=np.float32)[np.array(types)],
                pc,
                np.eye(len(aa_enc), dtype=np.float32)[np.array(pt)],
                name=f"{pdb_id}_{resname}"))
        return out

    split_pairs = {}
    for split, pdbs in splits.items():
        pairs = []
        for pdb in pdbs:
            pairs += process_pdb(pdb)
        split_pairs[split] = pairs
        if pairs:
            save_npz_split(os.path.join(outdir, f"{split}.npz"), pairs)

    train = split_pairs.get("train") or sum(split_pairs.values(), [])
    if train:
        hist = smoothed_histogram([len(p.lig_coords) for p in train],
                                  [len(p.pocket_coords) for p in train])
        np.save(os.path.join(outdir, "size_distribution.npy"), hist)
    return split_pairs
