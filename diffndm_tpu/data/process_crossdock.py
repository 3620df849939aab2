"""CrossDocked ETL: (receptor PDB, ligand SDF) pairs -> processed npz
splits plus model statistics.

Re-implements the reference pipeline (process_crossdock.py:51-441 /
new_process_crossdock.py) on the internal PDB/SDF parsers:

- pocket = standard residues with any atom within ``dist_cutoff`` (8 A) of
  the ligand (:51-58), CA-only or full-atom one-hot encodings (:65-110);
- smoothed joint (N_lig, N_pocket) size histogram (sigma=1, :144-170);
- atom/aa type histograms (:221-232);
- train-set molecular identity keys (the reference stores SMILES,
  :398-400; we store WL canonical keys) for novelty metrics;
- optional train subsampling (new_process_crossdock.py:282-295).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from diffndm_tpu.chem.io import read_sdf
from diffndm_tpu.data.dataset import LigandPocketPair, save_npz_split
from diffndm_tpu.data.pdb import parse_pdb
from diffndm_tpu.data.pocket import get_pocket_from_ligand


def process_ligand_and_pocket(pdbfile: str, sdffile: str,
                              atom_encoder: dict, pocket_encoder: dict,
                              dist_cutoff: float = 8.0,
                              ca_only: bool = False,
                              ) -> Optional[LigandPocketPair]:
    """One (receptor, ligand) pair -> coordinate/one-hot arrays."""
    mol = read_sdf(sdffile)[0]
    keep = [i for i, s in enumerate(mol.symbols) if s != "H"]
    lig_coords = np.asarray(mol.coords)[keep].astype(np.float32)
    lig_types = []
    for i in keep:
        s = mol.symbols[i]
        t = atom_encoder.get(s, atom_encoder.get("others"))
        if t is None:
            return None  # reference raises for unknown atoms (:80-86)
        lig_types.append(t)
    lig_one_hot = np.eye(len(atom_encoder),
                         dtype=np.float32)[np.asarray(lig_types)]

    structure = parse_pdb(pdbfile)
    # pocket from explicit ligand coordinates
    pocket_res = []
    for res in structure.residues:
        if not res.is_standard_aa:
            continue
        rc = res.coords()
        d = np.linalg.norm(rc[:, None] - lig_coords[None], axis=-1)
        if d.min() < dist_cutoff:
            pocket_res.append(res)
    if not pocket_res:
        return None

    if ca_only:
        coords, types = [], []
        for res in pocket_res:
            if res.ca is None:
                continue
            coords.append(res.ca.coord)
            types.append(pocket_encoder[res.one_letter])
    else:
        coords, types = [], []
        for res in pocket_res:
            for a in res.atoms:
                if a.element == "H":
                    continue
                t = pocket_encoder.get(a.element,
                                       pocket_encoder.get("others"))
                if t is None:
                    continue
                coords.append(a.coord)
                types.append(t)
    pocket_coords = np.asarray(coords, np.float32)
    pocket_one_hot = np.eye(len(pocket_encoder),
                            dtype=np.float32)[np.asarray(types)]
    name = os.path.basename(pdbfile).replace(".pdb", "") + "_" + \
        os.path.basename(sdffile).replace(".sdf", "")
    return LigandPocketPair(lig_coords, lig_one_hot, pocket_coords,
                            pocket_one_hot, name)


@dataclass
class ProcessedSplits:
    outdir: str
    histogram: np.ndarray
    atom_hist: Dict[str, int]
    aa_hist: Dict[str, int]


def process_dataset(pairs: Sequence[Tuple[str, str]], outdir: str,
                    atom_encoder: dict, pocket_encoder: dict,
                    split_fractions=(0.9, 0.05, 0.05),
                    dist_cutoff: float = 8.0, ca_only: bool = False,
                    train_subsample: float = 1.0, seed: int = 0,
                    dataset_info: Optional[dict] = None) -> ProcessedSplits:
    """Full ETL: list of (pdb, sdf) path pairs -> train/val/test npz +
    statistics files in ``outdir``."""
    from diffndm_tpu.chem.bonds import build_molecule
    from diffndm_tpu.diffusion.node_distribution import smoothed_histogram

    os.makedirs(outdir, exist_ok=True)
    processed: List[LigandPocketPair] = []
    for pdbfile, sdffile in pairs:
        try:
            pair = process_ligand_and_pocket(
                pdbfile, sdffile, atom_encoder, pocket_encoder,
                dist_cutoff, ca_only)
        except Exception:
            pair = None
        if pair is not None:
            processed.append(pair)

    rng = np.random.default_rng(seed)
    order = rng.permutation(len(processed))
    n = len(processed)
    n_train = int(split_fractions[0] * n)
    n_val = int(split_fractions[1] * n)
    splits = {
        "train": [processed[i] for i in order[:n_train]],
        "val": [processed[i] for i in order[n_train:n_train + n_val]],
        "test": [processed[i] for i in order[n_train + n_val:]],
    }
    if train_subsample < 1.0 and splits["train"]:
        k = max(1, int(len(splits["train"]) * train_subsample))
        splits["train"] = splits["train"][:k]

    for name, ps in splits.items():
        if ps:
            save_npz_split(os.path.join(outdir, f"{name}.npz"), ps)

    # statistics from the train split
    train = splits["train"] or processed
    hist = smoothed_histogram([len(p.lig_coords) for p in train],
                              [len(p.pocket_coords) for p in train])
    np.save(os.path.join(outdir, "size_distribution.npy"), hist)

    atom_decoder = list(atom_encoder)
    atom_hist = {a: 0 for a in atom_decoder}
    for p in train:
        for t in p.lig_one_hot.argmax(-1):
            atom_hist[atom_decoder[int(t)]] += 1
    aa_decoder = list(pocket_encoder)
    aa_hist = {a: 0 for a in aa_decoder}
    for p in train:
        for t in p.pocket_one_hot.argmax(-1):
            aa_hist[aa_decoder[int(t)]] += 1

    # train molecular identity keys for novelty metrics (:398-400)
    if dataset_info is not None:
        keys = []
        for p in train:
            try:
                mol = build_molecule(p.lig_coords,
                                     p.lig_one_hot.argmax(-1), dataset_info)
                keys.append(mol.canonical_smiles_like())
            except Exception:
                continue
        np.save(os.path.join(outdir, "train_smiles.npy"),
                np.array(keys))

    with open(os.path.join(outdir, "summary.txt"), "w") as f:
        f.write(f"processed {n} complexes\n")
        for name, ps in splits.items():
            f.write(f"{name}: {len(ps)}\n")
        f.write(f"atom_hist: {atom_hist}\n")
        f.write(f"aa_hist: {aa_hist}\n")

    return ProcessedSplits(outdir, hist, atom_hist, aa_hist)
