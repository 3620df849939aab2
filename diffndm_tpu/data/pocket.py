"""Pocket extraction and preparation.

Replaces utils.get_pocket_from_ligand (utils.py:102-127) and
LigandPocketDDPM.prepare_pocket (lightning_modules.py:763-801) on top of
the internal PDB parser, producing padded NodeBatch pockets.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np

from diffndm_tpu.data.pdb import PDBStructure, Residue
from diffndm_tpu.structs import NodeBatch, pad_to


def ligand_coords_from_ref(structure: PDBStructure,
                           ref_ligand: str) -> Tuple[np.ndarray,
                                                     Optional[int]]:
    """Resolve the reference ligand: an SDF path or '<chain>:<resi>'
    (utils.py:102-113)."""
    if ref_ligand.endswith(".sdf"):
        from diffndm_tpu.chem.io import read_sdf

        mol = read_sdf(ref_ligand)[0]
        return np.asarray(mol.coords), None
    chain, resi = ref_ligand.split(":")
    res = structure.get_residue(chain, int(resi))
    return res.coords(), int(resi)


def get_pocket_from_ligand(structure: PDBStructure, ref_ligand: str,
                           dist_cutoff: float = 8.0) -> List[Residue]:
    """Standard-AA residues with any atom within dist_cutoff of the ligand
    (utils.py:102-127)."""
    lig_coords, resi = ligand_coords_from_ref(structure, ref_ligand)
    pocket = []
    for res in structure.residues:
        if resi is not None and res.resi == resi:
            continue
        if not res.is_standard_aa:
            continue
        rc = res.coords()
        d = np.linalg.norm(rc[:, None, :] - lig_coords[None, :, :], axis=-1)
        if d.min() < dist_cutoff:
            pocket.append(res)
    return pocket


def prepare_pocket(residues: Sequence[Residue], type_encoder: dict,
                   representation: str = "full-atom", repeats: int = 1,
                   pad_multiple: int = 32) -> NodeBatch:
    """Residues -> padded NodeBatch, tiled ``repeats`` times
    (lightning_modules.py:763-801)."""
    if representation == "CA":
        coords, types = [], []
        for res in residues:
            ca = res.ca
            if ca is None:
                continue
            coords.append(ca.coord)
            types.append(type_encoder[res.one_letter])
    else:
        coords, types = [], []
        for res in residues:
            for a in res.atoms:
                if a.element == "H":
                    continue
                t = type_encoder.get(a.element,
                                     type_encoder.get("others"))
                if t is None:
                    continue
                coords.append(a.coord)
                types.append(t)
    coords = np.asarray(coords, np.float32)
    types = np.asarray(types, np.int64)
    n = len(coords)
    n_feat = len(type_encoder)
    n_pad = pad_to(n, pad_multiple)
    x = np.zeros((repeats, n_pad, 3), np.float32)
    h = np.zeros((repeats, n_pad, n_feat), np.float32)
    mask = np.zeros((repeats, n_pad), np.float32)
    x[:, :n] = coords[None]
    h[:, :n] = np.eye(n_feat, dtype=np.float32)[types][None]
    mask[:, :n] = 1.0
    return NodeBatch(x=jnp.asarray(x), h=jnp.asarray(h),
                     mask=jnp.asarray(mask))


def ligand_node_batch(coords: np.ndarray, types: np.ndarray,
                      type_encoder: dict, pad_multiple: int = 8,
                      n_total: Optional[int] = None) -> NodeBatch:
    """Single ligand -> padded 1-sample NodeBatch (for inpaint inputs)."""
    n = len(coords)
    n_feat = len(type_encoder)
    n_pad = n_total if n_total is not None else pad_to(n, pad_multiple)
    x = np.zeros((1, n_pad, 3), np.float32)
    h = np.zeros((1, n_pad, n_feat), np.float32)
    mask = np.zeros((1, n_pad), np.float32)
    x[0, :n] = coords
    h[0, :n] = np.eye(n_feat, dtype=np.float32)[np.asarray(types)]
    mask[0, :n] = 1.0
    return NodeBatch(x=jnp.asarray(x), h=jnp.asarray(h),
                     mask=jnp.asarray(mask))
