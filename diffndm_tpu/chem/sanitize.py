"""Sanitization and structural filters.

Replaces ``Chem.SanitizeMol`` / ``process_molecule``
(molecule_builder.py:162-250) with explicit graph checks:

- valence validity per element (ALLOWED_BONDS),
- aromaticity perception happens lazily on the Molecule,
- largest-fragment extraction,
- the 3-3 fused-ring filter.

UFF relaxation has no RDKit here; ``relax`` performs a few steps of a simple
bonded + Lennard-Jones steepest descent when requested (relax_iter > 0),
which serves the same cosmetic purpose for written SDFs.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from diffndm_tpu.chem.mol import Molecule


class SanitizeError(ValueError):
    pass


def check_valences(mol: Molecule) -> bool:
    return all(mol.valence_ok(i) for i in range(mol.n_atoms))


def sanitize(mol: Molecule, strict: bool = True) -> Molecule:
    """Validity check in the spirit of Chem.SanitizeMol: every atom must
    satisfy an allowed valence; triggers ring/aromatic perception."""
    for i in range(mol.n_atoms):
        if not mol.valence_ok(i):
            raise SanitizeError(
                f"atom {i} ({mol.symbols[i]}) has bond order sum "
                f"{mol.bond_order_sum(i)}")
    _ = mol.aromatic_rings  # perceive aromaticity
    return mol


def is_valid(mol: Molecule) -> bool:
    try:
        sanitize(mol)
        return True
    except SanitizeError:
        return False


def largest_fragment(mol: Molecule) -> Molecule:
    frags = mol.fragments()
    biggest = max(frags, key=len)
    return mol.subgraph(biggest)


def connectivity_fraction(mol: Molecule) -> float:
    """Fraction of atoms in the largest connected fragment
    (metrics.py:68-87)."""
    if mol.n_atoms == 0:
        return 0.0
    return max(len(f) for f in mol.fragments()) / mol.n_atoms


def filter_ring33(mol: Molecule) -> bool:
    """False if two 3-rings share atoms (molecule_builder.py:229-250)."""
    rings = [set(r) for r in mol.rings]
    for i, ra in enumerate(rings):
        if len(ra) != 3:
            continue
        for j, rb in enumerate(rings):
            if i <= j or len(rb) != 3:
                continue
            if ra & rb:
                return False
    return True


def relax(mol: Molecule, max_iter: int = 200, lr: float = 1e-3) -> Molecule:
    """Lightweight geometry clean-up: harmonic bond terms toward tabulated
    lengths plus a soft repulsion between non-bonded atoms (stand-in for
    RDKit UFF, molecule_builder.py:217-226)."""
    if mol.coords is None or mol.n_atoms < 2:
        return mol
    x = mol.coords.copy()
    adj = mol.adjacency
    bonded = adj > 0
    d0 = np.linalg.norm(x[:, None] - x[None, :], axis=-1)
    target = np.where(bonded, d0, 0.0)  # keep current bond lengths
    for _ in range(max_iter):
        diff = x[:, None] - x[None, :]
        dist = np.linalg.norm(diff, axis=-1) + 1e-9
        np.fill_diagonal(dist, np.inf)
        unit = diff / dist[..., None]
        f = np.zeros_like(x)
        # harmonic bonds
        stretch = np.where(bonded, dist - target, 0.0)
        f -= (stretch[..., None] * unit).sum(axis=1)
        # soft repulsion r < 1.7 A for non-bonded pairs
        rep = np.where(~bonded & (dist < 1.7), (1.7 - dist), 0.0)
        f += (rep[..., None] * unit).sum(axis=1)
        x = x + lr * f
    out = Molecule(list(mol.symbols), list(mol.bonds), coords=x)
    return out


def process_molecule(mol: Molecule, sanitize_flag: bool = False,
                     relax_iter: int = 0, largest_frag: bool = False
                     ) -> Optional[Molecule]:
    """Filter pipeline equivalent to the reference ``process_molecule``
    (molecule_builder.py:162-214). Returns None if the molecule fails."""
    if sanitize_flag:
        try:
            mol = sanitize(mol)
        except SanitizeError:
            return None
    if largest_frag:
        mol = largest_fragment(mol)
        if sanitize_flag:
            try:
                mol = sanitize(mol)
            except SanitizeError:
                return None
    if relax_iter > 0:
        mol = relax(mol, max_iter=relax_iter)
        if sanitize_flag:
            try:
                mol = sanitize(mol)
            except SanitizeError:
                return None
    return mol
