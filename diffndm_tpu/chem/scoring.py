"""Native Vina-style protein-ligand scoring.

The reference scores poses by shelling out to smina/qvina2 binaries
(analysis/docking.py:18-130) which do not exist in this image.  This
module implements the published AutoDock Vina empirical scoring function
(Trott & Olson, J Comput Chem 2010: weighted gauss/repulsion/hydrophobic/
H-bond terms over heavy-atom pairs with an N_rot penalty) directly on the
in-package Molecule/PDB types, so affinity ESTIMATES are available with
zero external dependencies.  It is a rescoring function (no pose search)
— the analogue of ``smina --score_only``.

Approximations vs Vina's full atom typing (documented, deliberate):
- donors/acceptors: every N/O is treated as both (protein H positions are
  absent in noH structures);
- hydrophobic carbon: a carbon with no N/O within covalent range
  (inferred from geometry, 1.75 A) — works uniformly for ligand and
  receptor without topology;
- no intramolecular term (matches score_only's dominant component).

Scores correlate with, but are not numerically identical to, smina
affinities; when the binaries exist, chem/docking.py remains the parity
path.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from diffndm_tpu.chem.mol import Molecule

# Vina weights (Trott & Olson 2010, table 1)
W_GAUSS1 = -0.035579
W_GAUSS2 = -0.005156
W_REPULSION = 0.840245
W_HYDROPHOBIC = -0.035069
W_HBOND = -0.587439
W_NROT = 0.05846

# X-Score vdW radii used by Vina (A)
_RADII = {"C": 1.9, "N": 1.8, "O": 1.7, "S": 2.0, "P": 2.1, "F": 1.5,
          "Cl": 1.8, "Br": 2.0, "I": 2.2, "Si": 2.2, "B": 2.0}
_DEFAULT_RADIUS = 1.9
_CUTOFF = 8.0  # pair cutoff (A), as in Vina


def _atom_properties(coords: np.ndarray, elements: Sequence[str]):
    """(radii, hydrophobic, polar) arrays for a heavy-atom point cloud.

    Hydrophobic: C/F/Cl/Br/I, with carbons demoted when a N/O sits within
    covalent range (1.75 A).  Polar (donor/acceptor): N or O.
    """
    n = len(elements)
    radii = np.array([_RADII.get(e, _DEFAULT_RADIUS) for e in elements])
    elements = np.asarray(elements)
    polar = (elements == "N") | (elements == "O")
    hydro = np.isin(elements, ("C", "F", "Cl", "Br", "I"))
    carbons = np.where(elements == "C")[0]
    if len(carbons) and polar.any():
        d = np.linalg.norm(coords[carbons][:, None]
                           - coords[polar][None], axis=-1)
        hydro[carbons[(d < 1.75).any(axis=1)]] = False
    return radii, hydro, polar


class VinaScorer:
    """Rescoring of ligand poses against a fixed receptor point cloud."""

    def __init__(self, receptor_coords: np.ndarray,
                 receptor_elements: Sequence[str]):
        keep = [i for i, e in enumerate(receptor_elements) if e != "H"]
        self.rec_x = np.asarray(receptor_coords, float)[keep]
        elems = [receptor_elements[i] for i in keep]
        self.rec_r, self.rec_hydro, self.rec_polar = _atom_properties(
            self.rec_x, elems)

    @classmethod
    def from_pdb(cls, pdb_path: str,
                 protein_only: bool = True) -> "VinaScorer":
        """protein_only keeps standard amino-acid residues — HETATM
        ligands/waters in the same file would otherwise clash against the
        pose being scored."""
        from diffndm_tpu.data.pdb import parse_pdb

        coords, elems = [], []
        for res in parse_pdb(pdb_path).residues:
            if protein_only and not res.is_standard_aa:
                continue
            for a in res.atoms:
                coords.append(a.coord)
                elems.append(a.element)
        return cls(np.asarray(coords), elems)

    def interaction_terms(self, mol: Molecule) -> dict:
        """Per-term sums over ligand-receptor heavy-atom pairs."""
        lig_x = np.asarray(mol.coords, float)
        lig_r, lig_hydro, lig_polar = _atom_properties(lig_x, mol.symbols)

        d = np.linalg.norm(lig_x[:, None] - self.rec_x[None], axis=-1)
        within = d < _CUTOFF
        if not within.any():
            return {"gauss1": 0.0, "gauss2": 0.0, "repulsion": 0.0,
                    "hydrophobic": 0.0, "hbond": 0.0}
        # surface distance d' = d - (R_i + R_j)
        ds = d - (lig_r[:, None] + self.rec_r[None])
        ds = np.where(within, ds, np.inf)

        gauss1 = np.exp(-((ds / 0.5) ** 2))
        gauss2 = np.exp(-(((ds - 3.0) / 2.0) ** 2))
        repulsion = np.where(ds < 0, ds ** 2, 0.0)
        # hydrophobic: 1 below 0.5, 0 above 1.5, linear between; only for
        # hydrophobic-hydrophobic pairs
        h = np.clip((1.5 - ds), 0.0, 1.0)
        h = np.where(ds < 0.5, 1.0, h)
        h = h * (lig_hydro[:, None] & self.rec_hydro[None])
        # hbond: 1 below -0.7, 0 above 0, linear between; polar-polar pairs
        g = np.clip(-ds / 0.7, 0.0, 1.0)
        g = g * (lig_polar[:, None] & self.rec_polar[None])

        m = within
        return {"gauss1": float(gauss1[m].sum()),
                "gauss2": float(gauss2[m].sum()),
                "repulsion": float(repulsion[m].sum()),
                "hydrophobic": float(h[m].sum()),
                "hbond": float(g[m].sum())}

    def score(self, mol: Molecule) -> float:
        """Vina-style affinity estimate (kcal/mol scale; lower=better)."""
        from diffndm_tpu.chem.descriptors import num_rotatable_bonds

        t = self.interaction_terms(mol)
        inter = (W_GAUSS1 * t["gauss1"] + W_GAUSS2 * t["gauss2"]
                 + W_REPULSION * t["repulsion"]
                 + W_HYDROPHOBIC * t["hydrophobic"]
                 + W_HBOND * t["hbond"])
        n_rot = num_rotatable_bonds(mol)
        return inter / (1.0 + W_NROT * n_rot)


def calibrate_against_smina(receptor_pdb: str, sdf_paths: Sequence[str]
                            ) -> dict:
    """Fit per-term scales of the native scoring function against smina
    ``--score_only`` affinities (VERDICT r2 item 8 scaffolding).

    Requires the smina binary (chem/docking.py); raises
    DockingUnavailable otherwise.  Returns
    ``{"weights": {term: w}, "nrot_w": w, "r2": float, "n": int}`` from a
    least-squares fit of ``affinity * (1 + w_rot * n_rot) ~= sum_k w_k
    term_k`` over the given ligand poses.  Until a calibration has been
    run on a machine with the binaries, native scores carry the published
    Trott-Olson weights and are labeled UNCALIBRATED in evaluate output.
    """
    from diffndm_tpu.chem.descriptors import num_rotatable_bonds
    from diffndm_tpu.chem.docking import smina_score
    from diffndm_tpu.chem.io import read_sdf

    scorer = VinaScorer.from_pdb(receptor_pdb)
    terms, y = [], []
    names = ("gauss1", "gauss2", "repulsion", "hydrophobic", "hbond")
    affinities = smina_score(list(sdf_paths), receptor_pdb)
    for path, aff in zip(sdf_paths, affinities):
        if not np.isfinite(aff):
            continue
        for mol in read_sdf(path):
            t = scorer.interaction_terms(mol)
            n_rot = num_rotatable_bonds(mol)
            terms.append([t[k] for k in names])
            y.append(aff * (1.0 + W_NROT * n_rot))
            break  # smina reports the first pose per file
    if len(y) < len(names):
        raise ValueError(f"need >= {len(names)} scored poses, "
                         f"got {len(y)}")
    A = np.asarray(terms, float)
    yv = np.asarray(y, float)
    w, *_ = np.linalg.lstsq(A, yv, rcond=None)
    pred = A @ w
    ss_res = float(((yv - pred) ** 2).sum())
    ss_tot = float(((yv - yv.mean()) ** 2).sum()) or 1.0
    return {"weights": dict(zip(names, w.tolist())), "nrot_w": W_NROT,
            "r2": 1.0 - ss_res / ss_tot, "n": len(y)}


def vina_score_like(mols: Sequence[Molecule], receptor_pdb: str
                    ) -> List[float]:
    """Affinity estimates for a list of molecules against a receptor PDB
    — the native stand-in for docking.smina_score when no binaries exist
    (NaN for None entries, mirroring the reference's failure behaviour)."""
    scorer = VinaScorer.from_pdb(receptor_pdb)
    return [scorer.score(m) if m is not None else float("nan")
            for m in mols]
