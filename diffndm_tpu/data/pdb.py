"""Minimal PDB parser (fixed-column ATOM/HETATM records).

Replaces BioPython's PDBParser for the subset the reference uses
(utils.py:95-127, lightning_modules.py:843-852, process_crossdock.py):
residue iteration, atom coordinates/elements, CA lookup, standard-AA
checks.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from diffndm_tpu.constants import AA_3TO1, STANDARD_AA


@dataclass
class Atom:
    name: str
    element: str
    coord: np.ndarray
    is_hetero: bool = False
    altloc: str = ""


@dataclass
class Residue:
    chain: str
    resi: int
    resname: str
    icode: str = ""
    atoms: List[Atom] = field(default_factory=list)

    @property
    def is_standard_aa(self) -> bool:
        return self.resname in STANDARD_AA

    @property
    def one_letter(self) -> Optional[str]:
        return AA_3TO1.get(self.resname)

    def get_atom(self, name: str) -> Optional[Atom]:
        for a in self.atoms:
            if a.name == name:
                return a
        return None

    @property
    def ca(self) -> Optional[Atom]:
        return self.get_atom("CA")

    def coords(self) -> np.ndarray:
        return np.array([a.coord for a in self.atoms])


@dataclass
class PDBStructure:
    residues: List[Residue]

    def chains(self) -> Dict[str, List[Residue]]:
        out: Dict[str, List[Residue]] = {}
        for r in self.residues:
            out.setdefault(r.chain, []).append(r)
        return out

    def get_residue(self, chain: str, resi: int) -> Residue:
        found = [r for r in self.residues
                 if r.chain == chain and r.resi == resi]
        assert len(found) == 1, f"{len(found)} residues match {chain}:{resi}"
        return found[0]


def _element_from_record(line: str) -> str:
    el = line[76:78].strip() if len(line) >= 78 else ""
    if not el:
        # fall back to the atom-name columns
        name = line[12:16]
        el = name.strip(" 0123456789")[:2]
        if len(el) == 2 and el[1].islower():
            pass
        else:
            el = el[:1]
    return el.capitalize()


def parse_pdb(path: str, model: int = 1) -> PDBStructure:
    """Parse the first (or given) MODEL of a PDB file."""
    residues: Dict[Tuple[str, int, str, str], Residue] = {}
    current_model = 1
    with open(path) as f:
        for line in f:
            rec = line[:6]
            if rec.startswith("MODEL"):
                try:
                    current_model = int(line.split()[1])
                except (IndexError, ValueError):
                    current_model += 1
                continue
            if rec.startswith("ENDMDL"):
                current_model += 1
                continue
            if rec not in ("ATOM  ", "HETATM"):
                continue
            if current_model != model:
                continue
            altloc = line[16].strip()
            if altloc not in ("", "A"):
                continue  # keep first altloc only
            name = line[12:16].strip()
            resname = line[17:20].strip()
            chain = line[21].strip() or " "
            try:
                resi = int(line[22:26])
            except ValueError:
                continue
            icode = line[26].strip()
            coord = np.array([float(line[30:38]), float(line[38:46]),
                              float(line[46:54])])
            key = (chain, resi, icode, resname)
            if key not in residues:
                residues[key] = Residue(chain=chain, resi=resi,
                                        resname=resname, icode=icode)
            residues[key].atoms.append(
                Atom(name=name, element=_element_from_record(line),
                     coord=coord, is_hetero=rec.startswith("HETATM"),
                     altloc=altloc))
    return PDBStructure(list(residues.values()))
