"""Physical-chemistry constants and dataset-specific encodings.

The numeric tables (bond lengths, covalent radii, valences, type histograms)
are public reference data; layout mirrors the semantics of the reference
``constants.py`` (see /root/reference/constants.py:17-183) but is restructured
as numpy arrays so they can be lifted straight onto a TPU as static operands.

Bond lengths (pm) from wiredchemist.com and chemistry-reference.com tables;
covalent radii from the Wikipedia "Covalent radius" multi-bond table
(2022/08/14 snapshot, same provenance the reference cites).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Bond-order perception margins (pm), cf. reference constants.py:17
# ---------------------------------------------------------------------------
MARGIN1, MARGIN2, MARGIN3 = 3.0, 2.0, 1.0

# OpenBabel element data (element.txt of the OpenBabel distribution; public
# reference data): single-bond covalent radii (pm) and maximum bond counts.
# The reference's default molecule builder is OpenBabel's ConnectTheDots
# (molecule_builder.py:58-97): two atoms bond when their distance is below
# rcov_i + rcov_j + 0.45 A, atoms closer than 0.4 A never bond, and atoms
# exceeding their maximum bond count drop their LONGEST bonds.  Connectivity
# perception (chem/bonds.py, native/chemscore.cpp) uses these tables so a
# rebuilt point cloud connects exactly like the reference pipeline (measured:
# 0 missing bonds over the 43,649 bonds of the 2,000 committed
# my_example_origion molecules).
OB_COVALENT_RADII = {
    "H": 31.0, "B": 84.0, "C": 76.0, "N": 71.0, "O": 66.0, "F": 57.0,
    "Al": 121.0, "Si": 111.0, "P": 107.0, "S": 105.0, "Cl": 102.0,
    "As": 119.0, "Br": 120.0, "I": 139.0, "Hg": 132.0, "Bi": 148.0,
}
OB_MAX_BONDS = {
    "H": 1, "B": 4, "C": 4, "N": 4, "O": 2, "F": 1, "Al": 6, "Si": 6,
    "P": 6, "S": 6, "Cl": 1, "As": 5, "Br": 1, "I": 3, "Hg": 2, "Bi": 5,
}

# Allowed valences per element (list = multiple allowed oxidation states),
# cf. reference constants.py:19-22.
ALLOWED_BONDS = {
    "H": 1, "C": 4, "N": 3, "O": 2, "F": 1, "B": 3, "Al": 3, "Si": 4,
    "P": (3, 5), "S": 4, "Cl": 1, "As": 3, "Br": 1, "I": 1, "Hg": (1, 2),
    "Bi": (3, 5),
}

# Single-bond equilibrium lengths in pm between element symbols.
BONDS1 = {
    "H": {"H": 74, "C": 109, "N": 101, "O": 96, "F": 92, "B": 119, "Si": 148,
          "P": 144, "As": 152, "S": 134, "Cl": 127, "Br": 141, "I": 161},
    "C": {"H": 109, "C": 154, "N": 147, "O": 143, "F": 135, "Si": 185,
          "P": 184, "S": 182, "Cl": 177, "Br": 194, "I": 214},
    "N": {"H": 101, "C": 147, "N": 145, "O": 140, "F": 136, "Cl": 175,
          "Br": 214, "S": 168, "I": 222, "P": 177},
    "O": {"H": 96, "C": 143, "N": 140, "O": 148, "F": 142, "Br": 172,
          "S": 151, "P": 163, "Si": 163, "Cl": 164, "I": 194},
    "F": {"H": 92, "C": 135, "N": 136, "O": 142, "F": 142, "S": 158,
          "Si": 160, "Cl": 166, "Br": 178, "P": 156, "I": 187},
    "B": {"H": 119, "Cl": 175},
    "Si": {"Si": 233, "H": 148, "C": 185, "O": 163, "S": 200, "F": 160,
           "Cl": 202, "Br": 215, "I": 243},
    "Cl": {"Cl": 199, "H": 127, "C": 177, "N": 175, "O": 164, "P": 203,
           "S": 207, "B": 175, "Si": 202, "F": 166, "Br": 214},
    "S": {"H": 134, "C": 182, "N": 168, "O": 151, "S": 204, "F": 158,
          "Cl": 207, "Br": 225, "Si": 200, "P": 210, "I": 234},
    "Br": {"Br": 228, "H": 141, "C": 194, "O": 172, "N": 214, "Si": 215,
           "S": 225, "F": 178, "Cl": 214, "P": 222},
    "P": {"P": 221, "H": 144, "C": 184, "O": 163, "Cl": 203, "S": 210,
          "F": 156, "N": 177, "Br": 222},
    "I": {"H": 161, "C": 214, "Si": 243, "N": 222, "O": 194, "S": 234,
          "F": 187, "I": 266},
    "As": {"H": 152},
}

BONDS2 = {
    "C": {"C": 134, "N": 129, "O": 120, "S": 160},
    "N": {"C": 129, "N": 125, "O": 121},
    "O": {"C": 120, "N": 121, "O": 121, "P": 150},
    "P": {"O": 150, "S": 186},
    "S": {"P": 186, "C": 160},
}

BONDS3 = {
    "C": {"C": 120, "N": 116, "O": 113},
    "N": {"C": 116, "N": 110},
    "O": {"C": 113},
}

# pm, multi-bond covalent radii.
COVALENT_RADII = {
    "H": 32, "C": 60, "N": 54, "O": 53, "F": 53, "B": 73, "Al": 111,
    "Si": 102, "P": 94, "S": 94, "Cl": 93, "As": 106, "Br": 109, "I": 125,
    "Hg": 133, "Bi": 135,
}

# Standard atomic weights (most abundant isotope mass is used by
# Descriptors.ExactMolWt; we use monoisotopic masses to match it).
MONOISOTOPIC_MASS = {
    "H": 1.00782503, "B": 11.00930536, "C": 12.0, "N": 14.0030740,
    "O": 15.9949146, "F": 18.9984032, "Al": 26.98153853, "Si": 27.97692653,
    "P": 30.97376199, "S": 31.97207117, "Cl": 34.96885268, "As": 74.92159457,
    "Br": 78.9183376, "I": 126.9044719, "Hg": 201.9706434, "Bi": 208.9803991,
}

ATOMIC_NUMBER = {
    "H": 1, "B": 5, "C": 6, "N": 7, "O": 8, "F": 9, "Al": 13, "Si": 14,
    "P": 15, "S": 16, "Cl": 17, "As": 33, "Br": 35, "I": 53, "Hg": 80,
    "Bi": 83,
}

# Backbone geometry (Bhagavan & Ha 2015), cf. reference constants.py:87-89.
N_CA_DIST = 1.47
CA_C_DIST = 1.53
N_CA_C_ANGLE = 110.0 * np.pi / 180.0

# Three-letter -> one-letter amino acid codes (for pocket encoders and the
# minimal PDB parser; replaces BioPython's lookup).
AA_3TO1 = {
    "ALA": "A", "ARG": "R", "ASN": "N", "ASP": "D", "CYS": "C", "GLN": "Q",
    "GLU": "E", "GLY": "G", "HIS": "H", "ILE": "I", "LEU": "L", "LYS": "K",
    "MET": "M", "PHE": "F", "PRO": "P", "SER": "S", "THR": "T", "TRP": "W",
    "TYR": "Y", "VAL": "V",
}
STANDARD_AA = set(AA_3TO1)


def _sym_table(pairs: dict, decoder: list[str]) -> np.ndarray:
    """Build a symmetric [K, K] bond-length table (pm) for the given atom
    type decoder; entries absent from the dict are 0 (= never bonded)."""
    k = len(decoder)
    out = np.zeros((k, k), dtype=np.float32)
    for i, a in enumerate(decoder):
        for j, b in enumerate(decoder):
            v = pairs.get(a, {}).get(b, 0.0)
            if v:
                out[i, j] = v
    return np.maximum(out, out.T)


def _lj_table(decoder: list[str]) -> np.ndarray:
    """Lennard-Jones r_m table: the shortest tabulated bond length if the
    pair is bondable, else the sum of covalent radii (same construction the
    reference ETL uses, process_crossdock.py:173-218)."""
    k = len(decoder)
    b1 = _sym_table(BONDS1, decoder)
    b2 = _sym_table(BONDS2, decoder)
    b3 = _sym_table(BONDS3, decoder)
    out = np.zeros((k, k), dtype=np.float32)
    for i in range(k):
        for j in range(k):
            cands = [t[i, j] for t in (b1, b2, b3) if t[i, j] > 0]
            if cands:
                out[i, j] = min(cands)
            else:
                ri = COVALENT_RADII.get(decoder[i], 0)
                rj = COVALENT_RADII.get(decoder[j], 0)
                out[i, j] = ri + rj if (ri and rj) else 0.0
    return out


_LIG_DECODER_10 = ["C", "N", "O", "S", "B", "Br", "Cl", "P", "I", "F"]
_LIG_DECODER_11 = _LIG_DECODER_10 + ["others"]
_AA_DECODER_20 = list("ACDEFGHIKLMNPQRSTVWY")


def _make_params(atom_decoder, aa_decoder, atom_hist, aa_hist):
    bond_decoder = [a for a in atom_decoder if a != "others"]
    pad = len(atom_decoder) - len(bond_decoder)

    def padded(tab):
        full = np.zeros((len(atom_decoder),) * 2, dtype=np.float32)
        full[: len(bond_decoder), : len(bond_decoder)] = tab
        return full

    return {
        "atom_encoder": {a: i for i, a in enumerate(atom_decoder)},
        "atom_decoder": list(atom_decoder),
        "aa_encoder": {a: i for i, a in enumerate(aa_decoder)},
        "aa_decoder": list(aa_decoder),
        "bonds1": padded(_sym_table(BONDS1, bond_decoder)),
        "bonds2": padded(_sym_table(BONDS2, bond_decoder)),
        "bonds3": padded(_sym_table(BONDS3, bond_decoder)),
        "lennard_jones_rm": padded(_lj_table(bond_decoder)),
        "atom_hist": dict(atom_hist),
        "aa_hist": dict(aa_hist),
        "_pad_types": pad,
    }


# Dataset parameter registry, mirroring reference constants.py:95-183.
dataset_params = {
    "bindingmoad": _make_params(
        _LIG_DECODER_10, _AA_DECODER_20,
        {"C": 545542, "N": 90205, "O": 132965, "S": 9342, "B": 109,
         "Br": 1424, "Cl": 5516, "P": 5154, "I": 445, "F": 9742},
        {"A": 109798, "C": 31556, "D": 83921, "E": 79405, "F": 97083,
         "G": 139319, "H": 62661, "I": 99008, "K": 62403, "L": 155105,
         "M": 59977, "N": 70437, "P": 58833, "Q": 48254, "R": 74215,
         "S": 103286, "T": 90972, "V": 119954, "W": 42017, "Y": 90596},
    ),
    "crossdock_full": _make_params(
        _LIG_DECODER_11, _LIG_DECODER_11,
        {"C": 1570767, "N": 273858, "O": 396837, "S": 26352, "B": 0,
         "Br": 0, "Cl": 15058, "P": 25994, "I": 0, "F": 30687, "others": 0},
        {"C": 23302704, "N": 6093090, "O": 6701210, "S": 276805, "B": 0,
         "Br": 0, "Cl": 0, "P": 0, "I": 0, "F": 0, "others": 0},
    ),
    "crossdock": _make_params(
        _LIG_DECODER_10, _AA_DECODER_20,
        {"C": 1570032, "N": 273792, "O": 396623, "S": 26339, "B": 0,
         "Br": 0, "Cl": 15055, "P": 25975, "I": 0, "F": 30673},
        {"A": 277175, "C": 92406, "D": 254046, "E": 201833, "F": 234995,
         "G": 376966, "H": 147704, "I": 290683, "K": 173210, "L": 421883,
         "M": 157813, "N": 174241, "P": 148581, "Q": 120232, "R": 173848,
         "S": 274430, "T": 247605, "V": 326134, "W": 88552, "Y": 226668},
    ),
}
