"""Physico-chemical descriptors computed on the Molecule graph.

Replaces the RDKit descriptor calls used by the reference metrics
(analysis/metrics.py:138-179): Crippen LogP, H-bond donors/acceptors,
rotatable bonds, TPSA, molecular weight.

LogP follows the Wildman & Crippen (1999) atomic-contribution scheme with a
reduced atom-type system implemented as explicit graph rules instead of
SMARTS. Values track RDKit's ``Crippen.MolLogP`` closely on common
functional groups (see tests/test_chem.py anchors) but are not bit-exact —
when RDKit is importable the metrics layer prefers it automatically.
"""

from __future__ import annotations

import numpy as np

from diffndm_tpu.chem.mol import Molecule

# ---------------------------------------------------------------------------
# Wildman-Crippen style atomic LogP contributions
# ---------------------------------------------------------------------------
_C = {
    "C1": 0.1441, "C2": 0.0, "C3": -0.2035, "C4": -0.2051, "C5": -0.2783,
    "C6": 0.1551, "C7": 0.0017, "C8": 0.08452, "C10": -0.0516,
    "C11": 0.1193, "C12": -0.0967, "C15": 0.2450, "C16": 0.1980,
    "C17": 0.0, "C18": 0.1581, "C19": 0.2955, "C20": 0.2713, "C21": 0.1360,
    "C22": 0.4619, "C23": 0.5437, "C24": 0.1893, "C25": -0.8186,
    "CS": 0.08129,
    "H1": 0.1230, "H2": -0.2677, "H3": 0.2142, "H4": 0.2980,
    "N1": -1.0190, "N2": -0.7096, "N3": -1.0270, "N4": -0.5188,
    "N5": 0.08387, "N6": 0.1836, "N7": -0.3187, "N8": -0.4458,
    "N9": 0.01508, "N11": -0.3239, "N13": -0.3396, "NS": -0.4806,
    "O1": 0.1552, "O2": -0.2893, "O3": -0.0684, "O4": -0.4195,
    "O5": 0.0335, "O9": -0.1526, "O10": 0.1129, "O11": 0.4833,
    "OS": -0.1188,
    "F": 0.4202, "Cl": 0.6895, "Br": 0.8456, "I": 0.8857, "P": 0.8612,
    "S1": 0.6482, "S3": 0.6237, "Me": -0.3808,
}

_HET = {"N", "O", "P", "S", "F", "Cl", "Br", "I"}


def _carbon_type(mol: Molecule, i: int) -> str:
    nb = mol.neighbors[i]
    orders = [int(mol.adjacency[i, j]) for j in nb]
    arom = mol.is_aromatic_atom(i)
    het_nb = [j for j in nb if mol.symbols[j] in _HET]
    arom_nb = [j for j in nb if mol.is_aromatic_atom(j)
               and mol.symbols[j] == "C"]
    aroh_nb = [j for j in nb if mol.is_aromatic_atom(j)
               and mol.symbols[j] != "C"]
    if arom:
        # aromatic carbon, classified by its exocyclic substituent
        sub = [j for j in nb if not mol.is_aromatic_atom(j)
               or not mol.in_ring_bond(i, j)]
        if mol.implicit_h(i) > 0 and not sub:
            return "C18"
        ring_nb = [j for j in nb if mol.is_aromatic_atom(j)]
        if len(ring_nb) >= 3:
            return "C19"  # bridgehead
        for j in sub:
            sj = mol.symbols[j]
            if int(mol.adjacency[i, j]) == 2:
                return "C25"
            if sj == "N":
                return "C22"
            if sj == "O":
                return "C23"
            if sj == "S":
                return "C24"
            if sj == "F":
                return "C18"  # C14 = 0, treated with H-like weight
            if sj == "Cl":
                return "C15"
            if sj == "Br":
                return "C16"
            if sj == "I":
                return "C17"
            if sj == "C" and mol.is_aromatic_atom(j):
                return "C20"  # biaryl link
            if sj == "C":
                return "C21"
        return "C18"
    # aliphatic
    if any(o == 3 for o in orders):
        return "C7"
    if any(o == 2 for o in orders):
        dbl = [j for j in nb if int(mol.adjacency[i, j]) == 2]
        if any(mol.symbols[j] != "C" for j in dbl):
            return "C5"  # C=O / C=N
        return "C6"
    # sp3
    n_h = mol.implicit_h(i)
    if het_nb:
        return "C3" if n_h >= 2 else "C4"
    if arom_nb or aroh_nb:
        if n_h >= 3:
            return "C8"
        if n_h == 2:
            return "C10"
        if n_h == 1:
            return "C11"
        return "C12"
    return "C1" if n_h >= 2 else "C2"


def _nitrogen_type(mol: Molecule, i: int) -> str:
    nb = mol.neighbors[i]
    orders = [int(mol.adjacency[i, j]) for j in nb]
    if mol.is_aromatic_atom(i):
        return "N11"
    if any(o == 3 for o in orders):
        return "N9"  # nitrile
    n_h = mol.implicit_h(i)
    arom_nb = any(mol.is_aromatic_atom(j) for j in nb)
    # nitro: N with two O neighbours at least one double-bonded
    o_nb = [j for j in nb if mol.symbols[j] == "O"]
    if len(o_nb) >= 2 and any(int(mol.adjacency[i, j]) == 2 for j in o_nb):
        return "N13"
    if any(o == 2 for o in orders):
        return "N5" if n_h > 0 else "N6"
    if n_h >= 2:
        return "N3" if arom_nb else "N1"
    if n_h == 1:
        return "N4" if arom_nb else "N2"
    return "N8" if arom_nb else "N7"


def _oxygen_type(mol: Molecule, i: int) -> str:
    nb = mol.neighbors[i]
    if mol.is_aromatic_atom(i):
        return "O1"
    if any(int(mol.adjacency[i, j]) == 2 for j in nb):
        # carbonyl-family O
        j = nb[0]
        if mol.symbols[j] == "N":
            return "O5"
        if any(mol.is_aromatic_atom(k) for k in mol.neighbors[j]):
            return "O10"
        return "O9"  # ketone/aldehyde/acid/ester carbonyl
    if mol.implicit_h(i) > 0:
        return "O2"  # hydroxyl
    if any(mol.is_aromatic_atom(j) for j in nb):
        return "O4"  # aryl ether
    return "O3"  # ether


def crippen_logp(mol: Molecule) -> float:
    """Wildman-Crippen style LogP with implicit-H contributions."""
    total = 0.0
    for i, sym in enumerate(mol.symbols):
        n_h = mol.implicit_h(i)
        if sym == "C":
            total += _C[_carbon_type(mol, i)]
            total += n_h * _C["H1"]
        elif sym == "N":
            total += _C[_nitrogen_type(mol, i)]
            total += n_h * _C["H3"]
        elif sym == "O":
            t = _oxygen_type(mol, i)
            total += _C[t]
            if n_h:
                # acid OH vs alcohol OH
                carbonyl_nb = any(
                    any(int(mol.adjacency[j, k]) == 2
                        and mol.symbols[k] == "O"
                        for k in mol.neighbors[j])
                    for j in mol.neighbors[i] if mol.symbols[j] == "C")
                total += n_h * (_C["H4"] if carbonyl_nb else _C["H2"])
        elif sym == "S":
            total += _C["S3"] if mol.is_aromatic_atom(i) else _C["S1"]
            total += n_h * _C["H2"]
        elif sym in ("F", "Cl", "Br", "I", "P"):
            total += _C[sym]
        elif sym == "H":
            total += _C["H1"]
        else:
            total += _C["Me"]
    return float(total)


# ---------------------------------------------------------------------------
# H-bond donors / acceptors (Lipinski NHOH / NO definitions)
# ---------------------------------------------------------------------------

def num_hbd(mol: Molecule) -> int:
    """Lipinski.NumHDonors equivalent: count of N-H and O-H hydrogens'
    parent atoms (an atom with >=1 H counts once)."""
    n = 0
    for i, sym in enumerate(mol.symbols):
        if sym in ("N", "O") and mol.total_h(i) > 0:
            n += 1
    return n


def num_hba(mol: Molecule) -> int:
    """Lipinski.NumHAcceptors equivalent (NO count definition): all N and O
    atoms count."""
    return sum(1 for s in mol.symbols if s in ("N", "O"))


def num_rotatable_bonds(mol: Molecule) -> int:
    """CalcNumRotatableBonds (non-strict): single, non-ring bonds between
    two non-terminal heavy atoms, excluding bonds to triple-bonded atoms."""
    triple = set()
    for i, j, o in mol.bonds:
        if o == 3:
            triple.add(i)
            triple.add(j)
    n = 0
    for i, j, o in mol.bonds:
        if o != 1:
            continue
        if mol.degree(i) < 2 or mol.degree(j) < 2:
            continue
        if i in triple or j in triple:
            continue
        if mol.in_ring_bond(i, j):
            continue
        n += 1
    return n


# ---------------------------------------------------------------------------
# Ertl TPSA (2000), N/O contributions only (RDKit default)
# ---------------------------------------------------------------------------

def tpsa(mol: Molecule) -> float:
    total = 0.0
    for i, sym in enumerate(mol.symbols):
        nb = mol.neighbors[i]
        orders = [int(mol.adjacency[i, j]) for j in nb]
        n_h = mol.implicit_h(i)
        arom = mol.is_aromatic_atom(i)
        if sym == "N":
            if arom:
                if n_h > 0:
                    total += 15.79
                elif len(nb) >= 3:
                    total += 4.93  # substituted aromatic N
                else:
                    total += 12.89
            elif any(o == 3 for o in orders):
                total += 23.79
            elif any(o == 2 for o in orders):
                # nitro group
                o_nb = [j for j in nb if mol.symbols[j] == "O"]
                if len(o_nb) >= 2:
                    total += 11.68
                else:
                    total += 23.85 if n_h > 0 else 12.36
            else:
                total += {0: 3.24, 1: 12.03}.get(n_h, 26.02)
        elif sym == "O":
            if arom:
                total += 13.14
            elif any(o == 2 for o in orders):
                total += 17.07
            elif n_h > 0:
                total += 20.23
            else:
                total += 9.23
    return float(total)


def num_aromatic_rings(mol: Molecule) -> int:
    return len(mol.aromatic_rings)


def structural_alerts(mol: Molecule) -> int:
    """A reduced set of Brenk-style structural alerts detectable by graph
    rules (the QED ALERTS term; the full RDKit set is 94 SMARTS)."""
    n = 0
    adj = mol.adjacency
    syms = mol.symbols
    # O-O peroxide / N-N / S-S
    for i, j, o in mol.bonds:
        si, sj = syms[i], syms[j]
        if {si, sj} == {"O"}:
            n += 1
        if {si, sj} == {"S"}:
            n += 1
        if si == "N" and sj == "N" and o == 1:
            n += 1
        # acyl halide: C(=O)-X
        if (si == "C" and sj in ("Cl", "Br", "I")) or \
           (sj == "C" and si in ("Cl", "Br", "I")):
            c = i if si == "C" else j
            if any(int(adj[c, k]) == 2 and syms[k] == "O"
                   for k in mol.neighbors[c]):
                n += 1
    for i, s in enumerate(syms):
        nb = mol.neighbors[i]
        # aldehyde
        if s == "C" and mol.implicit_h(i) >= 1:
            if any(int(adj[i, j]) == 2 and syms[j] == "O" for j in nb):
                n += 1
        # thiol
        if s == "S" and mol.implicit_h(i) >= 1:
            n += 1
        # nitro group
        if s == "N":
            o_nb = [j for j in nb if syms[j] == "O"]
            if len(o_nb) >= 2 and any(int(adj[i, j]) == 2 for j in o_nb):
                n += 1
        # polyhalogenated carbon (>= 2 halogens on one C)
        if s == "C":
            halo = sum(1 for j in nb if syms[j] in ("F", "Cl", "Br", "I"))
            if halo >= 2:
                n += 1
        # acyclic imine C=N
        if s == "C" and not mol.ring_membership[i]:
            if any(int(adj[i, j]) == 2 and syms[j] == "N"
                   and not mol.ring_membership[j] for j in nb):
                n += 1
        # Michael acceptor: C=C-C=O conjugated, acyclic alkene end
        if s == "C" and not mol.is_aromatic_atom(i):
            for j in nb:
                if int(adj[i, j]) == 2 and syms[j] == "C":
                    for k in mol.neighbors[j]:
                        if k != i and syms[k] == "C" and any(
                                int(adj[k, l]) == 2 and syms[l] == "O"
                                for l in mol.neighbors[k]):
                            n += 1
    # long unbranched aliphatic chain (>= 7 sp3 CH2 in a row)
    run = _longest_ch2_run(mol)
    if run >= 7:
        n += 1
    # three-membered hetero ring (epoxide/aziridine)
    for r in mol.rings:
        if len(r) == 3 and any(syms[a] in ("N", "O", "S") for a in r):
            n += 1
    # --- extended Brenk-style rules (Brenk et al. 2008 list members that
    # are graph-detectable without SMARTS) ---
    for i, s in enumerate(syms):
        # phosphorus / boron / silicon (each an alert class of its own)
        if s in ("P", "B", "Si"):
            n += 1
        nb = mol.neighbors[i]
        dbl = [j for j in nb if int(adj[i, j]) == 2]
        if s == "N":
            # azo / diazo: N=N
            if any(syms[j] == "N" for j in dbl):
                n += 1
            # nitroso / N-oxide: exactly one N=O (nitro counted separately)
            o_dbl = [j for j in dbl if syms[j] == "O"]
            o_all = [j for j in nb if syms[j] == "O"]
            if len(o_dbl) == 1 and len(o_all) == 1:
                n += 1
            # hydroxylamine-like N-O single bond (not nitro)
            if any(int(adj[i, j]) == 1 and syms[j] == "O" for j in nb) \
                    and len(o_all) == 1 and not o_dbl:
                n += 1
        if s == "C":
            # thiocarbonyl C=S
            if any(syms[j] == "S" for j in dbl):
                n += 1
            # allene / cumulated double bonds C=C=C
            if len([j for j in dbl if syms[j] == "C"]) >= 2:
                n += 1
            # triple bond (alkyne / nitrile-adjacent handled by bond order)
            if any(int(adj[i, j]) == 3 and syms[j] == "C"
                   for j in nb):
                n += 1
            # thioester C(=O)-S
            if any(syms[j] == "O" for j in dbl) and \
                    any(int(adj[i, j]) == 1 and syms[j] == "S"
                        for j in nb):
                n += 1
            # enol ether / enamine: acyclic C=C with O/N substituent
            if not mol.ring_membership[i]:
                for j in dbl:
                    if syms[j] == "C" and not mol.ring_membership[j]:
                        if any(int(adj[i, k]) == 1
                               and syms[k] in ("O", "N")
                               for k in nb if k != j):
                            n += 1
        if s == "S":
            # sulfonic acid / sulfonate ester: S(=O)(=O)-O
            o_dbl = [j for j in dbl if syms[j] == "O"]
            if len(o_dbl) >= 2 and any(
                    int(adj[i, j]) == 1 and syms[j] == "O" for j in nb):
                n += 1
    # alkyne counted once per bond, not per endpoint
    n -= sum(1 for i, j, o in mol.bonds
             if o == 3 and syms[i] == "C" and syms[j] == "C")
    return n


def _longest_ch2_run(mol: Molecule) -> int:
    best = 0
    for start in range(mol.n_atoms):
        if not _is_ch2(mol, start):
            continue
        # simple DFS along CH2 chains
        stack = [(start, {start}, 1)]
        while stack:
            u, seen, depth = stack.pop()
            best = max(best, depth)
            for v in mol.neighbors[u]:
                if v not in seen and _is_ch2(mol, v):
                    stack.append((v, seen | {v}, depth + 1))
    return best


def _is_ch2(mol, i):
    return (mol.symbols[i] == "C" and not mol.is_aromatic_atom(i)
            and mol.implicit_h(i) == 2 and not mol.ring_membership[i])
