"""Bond perception from 3D coordinates.

Two modes, mirroring the reference's two builders
(molecule_builder.py:58-136):

- ``bond_order_matrix`` — the blind EDM distance-table rule (single /
  double / triple by threshold), kept for parity tests.
- ``perceive_molecule`` — the default builder, playing the role
  OpenBabel's geometry+valence perception plays in the reference
  (``make_mol_openbabel``): connectivity by OpenBabel's ConnectTheDots
  rule (rcov_i + rcov_j + 0.45 A with longest-bond pruning at
  over-coordinated atoms — generated geometries stretch bonds well past
  the tabulated equilibrium lengths, and the reference's whole
  evaluation rides on OB connecting them), geometric kekulization of
  aromatic rings (maximum matching), then greedy valence-checked
  multiple-bond upgrades ordered by distance.  This avoids the EDM
  path's systematic failures (benzene at 1.39 A gets no double bonds;
  blind order overrides create valence violations).
"""

from __future__ import annotations

from typing import List

import numpy as np

from diffndm_tpu.chem.mol import Molecule
from diffndm_tpu.constants import (ALLOWED_BONDS, MARGIN1, MARGIN2, MARGIN3,
                                   OB_COVALENT_RADII, OB_MAX_BONDS)


def _tables(dataset_info):
    return (np.asarray(dataset_info["bonds1"]),
            np.asarray(dataset_info["bonds2"]),
            np.asarray(dataset_info["bonds3"]))


def bond_order_matrix(coords: np.ndarray, type_idx: np.ndarray,
                      dataset_info: dict) -> np.ndarray:
    """Blind EDM thresholding (molecule_builder.py:30-55): highest order
    whose tabulated length + margin exceeds the distance wins."""
    n = len(coords)
    if n == 0:
        return np.zeros((0, 0), dtype=np.int8)
    d = np.linalg.norm(coords[:, None, :] - coords[None, :, :], axis=-1)
    d = d * 100.0  # Angstrom -> pm
    t = np.asarray(type_idx)
    b1, b2, b3 = _tables(dataset_info)
    b1, b2, b3 = b1[t[:, None], t[None, :]], b2[t[:, None], t[None, :]], \
        b3[t[:, None], t[None, :]]
    order = np.zeros((n, n), dtype=np.int8)
    order[(d < b1 + MARGIN1) & (b1 > 0)] = 1
    order[(d < b2 + MARGIN2) & (b2 > 0)] = 2
    order[(d < b3 + MARGIN3) & (b3 > 0)] = 3
    np.fill_diagonal(order, 0)
    return order


def _max_valence(sym: str) -> int:
    v = ALLOWED_BONDS.get(sym, 0)
    return max(v) if isinstance(v, tuple) else v


def perceive_molecule(coords: np.ndarray, type_idx: np.ndarray,
                      dataset_info: dict) -> Molecule:
    """Geometry + valence bond perception (see module docstring)."""
    import networkx as nx

    n = len(coords)
    decoder = dataset_info["atom_decoder"]
    symbols = [decoder[int(i)] for i in type_idx]
    coords = np.asarray(coords, np.float64)
    if n == 0:
        return Molecule([], [], coords=coords)

    d = np.linalg.norm(coords[:, None, :] - coords[None, :, :], axis=-1) * 100
    t = np.asarray(type_idx)
    b1, b2, b3 = _tables(dataset_info)
    b1p = b1[t[:, None], t[None, :]]
    b2p = b2[t[:, None], t[None, :]]
    b3p = b3[t[:, None], t[None, :]]

    # 1) connectivity: OpenBabel's ConnectTheDots rule (the reference's
    # default builder, molecule_builder.py:58-97) — bond when
    # d < rcov_i + rcov_j + 45 pm (and d > 40 pm), then atoms exceeding
    # their OB maximum bond count drop their LONGEST bonds (smallest atom
    # index first; first-max neighbour on ties — the native scorer
    # mirrors this exactly).  Measured on the 2,000 committed
    # my_example_origion molecules: 0/43,649 reference bonds missed,
    # 100% rebuilt connectivity (the old single-bond-table rule
    # fragmented 89% of them).
    rcov = np.array([OB_COVALENT_RADII.get(s, 77.0) for s in symbols])
    conn = (d < rcov[:, None] + rcov[None, :] + 45.0) & (d > 40.0)
    np.fill_diagonal(conn, False)
    obcap = np.array([OB_MAX_BONDS.get(s, 4) for s in symbols])
    deg = conn.sum(1)
    while True:
        overs = np.nonzero(deg > obcap)[0]
        if len(overs) == 0:
            break
        a = int(overs[0])
        nb = np.nonzero(conn[a])[0]
        j = int(nb[np.argmax(d[a, nb])])
        conn[a, j] = conn[j, a] = False
        deg[a] -= 1
        deg[j] -= 1
    iu = np.triu_indices(n, k=1)
    edges = [(int(i), int(j)) for i, j in zip(*iu) if conn[i, j]]
    order = {e: 1 for e in edges}
    used = np.zeros(n)  # bond-order sum per atom
    for i, j in edges:
        used[i] += 1
        used[j] += 1
    cap = np.array([_max_valence(s) for s in symbols], dtype=float)

    g = nx.Graph(edges)
    g.add_nodes_from(range(n))

    # 2) aromatic ring kekulization: rings of 5-7 C/N/O/S atoms whose bond
    # lengths sit in the aromatic window (shorter than midway between the
    # single- and double-bond lengths, + slack)
    from diffndm_tpu.chem.rings import find_rings

    rings = find_rings(n, edges)
    arom_edges = set()
    arom_atoms = set()
    for ring in rings:
        if not (5 <= len(ring) <= 7):
            continue
        rs = set(ring)
        ring_edges = [(i, j) for (i, j) in edges if i in rs and j in rs]
        if len(ring_edges) != len(ring):
            continue  # fused/bridged handled ring-by-ring
        ok = True
        for a in ring:
            if symbols[a] not in ("C", "N", "O", "S") or g.degree[a] > 3:
                ok = False
                break
        if not ok:
            continue
        n_arom = 0
        for (i, j) in ring_edges:
            if b2p[i, j] > 0 and d[i, j] < (b1p[i, j] + b2p[i, j]) / 2 + 6:
                n_arom += 1
        if n_arom >= len(ring) - 1:
            arom_edges.update(ring_edges)
            arom_atoms.update(ring)

    if arom_edges:
        # perfect-matching kekulization over atoms that need one pi bond:
        # C always; N only if it has no H to donate (degree 3 exocyclic or
        # len-6 ring pyridine-like); O/S contribute lone pairs (no match).
        need = set()
        for a in arom_atoms:
            s = symbols[a]
            if s == "C":
                need.add(a)
            elif s == "N" and g.degree[a] == 2:
                need.add(a)  # prefer pyridine-like; matching may skip it
        # sorted edge order: the blossom result depends on adjacency
        # insertion order, and the native scorer inserts edges in sorted
        # order — keep both paths identical
        mm_edges = sorted((i, j) for (i, j) in arom_edges
                          if i in need and j in need)
        # prefer the native deterministic blossom (shared with the native
        # scorer, chemscore.cpp) so kekulization ties resolve identically
        # on both paths; networkx is the pure-Python fallback
        from diffndm_tpu.chem.native import max_matching_native

        nodes = sorted(need)
        remap = {a: k for k, a in enumerate(nodes)}
        nat = max_matching_native(len(nodes),
                                  [(remap[i], remap[j])
                                   for i, j in mm_edges]) \
            if mm_edges else None
        if nat is not None:
            matching = [(nodes[k], nodes[int(nat[k])])
                        for k in range(len(nodes))
                        if nat[k] >= 0 and k < int(nat[k])]
        else:
            mg = nx.Graph(mm_edges)
            matching = nx.max_weight_matching(mg, maxcardinality=True)
        for i, j in matching:
            e = (min(i, j), max(i, j))
            order[e] = 2
            used[i] += 1
            used[j] += 1

    # 3) greedy valence-checked multiple-bond upgrades outside aromatic
    # systems, closest (most double-like) pairs first
    cands = []
    for (i, j) in edges:
        if (i, j) in arom_edges:
            continue
        if b3p[i, j] > 0 and d[i, j] < b3p[i, j] + MARGIN3:
            cands.append((d[i, j] - b3p[i, j], 2, (i, j)))  # +2 -> triple
        elif b2p[i, j] > 0 and d[i, j] < b2p[i, j] + MARGIN2:
            cands.append((d[i, j] - b2p[i, j], 1, (i, j)))  # +1 -> double
    cands.sort()
    for _, inc, (i, j) in cands:
        if used[i] + inc <= cap[i] and used[j] + inc <= cap[j]:
            order[(i, j)] += inc
            used[i] += inc
            used[j] += inc

    bonds = [(i, j, order[(i, j)]) for (i, j) in edges]
    return Molecule(symbols, bonds, coords=coords)


def build_molecule(coords: np.ndarray, type_idx: np.ndarray,
                   dataset_info: dict, use_edm: bool = False) -> Molecule:
    """Point cloud -> Molecule (reference build_molecule,
    molecule_builder.py:139-159). Default path is the valence-aware
    perception; use_edm=True selects the blind table rule."""
    if not use_edm:
        return perceive_molecule(coords, type_idx, dataset_info)
    order = bond_order_matrix(coords, type_idx, dataset_info)
    decoder = dataset_info["atom_decoder"]
    symbols = [decoder[int(i)] for i in type_idx]
    iu = np.triu_indices(len(coords), k=1)
    bonds = [(int(i), int(j), int(order[i, j]))
             for i, j in zip(*iu) if order[i, j] > 0]
    return Molecule(symbols, bonds, coords=np.asarray(coords, np.float64))


def build_molecules_batch(coords: np.ndarray, types: np.ndarray,
                          mask: np.ndarray, dataset_info: dict
                          ) -> List[Molecule]:
    """Padded batch [B, N, ...] -> list of Molecules (mask-selected)."""
    out = []
    for b in range(coords.shape[0]):
        m = mask[b] > 0.5
        out.append(build_molecule(coords[b][m], types[b][m], dataset_info))
    return out
