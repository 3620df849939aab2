"""Native docking: batched pose search over the Vina scoring function.

The reference docks generated ligands by shelling out to the qvina2
binary (analysis/docking.py:53-130: obabel pdbqt conversion, box centred
at the ligand COM, exhaustiveness 16).  No docking binary exists in this
image, so this module implements the search itself, TPU-first: a pose is
(translation, orientation quaternion, torsion angles) and the search is
hundreds of random restarts optimised IN PARALLEL with Adam on the
(piecewise-smooth) Vina terms — one jitted program, `vmap` over poses,
that runs on TPU or CPU with no external dependencies.  This replaces
qvina2's sequential Monte-Carlo + BFGS per pose with the batch-parallel
equivalent that actually fits the hardware.

Scoring matches chem/scoring.py (published Trott-Olson weights; the same
UNCALIBRATED caveat applies until a smina calibration can be run), plus
the intramolecular terms over flexible pairs and a quadratic search-box
penalty that qvina2 enforces via its grid bounds.

Torsions: rotatable bonds by the same rule as
descriptors.num_rotatable_bonds (single, acyclic, both ends non-terminal,
no triple-bond neighbour); each bond rotates the root-distal side, applied
root-to-leaf so nested axes follow earlier rotations (rigid-group tree, as
in AutoDock's torsion tree).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from diffndm_tpu.chem.mol import Molecule
from diffndm_tpu.chem.scoring import (W_GAUSS1, W_GAUSS2, W_HBOND,
                                      W_HYDROPHOBIC, W_NROT, W_REPULSION,
                                      VinaScorer, _atom_properties,
                                      hbond_direction_weight,
                                      ligand_hbond_types,
                                      neighbor_mean_operator)

_CUTOFF = 8.0


# ---------------------------------------------------------------------------
# torsion tree (host-side prep, pure graph work)
# ---------------------------------------------------------------------------

def _rotatable_bonds(mol: Molecule) -> List[Tuple[int, int]]:
    """Same rule as descriptors.num_rotatable_bonds (kept in lockstep by
    tests/test_dock.py)."""
    triple = set()
    for i, j, o in mol.bonds:
        if o == 3:
            triple.add(i)
            triple.add(j)
    out = []
    for i, j, o in mol.bonds:
        if o != 1:
            continue
        if mol.degree(i) < 2 or mol.degree(j) < 2:
            continue
        if i in triple or j in triple:
            continue
        if mol.in_ring_bond(i, j):
            continue
        out.append((i, j))
    return out


def _graph_distances(n: int, bonds: Sequence[Tuple[int, int, int]]
                     ) -> np.ndarray:
    """All-pairs BFS hop counts (n is tiny — ligands are <= ~60 atoms)."""
    adj = [[] for _ in range(n)]
    for i, j, _ in bonds:
        adj[i].append(j)
        adj[j].append(i)
    dist = np.full((n, n), 127, np.int32)
    for s in range(n):
        dist[s, s] = 0
        frontier = [s]
        d = 0
        while frontier:
            d += 1
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if dist[s, v] > d:
                        dist[s, v] = d
                        nxt.append(v)
            frontier = nxt
    return dist


@dataclass
class TorsionTree:
    """Host-side pose parameterisation for one ligand.

    axes: [K, 2] atom indices (a on the root side, b on the moving side);
    move: [K, N] bool — atoms rotated by torsion k (everything beyond b);
    ordered root-to-leaf so axis coordinates are current when each torsion
    is applied.  intra_pairs: [P, 2] ligand atom pairs scored
    intramolecularly (different rigid groups, graph distance >= 4 — the
    1-2/1-3/1-4 exclusion, Vina's convention).
    """

    n_atoms: int
    axes: np.ndarray        # [K, 2] int32
    move: np.ndarray        # [K, N] bool
    intra_pairs: np.ndarray  # [P, 2] int32
    n_rot: int

    @classmethod
    def from_molecule(cls, mol: Molecule) -> "TorsionTree":
        n = mol.n_atoms
        rot = _rotatable_bonds(mol)
        gd = _graph_distances(n, mol.bonds)

        # rigid groups: connected components after cutting rotatable bonds
        cut = {frozenset(b) for b in rot}
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i, j, _ in mol.bonds:
            if frozenset((i, j)) in cut:
                continue
            parent[find(i)] = find(j)
        group = np.array([find(i) for i in range(n)])

        # root = largest rigid group (AutoDock convention); BFS over the
        # group tree gives the root-to-leaf torsion order
        sizes = {g: int((group == g).sum()) for g in set(group.tolist())}
        root_g = max(sizes, key=lambda g: (sizes[g], -g))
        axes, move = [], []
        # bond -> which side moves: the side NOT containing the root group,
        # discovered by BFS from the root group over rotatable bonds
        adj = {}
        for (i, j) in rot:
            adj.setdefault(group[i], []).append((i, j))
            adj.setdefault(group[j], []).append((i, j))
        seen_g = {root_g}
        frontier = [root_g]
        seen_b = set()
        while True:
            while frontier:
                nxt = []
                for g in frontier:
                    for (i, j) in adj.get(g, []):
                        key = (i, j)
                        if key in seen_b:
                            continue
                        seen_b.add(key)
                        a, b = (i, j) if group[i] == g else (j, i)
                        # moving set: atoms whose path to a passes
                        # through b (= closer to b than to a in hop
                        # count, b's side of the cut; atoms in OTHER
                        # disconnected fragments have gd == 127 on both
                        # sides and stay fixed)
                        mv = gd[b] < gd[a]
                        axes.append((a, b))
                        move.append(mv)
                        gb = group[b]
                        if gb not in seen_g:
                            seen_g.add(gb)
                            nxt.append(gb)
                frontier = nxt
            # disconnected fragments (common in generated molecules):
            # restart the BFS from each remaining fragment's largest
            # rigid group so its torsions are parameterised too
            left = [g for g in adj if g not in seen_g]
            if not left:
                break
            root2 = max(left, key=lambda g: (sizes[g], -g))
            seen_g.add(root2)
            frontier = [root2]
        k = len(axes)
        axes_arr = (np.asarray(axes, np.int32) if k
                    else np.zeros((0, 2), np.int32))
        move_arr = (np.asarray(move, bool) if k
                    else np.zeros((0, n), bool))

        ii, jj = np.triu_indices(n, 1)
        flex = (group[ii] != group[jj]) & (gd[ii, jj] >= 4)
        intra = np.stack([ii[flex], jj[flex]], -1).astype(np.int32)
        return cls(n_atoms=n, axes=axes_arr, move=move_arr,
                   intra_pairs=intra, n_rot=k)


# ---------------------------------------------------------------------------
# jitted batch scoring + pose transform
# ---------------------------------------------------------------------------

def _vina_pair_terms(ds, hydro_ij, polar_ij):
    """Weighted Vina interaction energy per pair from surface distances
    (same five terms/constants as scoring.py:109-126)."""
    import jax.numpy as jnp

    gauss1 = jnp.exp(-((ds / 0.5) ** 2))
    gauss2 = jnp.exp(-(((ds - 3.0) / 2.0) ** 2))
    repulsion = jnp.where(ds < 0, ds ** 2, 0.0)
    h = jnp.clip(1.5 - ds, 0.0, 1.0) * hydro_ij
    g = jnp.clip(-ds / 0.7, 0.0, 1.0) * polar_ij
    return (W_GAUSS1 * gauss1 + W_GAUSS2 * gauss2 + W_REPULSION * repulsion
            + W_HYDROPHOBIC * h + W_HBOND * g)


def _safe_norm(v, axis=-1):
    """sqrt(sum(v^2) + eps): finite gradient at v == 0, unlike
    jnp.linalg.norm (whose NaN at 0 leaks through jnp.where masks —
    padded torsion axes and padded intra pairs sit exactly at 0)."""
    import jax.numpy as jnp

    return jnp.sqrt((v * v).sum(axis) + 1e-12)


def _quat_to_mat(q):
    import jax.numpy as jnp

    q = q / jnp.linalg.norm(q)
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _axis_rot(u, theta):
    """Rodrigues rotation matrix about unit axis u."""
    import jax.numpy as jnp

    c, s = jnp.cos(theta), jnp.sin(theta)
    ux, uy, uz = u[0], u[1], u[2]
    K = jnp.array([[0.0, -uz, uy], [uz, 0.0, -ux], [-uy, ux, 0.0]])
    return c * jnp.eye(3) + s * K + (1 - c) * jnp.outer(u, u)


def make_pose_fn(tree: TorsionTree, lig_x0: np.ndarray):
    """pose(trans, quat, torsions) -> ligand coords [N, 3].

    Torsions applied root-to-leaf on current coordinates (so nested axes
    track earlier rotations), then the rigid quaternion about the
    conformer centroid, then translation of the centroid to `trans`
    (absolute coordinates)."""
    import jax.numpy as jnp

    x0 = jnp.asarray(lig_x0, jnp.float32)
    axes = jnp.asarray(tree.axes)
    move = jnp.asarray(tree.move, bool)
    K = tree.n_rot

    def pose(trans, quat, torsions):
        x = x0
        for k in range(K):   # K is static and small; unrolled
            a = x[axes[k, 0]]
            b = x[axes[k, 1]]
            u = (b - a) / (_safe_norm(b - a) + 1e-9)
            R = _axis_rot(u, torsions[k])
            x = jnp.where(move[k][:, None], (x - a) @ R.T + a, x)
        com = x.mean(0)
        return (x - com) @ _quat_to_mat(quat).T + trans

    return pose


def make_score_fn(tree: TorsionTree, mol: Molecule, scorer: VinaScorer,
                  center: np.ndarray, box_size: float):
    """Batched pose objective.  Returns (objective(params) -> [P],
    inter(params) -> [P]) where params = (trans [P,3], quat [P,4],
    torsions [P,K]); objective = inter + intra + box penalty; `inter`
    alone (all receptor pairs within 8 A) is what the affinity estimate
    divides by the N_rot factor, matching scoring.py."""
    import jax
    import jax.numpy as jnp

    lig_x0 = np.asarray(mol.coords, np.float32)
    lig_r, lig_hydro, lig_polar = _atom_properties(lig_x0, mol.symbols)
    if mol.bonds:
        lig_don, lig_acc = ligand_hbond_types(mol)
        Anb, has_nb = neighbor_mean_operator(mol)
    else:
        lig_don = lig_acc = lig_polar
        Anb = np.zeros((len(lig_x0), len(lig_x0)), np.float32)
        has_nb = np.zeros(len(lig_x0), bool)

    # receptor atoms that any in-box ligand atom could see within cutoff
    ctr = np.asarray(center, np.float32)
    lig_radius = float(np.linalg.norm(
        lig_x0 - lig_x0.mean(0), axis=-1).max())
    reach = box_size / 2.0 + lig_radius + _CUTOFF
    keep = np.linalg.norm(scorer.rec_x - ctr, axis=-1) <= reach
    rec_x = jnp.asarray(scorer.rec_x[keep], jnp.float32)
    rec_r = jnp.asarray(scorer.rec_r[keep], jnp.float32)
    rec_h = jnp.asarray(scorer.rec_hydro[keep], bool)
    rec_don = scorer.rec_donor[keep]
    rec_acc = scorer.rec_acceptor[keep]
    rec_hd = jnp.asarray(scorer.rec_hdir[keep], jnp.float32)
    rec_hh = jnp.asarray(scorer.rec_hdir_has[keep])
    directional = bool(getattr(scorer, "directional_hbond", False))
    Aop = jnp.asarray(Anb)
    jhas_nb = jnp.asarray(has_nb)

    lr = jnp.asarray(lig_r, jnp.float32)
    inter_hydro = jnp.asarray(lig_hydro[:, None] & np.asarray(rec_h)[None])
    # hbond pairs: ligand donor vs receptor acceptor, either direction
    inter_polar = jnp.asarray((lig_don[:, None] & rec_acc[None])
                              | (lig_acc[:, None] & rec_don[None]))

    ip = tree.intra_pairs
    has_intra = len(ip) > 0
    if has_intra:
        intra_r = jnp.asarray(lig_r[ip[:, 0]] + lig_r[ip[:, 1]],
                              jnp.float32)
        intra_hydro = jnp.asarray(lig_hydro[ip[:, 0]]
                                  & lig_hydro[ip[:, 1]])
        intra_polar = jnp.asarray(
            (lig_don[ip[:, 0]] & lig_acc[ip[:, 1]])
            | (lig_acc[ip[:, 0]] & lig_don[ip[:, 1]]))
        ipa = jnp.asarray(ip)

    pose = make_pose_fn(tree, lig_x0)
    half = box_size / 2.0
    cj = jnp.asarray(ctr)

    def inter_energy(x):
        d = jnp.linalg.norm(x[:, None] - rec_x[None], axis=-1)
        ds = d - (lr[:, None] + rec_r[None])
        polar_w = inter_polar.astype(jnp.float32)
        if directional:
            # pose-covariant ligand base directions (see scoring.py)
            v = x - Aop @ x
            nv = _safe_norm(v)[:, None]
            ldir = jnp.where(nv > 1e-4, v / nv, 0.0)
            lhas = jhas_nb & (nv[:, 0] > 1e-4)
            polar_w = polar_w * hbond_direction_weight(
                x, ldir, lhas, rec_x, rec_hd, rec_hh, d, xp=jnp)
        e = _vina_pair_terms(ds, inter_hydro, polar_w)
        return jnp.where(d < _CUTOFF, e, 0.0).sum()

    def one(trans, quat, torsions):
        x = pose(trans, quat, torsions)
        inter = inter_energy(x)
        intra = 0.0
        if has_intra:
            dd = _safe_norm(x[ipa[:, 0]] - x[ipa[:, 1]])
            e = _vina_pair_terms(dd - intra_r, intra_hydro, intra_polar)
            intra = jnp.where(dd < _CUTOFF, e, 0.0).sum()
        # qvina2 restricts poses to the grid box; quadratic penalty on
        # atoms leaving it keeps the objective smooth
        out = jnp.clip(jnp.abs(x - cj) - half, 0.0, None)
        box_pen = (out ** 2).sum()
        return inter + intra + 10.0 * box_pen, inter

    vone = jax.vmap(one)

    def objective(trans, quat, torsions):
        return vone(trans, quat, torsions)[0]

    def inter_of(trans, quat, torsions):
        return vone(trans, quat, torsions)[1]

    return objective, inter_of, pose


# ---------------------------------------------------------------------------
# search driver
# ---------------------------------------------------------------------------

@dataclass
class DockResult:
    coords: np.ndarray        # [N, 3] best pose
    affinity: float           # inter / (1 + w_rot * n_rot), kcal/mol-like
    inter: float
    objective: float
    n_rot: int
    n_restarts: int
    all_affinities: np.ndarray  # [P] per-restart final affinities
    # top distinct binding modes (qvina2's num_modes output): poses
    # sorted by objective, greedily deduplicated at 2 A RMSD — None on
    # paths that do not compute them (batched dock_molecules)
    top_poses: Optional[np.ndarray] = None      # [K, N, 3]
    top_affinities: Optional[np.ndarray] = None  # [K]


def cluster_poses(coords_all: np.ndarray, order: np.ndarray,
                  rmsd_thresh: float = 2.0, max_modes: int = 9
                  ) -> List[int]:
    """Greedy Vina-style mode clustering: walk poses in score order,
    keep one representative per >= rmsd_thresh-distinct cluster."""
    reps: List[int] = []
    for i in order:
        xi = coords_all[i]
        distinct = True
        for j in reps:
            if np.sqrt(((xi - coords_all[j]) ** 2).sum(-1).mean()) \
                    < rmsd_thresh:
                distinct = False
                break
        if distinct:
            reps.append(int(i))
            if len(reps) >= max_modes:
                break
    return reps


def dock_molecule(mol: Molecule, scorer: VinaScorer,
                  center: Optional[np.ndarray] = None,
                  box_size: float = 20.0, n_restarts: int = 256,
                  steps: int = 200, mc_rounds: int = 2,
                  seed: int = 0, lr: float = 0.25) -> DockResult:
    """Dock one ligand: batched random restarts, Adam refinement, and
    basin-hopping rounds (perturb survivors, re-optimise, keep
    improvements) — the parallel analogue of qvina2's MC+BFGS at
    exhaustiveness ~ n_restarts.  Box centred on `center` (ligand COM
    when None, the reference's convention, docking.py:69-75)."""
    import jax
    import jax.numpy as jnp
    import optax

    if mol.coords is None:
        raise ValueError("ligand needs 3D coordinates")
    tree = TorsionTree.from_molecule(mol)
    ctr = (np.asarray(mol.coords, np.float32).mean(0)
           if center is None else np.asarray(center, np.float32))
    objective, inter_of, pose = make_score_fn(tree, mol, scorer, ctr,
                                              box_size)
    K = tree.n_rot
    P = n_restarts

    # consume the seed key fully: k1..k3 initialise the restarts and the
    # surviving `key` is fresh for the MC rounds (split(k, 2) is a prefix
    # of split(k, 3), so re-splitting the original key would hand the MC
    # perturbations the very keys that built the initial poses)
    k1, k2, k3, key = jax.random.split(jax.random.PRNGKey(seed), 4)
    trans = ctr + jax.random.uniform(k1, (P, 3), minval=-box_size / 2,
                                     maxval=box_size / 2) * 0.8
    quat = jax.random.normal(k2, (P, 4))
    tors = jax.random.uniform(k3, (P, max(K, 1)), minval=-np.pi,
                              maxval=np.pi)[:, :K]
    # restart 0 = the input pose (local refinement of the given
    # conformer — for generated molecules this is the pose the model
    # placed in the pocket, the one qvina2's --local_only would refine)
    com0 = np.asarray(mol.coords, np.float32).mean(0)
    trans = trans.at[0].set(jnp.asarray(com0))
    quat = quat.at[0].set(jnp.asarray([1.0, 0.0, 0.0, 0.0]))
    if K:
        tors = tors.at[0].set(jnp.zeros((K,)))

    # cosine decay: large early moves to escape clashes, fine late ones
    opt = optax.adam(optax.cosine_decay_schedule(lr, max(steps, 1),
                                                 alpha=0.05))

    def loss(params):
        return objective(*params).sum()

    from functools import partial

    @partial(jax.jit, static_argnums=2)
    def refine(params, opt_state, n):
        def body(carry, _):
            p, s = carry
            g = jax.grad(loss)(p)
            up, s = opt.update(g, s, p)
            return (jax.tree.map(lambda a, b: a + b, p, up), s), None

        (params, opt_state), _ = jax.lax.scan(body, (params, opt_state),
                                              None, length=n)
        return params, opt_state

    params = (trans, quat, tors)
    opt_state = opt.init(params)
    params, opt_state = refine(params, opt_state, steps)

    @jax.jit
    def perturb(params, key, scale):
        kt, kq, ko = jax.random.split(key, 3)
        t, q, th = params
        return (t + scale * jax.random.normal(kt, t.shape),
                q + 0.3 * scale * jax.random.normal(kq, q.shape),
                th + (np.pi / 2) * scale
                * jax.random.normal(ko, th.shape))

    best = params
    best_obj = np.asarray(objective(*params))
    for r in range(mc_rounds):
        key, sub = jax.random.split(key)
        cand = perturb(best, sub, 1.0)
        cand, opt_state = refine(cand, opt.init(cand), steps // 2)
        obj = np.asarray(objective(*cand))
        take = obj < best_obj
        best = jax.tree.map(
            lambda b, c: jnp.where(
                jnp.asarray(take).reshape((-1,) + (1,) * (b.ndim - 1)),
                c, b), best, cand)
        best_obj = np.where(take, obj, best_obj)

    inter = np.asarray(inter_of(*best))
    denom = 1.0 + W_NROT * tree.n_rot
    aff = inter / denom
    i_best = int(best_obj.argmin())
    all_x = np.asarray(jax.vmap(pose)(*best))        # [P, N, 3]
    x_best = all_x[i_best]
    reps = cluster_poses(all_x, np.argsort(best_obj))
    return DockResult(coords=x_best, affinity=float(aff[i_best]),
                      inter=float(inter[i_best]),
                      objective=float(best_obj[i_best]),
                      n_rot=tree.n_rot, n_restarts=P,
                      all_affinities=aff,
                      top_poses=all_x[reps],
                      top_affinities=aff[reps])


def calculate_native_dock_score(receptor_file: str, sdf_file: str,
                                out_dir: Optional[str] = None,
                                box_size: float = 20.0,
                                n_restarts: int = 256, steps: int = 200,
                                seed: int = 0) -> List[float]:
    """Drop-in native analogue of docking.calculate_qvina2_score
    (docking.py:53-130): docks every molecule in `sdf_file` into the
    receptor, box at each ligand's COM (size 20 reference default),
    returns one affinity per molecule and optionally writes the docked
    poses to ``out_dir/<name>_docked.sdf``."""
    from diffndm_tpu.chem.io import read_sdf, write_sdf

    scorer = VinaScorer.from_pdb(receptor_file)
    mols = read_sdf(sdf_file)
    try:
        batch = dock_molecules(mols, scorer, box_size=box_size,
                               n_restarts=n_restarts, steps=steps,
                               seed=seed)
    except Exception as e:
        # fall through to the per-molecule path, but never silently: a
        # systematic failure here is a bug, not an invalid molecule
        print(f"[dock] batched path failed ({type(e).__name__}: {e}); "
              f"falling back per molecule", flush=True)
        batch = [None] * len(mols)
    scores: List[float] = []
    docked = []
    for i, (mol, res) in enumerate(zip(mols, batch)):
        if res is None and mol is not None and mol.coords is not None:
            try:  # per-molecule fallback if the batch path failed
                res = dock_molecule(mol, scorer, box_size=box_size,
                                    n_restarts=n_restarts, steps=steps,
                                    seed=seed + i)
            except Exception as e:
                print(f"[dock] molecule {i} failed "
                      f"({type(e).__name__}: {e})", flush=True)
                res = None
        if res is None:
            scores.append(float("nan"))
            docked.append(mol)
            continue
        scores.append(res.affinity)
        m2 = Molecule(symbols=list(mol.symbols), bonds=list(mol.bonds),
                      coords=res.coords)
        docked.append(m2)
    if out_dir is not None:
        import os

        os.makedirs(out_dir, exist_ok=True)
        base = os.path.splitext(os.path.basename(sdf_file))[0]
        write_sdf(os.path.join(out_dir, f"{base}_docked.sdf"), docked)
    return scores


# ---------------------------------------------------------------------------
# batched multi-molecule docking (shape-bucketed)
# ---------------------------------------------------------------------------

def _ceil_to(n: int, m: int) -> int:
    return -(-max(n, 1) // m) * m


def _pose_one_padded(x0m, am, axm, tm, mvm, quat, tors):
    """Torsions (root-to-leaf, padded axes masked by tm) + rigid rotation
    about the REAL-atom centroid.  Translation is applied by the caller."""
    import jax.numpy as jnp

    x = x0m
    for k in range(axm.shape[0]):   # static at trace time
        a = x[axm[k, 0]]
        b = x[axm[k, 1]]
        u = (b - a) / (_safe_norm(b - a) + 1e-9)
        R = _axis_rot(u, tors[k])
        rot = (x - a) @ R.T + a
        x = jnp.where((tm[k] & mvm[k])[:, None], rot, x)
    na = jnp.maximum(am.sum(), 1.0)
    com = (x * am[:, None]).sum(0) / na
    return (x - com) @ _quat_to_mat(quat).T


def _bucket_both(consts, rec, half, trans, quat, tors):
    """(objective [M, P], inter [M, P]) for one shape bucket.  Module
    level (not a per-call closure) so jax.jit caches the compiled
    program across dock_molecules calls with the same bucket shapes."""
    import jax
    import jax.numpy as jnp

    rec_x, rec_r, rec_h, rec_don, rec_acc, rec_hd, rec_hh = rec

    def energy_one(x0m, am, lrm, lhm, ldm, lam, anm, hnm, axm, tm, mvm,
                   ipm, imm, irm, ihm, ipolm, cm, trans, quat, tors):
        x = _pose_one_padded(x0m, am, axm, tm, mvm, quat, tors) + trans
        d = jnp.linalg.norm(x[:, None] - rec_x[None], axis=-1)
        ds = d - (lrm[:, None] + rec_r[None])
        pw = ((ldm[:, None] & rec_acc[None])
              | (lam[:, None] & rec_don[None])).astype(jnp.float32)
        # directional H-bond weight; an all-False rec_hh (non-directional
        # scorer) makes this a no-op without retracing
        v = x - anm @ x
        nv = _safe_norm(v)[:, None]
        ldir = jnp.where(nv > 1e-4, v / nv, 0.0)
        lhas = hnm & (nv[:, 0] > 1e-4)
        pw = pw * hbond_direction_weight(x, ldir, lhas, rec_x, rec_hd,
                                         rec_hh, d, xp=jnp)
        e = _vina_pair_terms(ds, lhm[:, None] & rec_h[None], pw)
        within = (d < _CUTOFF) & (am[:, None] > 0.5)
        inter = jnp.where(within, e, 0.0).sum()
        dd = _safe_norm(x[ipm[:, 0]] - x[ipm[:, 1]])
        ei = _vina_pair_terms(dd - irm, ihm, ipolm)
        intra = jnp.where((dd < _CUTOFF) & (imm > 0.5), ei, 0.0).sum()
        out = jnp.clip(jnp.abs(x - cm) - half, 0.0, None) * am[:, None]
        return inter + intra + 10.0 * (out ** 2).sum(), inter

    e_restarts = jax.vmap(energy_one, in_axes=(None,) * 17 + (0, 0, 0))
    e_all = jax.vmap(e_restarts)
    return e_all(*consts, trans, quat, tors)


def _bucket_energy(consts, rec, half, params):
    return _bucket_both(consts, rec, half, *params)


def _bucket_refine(consts, rec, half, params, n, sched_len, lr):
    """n Adam steps on the bucket objective; schedule spans sched_len
    (the full first-stage step count, so MC re-refines reuse the early
    high-lr part — matching the original per-call behaviour)."""
    import jax
    import optax

    opt = optax.adam(optax.cosine_decay_schedule(lr, max(sched_len, 1),
                                                 alpha=0.05))

    def loss(p):
        return _bucket_both(consts, rec, half, *p)[0].sum()

    def body(carry, _):
        pr, st = carry
        g = jax.grad(loss)(pr)
        up, st = opt.update(g, st, pr)
        return (jax.tree.map(lambda a_, b_: a_ + b_, pr, up), st), None

    (params, _), _ = jax.lax.scan(body, (params, opt.init(params)),
                                  None, length=n)
    return params


def _bucket_perturb(params, pkey, scale):
    import jax

    kt, kq, ko = jax.random.split(pkey, 3)
    t, q, th = params
    return (t + scale * jax.random.normal(kt, t.shape),
            q + 0.3 * scale * jax.random.normal(kq, q.shape),
            th + (np.pi / 2) * scale * jax.random.normal(ko, th.shape))


_BUCKET_JIT: dict = {}


def _bucket_programs():
    """Jitted entry points, created once — compilation then caches on
    argument shapes (one compile per bucket shape per process)."""
    if not _BUCKET_JIT:
        import jax
        from functools import partial

        _BUCKET_JIT["energy"] = jax.jit(_bucket_energy)
        _BUCKET_JIT["refine"] = partial(
            jax.jit, static_argnums=(4, 5, 6))(_bucket_refine)
        _BUCKET_JIT["perturb"] = jax.jit(_bucket_perturb)
    return _BUCKET_JIT


def dock_molecules(mols: Sequence[Molecule], scorer: VinaScorer,
                   centers: Optional[Sequence[np.ndarray]] = None,
                   box_size: float = 20.0, n_restarts: int = 128,
                   steps: int = 200, mc_rounds: int = 1, seed: int = 0,
                   lr: float = 0.25) -> List[Optional[DockResult]]:
    """Dock a whole molecule list against one receptor in a handful of
    jitted programs: molecules are bucketed by padded (atom count,
    torsion count) shape and each bucket runs as ONE [M, P]-batched
    optimisation (vmap over molecules x restarts).  On TPU this is the
    difference between ~30 s of compilation per distinct molecule shape
    and one compile per bucket — the sweep-scale path behind
    ``cli/evaluate.py --dock`` (a 20-molecule pocket sweep typically
    lands in 2-3 buckets).

    Semantics per molecule match dock_molecule (same terms, same
    restart-0 input-pose seeding); padded atoms/torsions/pairs are
    masked out of every energy term and the rigid rotation centres on
    the REAL-atom centroid.  Returns one DockResult per input (None for
    molecules without coordinates)."""
    import jax
    import jax.numpy as jnp

    if centers is None:
        centers = [None] * len(mols)
    # bucket key: (padded atoms, padded torsions, padded intra pairs)
    prepped = []
    for i, mol in enumerate(mols):
        if mol is None or mol.coords is None:
            prepped.append(None)
            continue
        tree = TorsionTree.from_molecule(mol)
        prepped.append((i, mol, tree))
    buckets: dict = {}
    for item in prepped:
        if item is None:
            continue
        i, mol, tree = item
        key = (_ceil_to(mol.n_atoms, 8), _ceil_to(tree.n_rot, 4),
               _ceil_to(len(tree.intra_pairs), 64))
        buckets.setdefault(key, []).append(item)

    results: List[Optional[DockResult]] = [None] * len(mols)
    P = n_restarts
    for (n_pad, k_pad, p_pad), items in sorted(buckets.items()):
        M = len(items)
        x0 = np.zeros((M, n_pad, 3), np.float32)
        amask = np.zeros((M, n_pad), np.float32)
        lr_a = np.zeros((M, n_pad), np.float32)
        lhyd = np.zeros((M, n_pad), bool)
        ldon = np.zeros((M, n_pad), bool)
        lacc = np.zeros((M, n_pad), bool)
        anb = np.zeros((M, n_pad, n_pad), np.float32)
        hnb = np.zeros((M, n_pad), bool)
        axes = np.zeros((M, k_pad, 2), np.int32)
        tmask = np.zeros((M, k_pad), bool)
        move = np.zeros((M, k_pad, n_pad), bool)
        ip = np.zeros((M, p_pad, 2), np.int32)
        imask = np.zeros((M, p_pad), np.float32)
        ir = np.zeros((M, p_pad), np.float32)
        ihyd = np.zeros((M, p_pad), bool)
        ipol = np.zeros((M, p_pad), bool)
        ctr = np.zeros((M, 3), np.float32)
        radius = 0.0
        for m, (i, mol, tree) in enumerate(items):
            n = mol.n_atoms
            k = tree.n_rot
            p = len(tree.intra_pairs)
            xm = np.asarray(mol.coords, np.float32)
            x0[m, :n] = xm
            amask[m, :n] = 1.0
            r_, h_, p_ = _atom_properties(xm, mol.symbols)
            d_, a_ = (ligand_hbond_types(mol) if mol.bonds
                      else (p_, p_))
            lr_a[m, :n] = r_
            lhyd[m, :n] = h_
            ldon[m, :n] = d_
            lacc[m, :n] = a_
            if mol.bonds:
                A_, hn_ = neighbor_mean_operator(mol)
                anb[m, :n, :n] = A_
                hnb[m, :n] = hn_
            if k:
                axes[m, :k] = tree.axes
                tmask[m, :k] = True
                move[m, :k, :n] = tree.move
            if p:
                ip[m, :p] = tree.intra_pairs
                imask[m, :p] = 1.0
                ir[m, :p] = (r_[tree.intra_pairs[:, 0]]
                             + r_[tree.intra_pairs[:, 1]])
                ihyd[m, :p] = (h_[tree.intra_pairs[:, 0]]
                               & h_[tree.intra_pairs[:, 1]])
                ipol[m, :p] = (
                    (d_[tree.intra_pairs[:, 0]]
                     & a_[tree.intra_pairs[:, 1]])
                    | (a_[tree.intra_pairs[:, 0]]
                       & d_[tree.intra_pairs[:, 1]]))
            c = centers[i]
            ctr[m] = (xm.mean(0) if c is None
                      else np.asarray(c, np.float32))
            radius = max(radius, float(np.linalg.norm(
                xm - xm.mean(0), axis=-1).max()))
        # shared receptor crop: atoms any in-box ligand atom could reach
        reach = box_size / 2.0 + radius + _CUTOFF
        keep = (np.linalg.norm(scorer.rec_x[None] - ctr[:, None], axis=-1)
                <= reach).any(0)
        rec = (jnp.asarray(scorer.rec_x[keep], jnp.float32),
               jnp.asarray(scorer.rec_r[keep], jnp.float32),
               jnp.asarray(scorer.rec_hydro[keep]),
               jnp.asarray(scorer.rec_donor[keep]),
               jnp.asarray(scorer.rec_acceptor[keep]),
               jnp.asarray(
                   scorer.rec_hdir[keep], jnp.float32),
               jnp.asarray(
                   scorer.rec_hdir_has[keep]
                   if getattr(scorer, "directional_hbond", False)
                   else np.zeros(int(keep.sum()), bool)))
        half = box_size / 2.0

        consts = tuple(jnp.asarray(a) for a in
                       (x0, amask, lr_a, lhyd, ldon, lacc, anb, hnb,
                        axes, tmask, move, ip, imask, ir, ihyd, ipol,
                        ctr))
        jctr = consts[-1]
        prog = _bucket_programs()

        k1, k2, k3, key = jax.random.split(jax.random.PRNGKey(seed), 4)
        trans = jctr[:, None] + jax.random.uniform(
            k1, (M, P, 3), minval=-half, maxval=half) * 0.8
        quat = jax.random.normal(k2, (M, P, 4))
        tors = jax.random.uniform(k3, (M, P, k_pad), minval=-np.pi,
                                  maxval=np.pi)
        # restart 0 = input pose (the generated placement)
        com0 = (x0 * amask[..., None]).sum(1) \
            / np.maximum(amask.sum(1), 1)[:, None]
        trans = trans.at[:, 0].set(jnp.asarray(com0))
        quat = quat.at[:, 0].set(jnp.asarray([1.0, 0.0, 0.0, 0.0]))
        tors = tors.at[:, 0].set(0.0)

        params = (trans, quat, tors)
        params = prog["refine"](consts, rec, half, params, steps, steps,
                                lr)

        best = params
        best_obj = np.asarray(prog["energy"](consts, rec, half,
                                             params)[0])  # [M, P]
        for _ in range(mc_rounds):
            key, sub = jax.random.split(key)
            cand = prog["perturb"](best, sub, 1.0)
            cand = prog["refine"](consts, rec, half, cand, steps // 2,
                                  steps, lr)
            obj = np.asarray(prog["energy"](consts, rec, half, cand)[0])
            take = obj < best_obj
            tk = jnp.asarray(take)
            best = jax.tree.map(
                lambda b_, c_: jnp.where(
                    tk.reshape(tk.shape + (1,) * (b_.ndim - 2)), c_, b_),
                best, cand)
            best_obj = np.where(take, obj, best_obj)

        obj_f, inter_f = prog["energy"](consts, rec, half, best)
        obj_f = np.asarray(obj_f)
        inter_f = np.asarray(inter_f)
        jx0, jmask = consts[0], consts[1]
        jaxes, jtmask, jmove = consts[8], consts[9], consts[10]
        for m, (i, mol, tree) in enumerate(items):
            denom = 1.0 + W_NROT * tree.n_rot
            aff = inter_f[m] / denom
            ib = int(obj_f[m].argmin())
            x_best = np.asarray(
                _pose_one_padded(jx0[m], jmask[m], jaxes[m], jtmask[m],
                                 jmove[m], best[1][m, ib],
                                 best[2][m, ib])
                + best[0][m, ib])[: mol.n_atoms]
            results[i] = DockResult(
                coords=x_best, affinity=float(aff[ib]),
                inter=float(inter_f[m, ib]),
                objective=float(obj_f[m, ib]), n_rot=tree.n_rot,
                n_restarts=P, all_affinities=aff)
    return results
