"""Build a synthetic-pocket training set from posed ligand SDFs.

The image carries no CrossDocked/MOAD protein data, so end-to-end training
demos use *virtual pockets*: for each real 3D ligand we synthesise a
protein-like shell of heavy atoms at van-der-Waals contact distance around
it (with a solvent "mouth" opening, like a real binding site).  The ligands
themselves are real drug-like molecules — by default the 2,000 reference-
generated molecules committed under /root/reference/my_example_origion —
so a model trained on this set must learn genuine chemistry (valences,
bond lengths, ring geometry) to sample valid molecules.

Output: the reference's flat npz split format (dataset.py:7-50 semantics —
per-node arrays + sample-index "masks"), directly consumable by
diffndm_tpu.cli.train.

Usage:
  python scripts/make_virtual_dataset.py --out data/processed/virtual \
      [--sdf_dir DIR | --zip ZIP] [--max_lig 24] [--seed 0]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import tempfile
import zipfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

DEFAULT_ZIP = "/root/reference/my_example_origion/600_final.zip"

# protein heavy-atom composition (C/N/O/S), approximate over residue
# side chains + backbone
POCKET_TYPES = ["C", "N", "O", "S"]
POCKET_PROBS = [0.63, 0.17, 0.19, 0.01]


def synth_pocket(lig: np.ndarray, rng: np.random.Generator,
                 min_d: float = 3.3, max_d: float = 4.6,
                 min_lig_clash: float = 3.1, min_self: float = 2.8,
                 per_atom: int = 10, mouth_deg: float = 60.0
                 ) -> np.ndarray:
    """Sample a contact shell of pseudo-protein atoms around a ligand.

    Candidate points sit ``U(min_d, max_d)`` A from a random ligand atom;
    kept greedily if they clash with neither the ligand
    (>= min_lig_clash to every ligand atom) nor already-kept shell atoms
    (>= min_self).  A random cone of ``mouth_deg`` half-angle from the
    ligand COM is carved out as the solvent-exposed mouth.
    """
    n = len(lig)
    com = lig.mean(0)
    mouth_dir = rng.normal(size=3)
    mouth_dir /= np.linalg.norm(mouth_dir)
    cos_mouth = np.cos(np.deg2rad(mouth_deg))

    anchors = rng.integers(0, n, size=n * per_atom)
    dirs = rng.normal(size=(n * per_atom, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    dist = rng.uniform(min_d, max_d, size=(n * per_atom, 1))
    cand = lig[anchors] + dirs * dist

    # mouth carve-out
    rel = cand - com
    rel /= np.maximum(np.linalg.norm(rel, axis=1, keepdims=True), 1e-9)
    cand = cand[(rel @ mouth_dir) < cos_mouth]
    rng.shuffle(cand)

    # ligand clash filter (vectorised), then greedy self-spacing
    d_lig = np.linalg.norm(cand[:, None] - lig[None], axis=-1).min(1)
    cand = cand[d_lig >= min_lig_clash]
    kept: list[np.ndarray] = []
    for p in cand:
        if kept and np.min(np.linalg.norm(np.stack(kept) - p,
                                          axis=1)) < min_self:
            continue
        kept.append(p)
    return np.stack(kept) if kept else np.zeros((0, 3))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--sdf_dir", default=None)
    ap.add_argument("--zip", nargs="+", default=[DEFAULT_ZIP])
    ap.add_argument("--all_sets", action="store_true",
                    help="use every committed reference molecule set "
                         "(origion + SPSA + ATP + mix + 3 inpaint sets, "
                         "~10k valid molecules) instead of --zip")
    ap.add_argument("--max_lig", type=int, default=24,
                    help="skip ligands with more heavy atoms")
    ap.add_argument("--min_lig", type=int, default=8)
    ap.add_argument("--val_frac", type=float, default=0.05)
    ap.add_argument("--test_frac", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--require_valid",
                    action=argparse.BooleanOptionalAction, default=True)
    ap.add_argument("--require_connected",
                    action=argparse.BooleanOptionalAction, default=False,
                    help="additionally require the geometry-rebuilt "
                         "molecule to be one connected graph (a model "
                         "trained on fragmented point clouds faithfully "
                         "samples fragmented point clouds)")
    ap.add_argument("--min_sa", type=float, default=None,
                    help="drop ligands whose geometry-rebuilt molecule "
                         "scores below this Ertl SA (mapped (10-s)/9, "
                         "higher = easier to synthesise).  The model "
                         "tracks its training distribution, so an SA "
                         "floor lifts unguided sample SA the same way "
                         "--require_connected lifted connectivity")
    ap.add_argument("--dedup", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="drop exact duplicates (same symbols + coords "
                         "quantised to 1e-3 A) across the input sets")
    ap.add_argument("--pocket_per_atom", type=int, default=10,
                    help="candidate shell points per ligand atom; higher "
                         "gives denser pockets")
    ap.add_argument("--pocket_min_self", type=float, default=2.8,
                    help="minimum spacing between shell atoms (A); lower "
                         "gives denser pockets")
    args = ap.parse_args(argv)
    if args.all_sets:
        args.zip = [
            "/root/reference/my_example_origion/600_final.zip",
            "/root/reference/my_example_SPSA/100_30_2_o.zip",
            "/root/reference/my_example_ATP/60_15_100_o.zip",
            "/root/reference/my_example_mix/100_50_10_o.zip",
            "/root/reference/my_example_inpaint/origion_50_new.zip",
            "/root/reference/my_example_inpaint/SPSA_50_new.zip",
            "/root/reference/my_example_inpaint/ATP_50_new.zip",
        ]

    from diffndm_tpu.chem.bonds import build_molecule
    from diffndm_tpu.chem.io import read_sdf
    from diffndm_tpu.chem.properties import sa_score
    from diffndm_tpu.chem.sanitize import (SanitizeError,
                                           connectivity_fraction,
                                           sanitize)
    from diffndm_tpu.constants import dataset_params

    enc = dataset_params["crossdock_full"]["atom_encoder"]
    nf = len(enc)
    dataset_info = dataset_params["crossdock_full"]

    if args.sdf_dir is not None:
        sdf_dirs = [args.sdf_dir]
    else:
        sdf_dirs = []
        for zp in args.zip:
            tmp = tempfile.mkdtemp(prefix="virtual_sdf_")
            with zipfile.ZipFile(zp) as z:
                z.extractall(tmp)
            sdf_dirs.append(tmp)

    rng = np.random.default_rng(args.seed)
    pairs = []  # (lig_xyz, lig_oh, poc_xyz, poc_oh, name)
    n_skip_size = n_skip_type = n_skip_invalid = n_skip_dup = 0
    n_skip_disconnected = n_skip_sa = 0
    seen = set()
    files = []
    for d in sdf_dirs:
        files += sorted(glob.glob(os.path.join(d, "**", "*.sdf"),
                                  recursive=True))
    for path in files:
        base = os.path.splitext(os.path.basename(path))[0][:40]
        for mi, mol in enumerate(read_sdf(path)):
            if not (args.min_lig <= mol.n_atoms <= args.max_lig):
                n_skip_size += 1
                continue
            if any(s not in enc or s == "others" for s in mol.symbols):
                n_skip_type += 1
                continue
            xyz = np.asarray(mol.coords, np.float32)
            types = np.array([enc[s] for s in mol.symbols])
            if args.dedup:
                k = (tuple(types.tolist()),
                     tuple(np.round(xyz - xyz.mean(0), 3).ravel().tolist()))
                if k in seen:
                    n_skip_dup += 1
                    continue
                seen.add(k)
            if args.require_valid or args.require_connected \
                    or args.min_sa is not None:
                # keep the training distribution clean under the same
                # oracle the eval uses (geometry-derived bonds)
                built = build_molecule(xyz, types, dataset_info)
                if args.require_connected and \
                        connectivity_fraction(built) < 1.0:
                    n_skip_disconnected += 1
                    continue
                if args.require_valid:
                    try:
                        sanitize(built)
                    except SanitizeError:
                        n_skip_invalid += 1
                        continue
                if args.min_sa is not None and \
                        sa_score(built) < args.min_sa:
                    n_skip_sa += 1
                    continue
            poc = synth_pocket(xyz, rng, min_self=args.pocket_min_self,
                               per_atom=args.pocket_per_atom
                               ).astype(np.float32)
            if len(poc) < 16:
                n_skip_size += 1
                continue
            poc_t = rng.choice([enc[s] for s in POCKET_TYPES],
                               size=len(poc), p=POCKET_PROBS)
            lig_oh = np.eye(nf, dtype=np.float32)[types]
            poc_oh = np.eye(nf, dtype=np.float32)[poc_t]
            pairs.append((xyz, lig_oh, poc, poc_oh, f"{base}_{mi}"))

    rng.shuffle(pairs)
    n = len(pairs)
    n_val = max(int(n * args.val_frac), 1)
    n_test = max(int(n * args.test_frac), 1)
    splits = {"val": pairs[:n_val],
              "test": pairs[n_val:n_val + n_test],
              "train": pairs[n_val + n_test:]}
    os.makedirs(args.out, exist_ok=True)
    for split, items in splits.items():
        lig_c, lig_h, lig_m = [], [], []
        poc_c, poc_h, poc_m = [], [], []
        names = []
        for i, (lx, lh, px, ph, nm) in enumerate(items):
            lig_c.append(lx); lig_h.append(lh)
            lig_m.append(np.full(len(lx), i, np.int64))
            poc_c.append(px); poc_h.append(ph)
            poc_m.append(np.full(len(px), i, np.int64))
            names.append(nm)
        np.savez(os.path.join(args.out, f"{split}.npz"),
                 lig_coords=np.concatenate(lig_c),
                 lig_one_hot=np.concatenate(lig_h),
                 lig_mask=np.concatenate(lig_m),
                 pocket_coords=np.concatenate(poc_c),
                 pocket_one_hot=np.concatenate(poc_h),
                 pocket_mask=np.concatenate(poc_m),
                 names=np.array(names))
        print(f"{split}: {len(items)} pairs")
    # joint (ligand, pocket) size histogram for DistributionNodes — the
    # train CLI and eval sampling condition ligand sizes on pocket size
    # through it (process_crossdock.py:229-232 convention)
    from diffndm_tpu.diffusion.node_distribution import smoothed_histogram

    train_items = splits["train"]
    hist = smoothed_histogram([len(it[0]) for it in train_items],
                              [len(it[2]) for it in train_items])
    np.save(os.path.join(args.out, "size_distribution.npy"), hist)
    print(f"kept {n} / skipped size={n_skip_size} type={n_skip_type} "
          f"disconnected={n_skip_disconnected} "
          f"invalid={n_skip_invalid} low_sa={n_skip_sa} "
          f"dup={n_skip_dup}")


if __name__ == "__main__":
    main()
