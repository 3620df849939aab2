"""Redocking sanity evaluation for the native pose search (chem/dock.py).

For each reference example complex, redock the crystal ligand into its
receptor and record (a) the crystal pose's rescoring value, (b) the best
docked affinity, and (c) the RMSD of the best pose to the crystal.  The
search optimising its own objective BELOW the crystal score is the
meaningful invariant here (the Vina-style function is UNCALIBRATED, so
sub-2-A pose recovery is not expected — qvina2 itself reaches ~40-60%
top-1 < 2 A on curated sets with its calibrated function); the committed
artifact (examples/dock_redock.json) is pinned by tests/test_dock.py.

Usage: python scripts/dock_redock_eval.py [--json OUT] [--restarts 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

COMPLEXES = [
    ("3rfm", "/root/reference/example/3rfm.pdb",
     "/root/reference/example/3rfm_B_CFF.sdf"),
    ("5ndu", "/root/reference/example/5ndu.pdb",
     "/root/reference/example/5ndu_C_8V2.sdf"),
]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--json", default="examples/dock_redock.json")
    ap.add_argument("--restarts", type=int, default=256)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--mc_rounds", type=int, default=2)
    args = ap.parse_args(argv)

    from diffndm_tpu.chem.dock import dock_molecule
    from diffndm_tpu.chem.io import read_sdf
    from diffndm_tpu.chem.rmsd import symmetry_rmsd
    from diffndm_tpu.chem.scoring import VinaScorer

    out = {"restarts": args.restarts, "steps": args.steps,
           "mc_rounds": args.mc_rounds, "complexes": {}}
    for name, pdb, sdf in COMPLEXES:
        mol = read_sdf(sdf)[0]
        scorer = VinaScorer.from_pdb(pdb)
        crystal = scorer.score(mol)
        x0 = np.asarray(mol.coords)
        # pure local refinement from the crystal pose (qvina2
        # --local_only analogue): does the function hold a near-native
        # minimum at all?
        basin = dock_molecule(mol, scorer, n_restarts=1,
                              steps=args.steps, mc_rounds=0, seed=0)
        basin_rmsd = symmetry_rmsd(mol, basin.coords, x0)
        t0 = time.time()
        res = dock_molecule(mol, scorer, n_restarts=args.restarts,
                            steps=args.steps, mc_rounds=args.mc_rounds,
                            seed=0)
        dt = time.time() - t0
        rmsd = symmetry_rmsd(mol, res.coords, x0)
        # standard top-K sampling metric: best symmetry-RMSD over the
        # top distinct binding modes (Vina reports num_modes poses and
        # benchmark success is judged on them)
        top = [symmetry_rmsd(mol, pz, x0) for pz in res.top_poses[:5]]
        row = {"n_atoms": mol.n_atoms, "n_rot": res.n_rot,
               "crystal_score": round(crystal, 3),
               "crystal_basin_rmsd_A": round(basin_rmsd, 2),
               "crystal_basin_affinity": round(basin.affinity, 3),
               "docked_affinity": round(res.affinity, 3),
               "rmsd_best_to_crystal_A": round(rmsd, 2),
               "rmsd_top5_modes_A": round(min(top), 2),
               "top5_mode_rmsds": [round(r, 2) for r in top],
               "seconds": round(dt, 1),
               "improved_over_crystal": bool(res.affinity < crystal)}
        out["complexes"][name] = row
        print(f"{name}: {row}", flush=True)
    import jax

    out["platform"] = jax.devices()[0].platform
    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
