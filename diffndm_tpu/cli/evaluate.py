"""Evaluate generated SDF files: per-file and aggregate QED/SA/LogP/
Lipinski + validity ratio (reference my_new_evaluate.py / evaluate_try.py).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def check_sdf_file(path: str, props):
    from diffndm_tpu.chem.io import read_sdf
    from diffndm_tpu.chem.sanitize import SanitizeError, sanitize

    mols = read_sdf(path)
    rows = []
    for mol in mols:
        try:
            sanitize(mol)
            rows.append((props.calculate_qed(mol), props.calculate_sa(mol),
                         props.calculate_logp(mol),
                         props.calculate_lipinski(mol), 1))
        except SanitizeError:
            rows.append((0.0, 0.0, 0.0, 0, 0))
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("sdf_dir", type=str,
                   help="directory of SDF files (or a single file)")
    p.add_argument("--expected_per_file", type=int, default=20)
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--receptor", type=str, default=None,
                   help="receptor PDB: append a native Vina-style "
                        "affinity estimate per file "
                        "(chem/scoring.py; smina parity when binaries "
                        "exist, chem/docking.py)")
    p.add_argument("--dock", action="store_true",
                   help="with --receptor: run the native batched pose "
                        "SEARCH (chem/dock.py, the qvina2 analogue — "
                        "docking.py:53-130) instead of rescoring the "
                        "pose as-is; reports the best docked affinity "
                        "per molecule (slower: seconds per molecule)")
    p.add_argument("--dock_restarts", type=int, default=64,
                   help="parallel restarts per molecule for --dock "
                        "(qvina2 exhaustiveness analogue)")
    p.add_argument("--per_step", action="store_true",
                   help="group files by the trailing step number in their "
                        "names (e.g. try_100.sdf from the frame tap) and "
                        "report per-step aggregates, sorted by step "
                        "(reference my_new_evaluate_with_step.py)")
    args = p.parse_args(argv)

    from diffndm_tpu.chem.metrics import MoleculeProperties

    props = MoleculeProperties()
    paths = ([args.sdf_dir] if args.sdf_dir.endswith(".sdf") else
             sorted(os.path.join(args.sdf_dir, f)
                    for f in os.listdir(args.sdf_dir)
                    if f.endswith(".sdf")))
    if args.per_step:
        import re

        by_step = {}
        for path in paths:
            m = re.search(r"(\d+)\.sdf$", os.path.basename(path))
            if not m:
                continue
            by_step.setdefault(int(m.group(1)), []).append(path)
        lines = []
        for step in sorted(by_step):
            rows = []
            for path in by_step[step]:
                rows += [r for r in check_sdf_file(path, props) if r[4]]
            if not rows:
                lines.append(f"step {step}: no valid molecules")
                continue
            arr = np.array(rows, dtype=float)
            lines.append(
                f"step {step}: QED: {arr[:, 0].mean():.3f} +/- "
                f"{arr[:, 0].std():.2f}, SA: {arr[:, 1].mean():.3f} +/- "
                f"{arr[:, 1].std():.2f}, LogP: {arr[:, 2].mean():.3f} +/- "
                f"{arr[:, 2].std():.2f}, Lipinski: "
                f"{arr[:, 3].mean():.3f} +/- {arr[:, 3].std():.2f} "
                f"n: {len(rows)}")
        report = "\n".join(lines)
        print(report)
        if args.out:
            with open(args.out, "w") as f:
                f.write(report + "\n")
        return

    scorer = None
    if args.receptor:
        from diffndm_tpu.chem.scoring import VinaScorer

        scorer = VinaScorer.from_pdb(args.receptor)
        print("[evaluate] native Vina-style rescoring (Trott-Olson "
              "published weights, UNCALIBRATED vs smina — run "
              "chem.scoring.calibrate_against_smina on a machine with "
              "the binaries to fit per-term scales)")

    all_rows, lines = [], []
    for path in paths:
        rows = check_sdf_file(path, props)
        valid = [r for r in rows if r[4]]
        ratio = len(valid) / max(args.expected_per_file, 1)
        affinity = ""
        if scorer is not None:
            from diffndm_tpu.chem.io import read_sdf

            if args.dock:
                from diffndm_tpu.chem.dock import dock_molecules

                try:
                    batch = dock_molecules(
                        read_sdf(path), scorer,
                        n_restarts=args.dock_restarts)
                    vs = [r.affinity for r in batch if r is not None
                          and np.isfinite(r.affinity)]
                except Exception as e:
                    print(f"[evaluate] --dock failed on {path} "
                          f"({type(e).__name__}: {e})")
                    vs = []
                if vs:
                    affinity = f" dock~={float(np.mean(vs)):.2f}"
            else:
                vs = [scorer.score(m) for m in read_sdf(path)]
                if vs:
                    affinity = f" Vina~={float(np.mean(vs)):.2f}"
        if valid:
            arr = np.array(valid, dtype=float)
            lines.append(
                f"{os.path.basename(path)}: n={len(rows)} "
                f"valid_ratio={ratio:.2f} QED={arr[:, 0].mean():.3f} "
                f"SA={arr[:, 1].mean():.3f} LogP={arr[:, 2].mean():.3f} "
                f"Lipinski={arr[:, 3].mean():.3f}" + affinity)
        else:
            lines.append(f"{os.path.basename(path)}: n={len(rows)} "
                         f"valid_ratio=0.00")
        all_rows += valid
    if all_rows:
        arr = np.array(all_rows, dtype=float)
        lines.append(
            f"AGGREGATE over {len(all_rows)} valid molecules: "
            f"QED={arr[:, 0].mean():.3f}+-{arr[:, 0].std():.2f} "
            f"SA={arr[:, 1].mean():.3f}+-{arr[:, 1].std():.2f} "
            f"LogP={arr[:, 2].mean():.3f}+-{arr[:, 2].std():.2f} "
            f"Lipinski={arr[:, 3].mean():.3f}+-{arr[:, 3].std():.2f}")
    report = "\n".join(lines)
    print(report)
    if args.out:
        with open(args.out, "w") as f:
            f.write(report + "\n")


if __name__ == "__main__":
    main()
