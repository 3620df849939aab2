"""Reorganize CrossDocked test-set receptors / reference ligands /
baseline-method outputs into flat evaluation directories
(reference data/prepare_crossdocked.py:10-55)."""

from __future__ import annotations

import os
import shutil
from typing import Optional


def prepare_crossdocked(basedir: str, outdir: str,
                        split_test_names: Optional[list] = None) -> int:
    """Copy <basedir>/crossdocked_pocket10/<dir>/<rec>.pdb and matching
    <lig>.sdf pairs into flat <outdir>/test/ with canonical names.
    Returns the number of complexes prepared."""
    os.makedirs(os.path.join(outdir, "test"), exist_ok=True)
    n = 0
    root = os.path.join(basedir, "crossdocked_pocket10")
    if not os.path.isdir(root):
        root = basedir
    for dirpath, _, files in os.walk(root):
        sdfs = [f for f in files if f.endswith(".sdf")]
        pdbs = [f for f in files if f.endswith(".pdb")]
        for sdf in sdfs:
            stem = sdf[:-4]
            rec = None
            for pdb in pdbs:
                if stem.startswith(pdb[:-4].split("_rec")[0]):
                    rec = pdb
                    break
            if rec is None and pdbs:
                rec = pdbs[0]
            if rec is None:
                continue
            name = stem.replace("/", "_")
            if split_test_names is not None and name not in \
                    split_test_names:
                continue
            shutil.copy(os.path.join(dirpath, rec),
                        os.path.join(outdir, "test", f"{name}.pdb"))
            shutil.copy(os.path.join(dirpath, sdf),
                        os.path.join(outdir, "test", f"{name}.sdf"))
            n += 1
    return n


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("basedir")
    p.add_argument("--outdir", required=True)
    args = p.parse_args(argv)
    n = prepare_crossdocked(args.basedir, args.outdir)
    print(f"prepared {n} test complexes in {args.outdir}/test")


if __name__ == "__main__":
    main()
