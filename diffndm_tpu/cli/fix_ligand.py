"""Build inpainting fixtures: extract a connected fragment (first ~1/4 of
the atoms) from each test ligand into a sub-molecule SDF
(reference my_fix_ligand.py:9-66)."""

from __future__ import annotations

import argparse
import os


def extract_fragment(mol, fraction: float = 0.25):
    """Connected fragment covering ~fraction of the heavy atoms, grown by
    BFS from atom 0 (the reference takes the first N atoms; a BFS fragment
    guarantees connectivity)."""
    n_keep = max(1, int(mol.n_atoms * fraction))
    seen = [0]
    frontier = [0]
    while frontier and len(seen) < n_keep:
        nxt = []
        for u in frontier:
            for v in mol.neighbors[u]:
                if v not in seen and len(seen) < n_keep:
                    seen.append(v)
                    nxt.append(v)
        frontier = nxt
    return mol.subgraph(sorted(seen))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("sdf_dir", type=str)
    p.add_argument("--outdir", type=str, required=True)
    p.add_argument("--fraction", type=float, default=0.25)
    args = p.parse_args(argv)

    from diffndm_tpu.chem.io import read_sdf, write_sdf

    os.makedirs(args.outdir, exist_ok=True)
    n = 0
    for f in sorted(os.listdir(args.sdf_dir)):
        if not f.endswith(".sdf"):
            continue
        mols = read_sdf(os.path.join(args.sdf_dir, f))
        if not mols:
            continue
        frag = extract_fragment(mols[0], args.fraction)
        write_sdf(os.path.join(args.outdir, f.replace(".sdf", "_frag.sdf")),
                  [frag])
        n += 1
    print(f"extracted {n} fragments to {args.outdir}")


if __name__ == "__main__":
    main()
