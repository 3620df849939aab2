"""Evolutionary ligand optimization CLI (reference optimize.py:150-249):
population of ligands evolved by noise-denoise diversification, scored by
QED or SA, top-k survivors repopulated each generation.
"""

from __future__ import annotations

import argparse

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint", type=str)
    p.add_argument("--pdbfile", type=str, required=True)
    p.add_argument("--ref_ligand", type=str, required=True,
                   help="SDF with the starting ligand (also pocket ref)")
    p.add_argument("--outfile", type=str, required=True)
    p.add_argument("--objective", type=str, default="qed",
                   choices=("qed", "sa", "vina"),
                   help="qed/sa = reference objectives (optimize.py:"
                        "207-242); vina = native structure-based "
                        "affinity vs the --pdbfile receptor (beyond the "
                        "reference; chem/scoring.py, lower-is-better "
                        "negated so evolution maximises)")
    p.add_argument("--population_size", type=int, default=100)
    p.add_argument("--evolution_steps", type=int, default=10)
    p.add_argument("--top_k", type=int, default=7)
    p.add_argument("--timesteps", type=int, default=100,
                   help="noising steps per diversification")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax
    import jax.numpy as jnp

    from diffndm_tpu.chem.io import read_sdf, write_sdf
    from diffndm_tpu.chem.metrics import MoleculeProperties
    from diffndm_tpu.cli.generate import load_model
    from diffndm_tpu.data.pocket import ligand_node_batch
    from diffndm_tpu.structs import NodeBatch, repeat_batch

    for k in ("optimize", "SVDD", "SPSA"):
        setattr(args, k, 0)
    args.path = args.path_save = None
    args.n_samples = args.population_size
    model = load_model(args)
    props = MoleculeProperties()
    if args.objective == "vina":
        from diffndm_tpu.chem.scoring import VinaScorer

        _vs = VinaScorer.from_pdb(args.pdbfile)
        score_fn = lambda m: -_vs.score(m)  # noqa: E731
    else:
        score_fn = (props.calculate_qed if args.objective == "qed"
                    else props.calculate_sa)

    mol0 = read_sdf(args.ref_ligand)[0]
    enc = {k: v for k, v in model.dataset_info["atom_encoder"].items()
           if v < model.cfg.atom_nf}
    keep = [i for i, s in enumerate(mol0.symbols) if s in enc]
    coords = np.asarray(mol0.coords)[keep]
    types = np.asarray([enc[mol0.symbols[i]] for i in keep])

    pop = args.population_size
    ligand1 = ligand_node_batch(coords, types, enc,
                                model.sample_cfg.lig_pad_multiple)
    ligand = repeat_batch(ligand1, pop)
    pocket = model.pocket_from_pdb(args.pdbfile, args.ref_ligand, pop)

    key = jax.random.PRNGKey(args.seed)
    best_mols = []
    for gen in range(args.evolution_steps):
        key, k_div = jax.random.split(key)
        res = model.diversify_sampler.diversify(k_div, ligand, pocket,
                                                noising_steps=args.timesteps)
        mols = model.result_to_molecules(res, sanitize=True,
                                         largest_frag=True)
        # invalid sentinel: 0.0 floors qed/sa (range [0,1]) but NOT the
        # vina objective, where clashing-yet-valid poses score below 0 —
        # -inf keeps invalid molecules out of the survivor set
        invalid = 0.0 if args.objective in ("qed", "sa") else -np.inf
        scores = np.array([score_fn(m) if m is not None else invalid
                           for m in mols])
        order = np.argsort(scores)[::-1]
        top = order[: args.top_k]
        print(f"gen {gen}: best {args.objective}="
              f"{scores[top[0]]:.3f} mean={scores.mean():.3f}")
        best_mols = [mols[i] for i in top if mols[i] is not None]
        # repopulate: tile survivors to population size (optimize.py:207-242)
        reps = -(-pop // len(top))
        sel = np.tile(top, reps)[:pop]
        ligand = NodeBatch(x=res.ligand.x[sel], h=res.ligand.h[sel],
                           mask=res.ligand.mask[sel])
    write_sdf(args.outfile, best_mols)
    print(f"wrote {len(best_mols)} optimized molecules to {args.outfile}")


if __name__ == "__main__":
    main()
