"""Fragment-constrained inpainting CLI (reference inpaint.py).

Example:
    python -m diffndm_tpu.cli.inpaint ckpt --pdbfile p.pdb --outfile o.sdf \
        --ref_ligand A:330 --fix_atoms frag.sdf --add_n_nodes 10 \
        --timesteps 60 --resamplings 10 --svdd 1
"""

from __future__ import annotations

import argparse

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint", type=str)
    p.add_argument("--pdbfile", type=str, required=True)
    p.add_argument("--outfile", type=str, required=True)
    p.add_argument("--ref_ligand", type=str, default=None)
    p.add_argument("--fix_atoms", type=str, nargs="+", required=True,
                   help="SDF file(s) with the fixed substructure, OR a "
                        "list of PDB atom names (e.g. C1 C2 N3) taken "
                        "from the --ref_ligand residue of --pdbfile "
                        "(reference inpaint.py:19-60)")
    p.add_argument("--n_samples", type=int, default=20)
    p.add_argument("--add_n_nodes", type=int, default=10)
    p.add_argument("--center", type=str, default="ligand",
                   choices=("ligand", "pocket"))
    p.add_argument("--timesteps", type=int, default=50)
    p.add_argument("--resamplings", type=int, default=20)
    p.add_argument("--sanitize", action="store_true")
    p.add_argument("--svdd", type=int, default=0)
    p.add_argument("--spsa", type=int, default=0)
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--noise_scale", type=float, default=1.0,
                   help="low-temperature sampling (see cli/generate)")
    p.add_argument("--w_connectivity", type=float, default=0.0,
                   help="opt-in connectivity guidance-reward weight "
                        "(see cli/generate)")
    return p


def substructure_coords_types(model, fix_atoms, pdbfile=None,
                              ref_ligand=None):
    """Fixed-substructure coordinates + type indices from SDF file(s) or
    from PDB atom names of the reference ligand residue
    (reference prepare_substructure, inpaint.py:19-60)."""
    enc = {k: v for k, v in model.dataset_info["atom_encoder"].items()
           if v < model.cfg.atom_nf}
    if isinstance(fix_atoms, str):
        fix_atoms = [fix_atoms]
    if fix_atoms[0].endswith(".sdf"):
        from diffndm_tpu.chem.io import read_sdf

        coords, types = [], []
        for path in fix_atoms:
            frag = read_sdf(path)[0]
            for i, s in enumerate(frag.symbols):
                if s in enc:
                    coords.append(np.asarray(frag.coords)[i])
                    types.append(enc[s])
        return np.asarray(coords, np.float32), np.asarray(types)

    # PDB atom-name mode: atoms of the <chain>:<resi> HETATM residue
    from diffndm_tpu.data.pdb import parse_pdb

    if pdbfile is None or ref_ligand is None:
        raise ValueError("--fix_atoms with atom names needs --pdbfile "
                         "and --ref_ligand <chain>:<resi>")
    chain, resi = ref_ligand.split(":")
    structure = parse_pdb(pdbfile)
    residue = None
    for res in structure.residues:
        if res.chain == chain and res.resi == int(resi):
            residue = res
            break
    if residue is None:
        raise ValueError(f"residue {ref_ligand} not found in {pdbfile}")
    wanted = set(fix_atoms)
    coords, types = [], []
    for a in residue.atoms:
        if a.name in wanted and a.element in enc:
            coords.append(a.coord)
            types.append(enc[a.element])
    if not coords:
        raise ValueError(f"no atoms named {sorted(wanted)} in {ref_ligand}")
    return np.asarray(coords, np.float32), np.asarray(types)


def prepare_inpaint_ligand(model, fix_atoms, n_samples: int,
                           add_n_nodes: int, pdbfile=None,
                           ref_ligand=None):
    """Fixed-fragment ligand batch + fixed mask (inpaint.py:104-141)."""
    import jax.numpy as jnp

    from diffndm_tpu.structs import NodeBatch, pad_to

    coords, types = substructure_coords_types(model, fix_atoms, pdbfile,
                                              ref_ligand)
    n_fixed = len(coords)
    n_total = n_fixed + add_n_nodes
    nl = pad_to(n_total, model.sample_cfg.lig_pad_multiple)

    x = np.zeros((n_samples, nl, 3), np.float32)
    h = np.zeros((n_samples, nl, model.cfg.atom_nf), np.float32)
    mask = np.zeros((n_samples, nl), np.float32)
    fixed = np.zeros((n_samples, nl), np.float32)
    x[:, :n_fixed] = coords[None]
    h[:, :n_fixed] = np.eye(model.cfg.atom_nf,
                            dtype=np.float32)[types][None]
    mask[:, :n_total] = 1.0
    fixed[:, :n_fixed] = 1.0
    ligand = NodeBatch(x=jnp.asarray(x), h=jnp.asarray(h),
                       mask=jnp.asarray(mask))
    return ligand, jnp.asarray(fixed)


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax

    from diffndm_tpu.chem.io import write_sdf
    from diffndm_tpu.cli.generate import load_model

    args.optimize = 0
    args.path = None
    args.path_save = None
    args.SVDD = args.svdd
    args.SPSA = args.spsa
    model = load_model(args)

    ligand, lig_fixed = prepare_inpaint_ligand(
        model, args.fix_atoms, args.n_samples, args.add_n_nodes,
        pdbfile=args.pdbfile, ref_ligand=args.ref_ligand)
    if args.fix_atoms[0].endswith(".sdf"):
        ref = args.ref_ligand or args.fix_atoms[0]
    else:
        ref = args.ref_ligand  # <chain>:<resi> of the reference ligand
    pocket = model.pocket_from_pdb(args.pdbfile, ref, args.n_samples)

    res = model.inpaint_sampler.inpaint(
        jax.random.PRNGKey(args.seed), ligand, lig_fixed, pocket,
        timesteps=args.timesteps, resamplings=args.resamplings,
        svdd=bool(args.svdd), spsa=bool(args.spsa), center=args.center)
    mols = model.result_to_molecules(res, sanitize=args.sanitize)
    write_sdf(args.outfile, mols)
    n_ok = sum(m is not None for m in mols)
    print(f"wrote {n_ok}/{len(mols)} molecules to {args.outfile}")


if __name__ == "__main__":
    main()
