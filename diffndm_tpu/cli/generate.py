"""Conditional ligand generation CLI (reference generate_ligands.py).

Example:
    python -m diffndm_tpu.cli.generate ckpt_dir --pdbfile pocket.pdb \
        --outfile out.sdf --ref_ligand A:330 --n_samples 20 \
        --timesteps 600 --SPSA 1 --SVDD 1
"""

from __future__ import annotations

import argparse
import dataclasses
from pathlib import Path


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint", type=str,
                   help="orbax checkpoint dir or reference .ckpt file")
    p.add_argument("--pdbfile", type=str, required=True)
    p.add_argument("--outfile", type=str, required=True)
    p.add_argument("--ref_ligand", type=str, default=None,
                   help="SDF path or <chain>:<resi>")
    p.add_argument("--n_samples", type=int, default=20)
    p.add_argument("--num_nodes_lig", type=int, default=None)
    p.add_argument("--timesteps", type=int, default=None)
    p.add_argument("--all_frags", action="store_true")
    p.add_argument("--sanitize", action="store_true")
    p.add_argument("--relax", action="store_true")
    p.add_argument("--resamplings", type=int, default=1)
    p.add_argument("--config", type=str, default=None,
                   help="model YAML (defaults to built-in fullatom cond)")
    p.add_argument("--seed", type=int, default=0)
    # guidance / RL flags (generate_ligands.py:38-44)
    p.add_argument("--optimize", type=int, default=0)
    p.add_argument("--path", type=str, default=None,
                   help="AdjustNet checkpoint to load")
    p.add_argument("--path_save", type=str, default=None,
                   help="AdjustNet checkpoint to save after RL update")
    p.add_argument("--SVDD", type=int, default=0)
    p.add_argument("--SPSA", type=int, default=0)
    p.add_argument("--noise_scale", type=float, default=1.0,
                   help="low-temperature sampling: scale on the noise "
                        "injected at each reverse step (beyond the "
                        "reference; 1.0 = reference parity, <1 trades "
                        "diversity for typicality)")
    p.add_argument("--w_connectivity", type=float, default=0.0,
                   help="optional guidance-reward weight on the largest-"
                        "fragment fraction (beyond the reference's "
                        "reward set): steers SPSA/ATP toward connected "
                        "molecules")
    p.add_argument("--w_vina", type=float, default=0.0,
                   help="optional affinity term in the guidance rewards: "
                        "reward += w_vina * (-Vina-style score) against "
                        "--pdbfile (beyond the reference's rewards)")
    p.add_argument("--rl_loops", type=int, default=1,
                   help="repeat generation+REINFORCE this many times "
                        "(the reference's my_temp.py RL-training driver)")
    return p


def load_model(args):
    import dataclasses as dc

    import jax

    from diffndm_tpu.config import (ATPConfig, ModelConfig, RLConfig,
                                    SampleConfig, SPSAConfig)
    from diffndm_tpu.model import DiffNDM

    # Multi-pocket batches must not select ATP candidates across pockets
    # (a globally-selected candidate would land in another pocket's row):
    # restrict the population top-k to each pocket's n_samples rows.
    group_size = (args.n_samples
                  if getattr(args, "batch_pockets", 1) > 1 else None)
    w_vina = getattr(args, "w_vina", 0.0)
    w_conn = getattr(args, "w_connectivity", 0.0)
    sample_cfg = SampleConfig(
        n_samples=args.n_samples,
        noise_scale=getattr(args, "noise_scale", 1.0),
        spsa=SPSAConfig(enabled=bool(args.SPSA), w_vina=w_vina,
                        w_connectivity=w_conn),
        atp=ATPConfig(enabled=bool(args.SVDD), group_size=group_size,
                      w_vina=w_vina, w_connectivity=w_conn),
        rl=RLConfig(enabled=bool(args.optimize),
                    train=bool(args.path_save)))
    if args.config:
        model = DiffNDM.from_yaml(args.config, sample_cfg=sample_cfg)
    else:
        model = DiffNDM(ModelConfig(), sample_cfg=sample_cfg,
                        key=jax.random.PRNGKey(args.seed))
    ckpt = Path(args.checkpoint)
    if ckpt.suffix == ".ckpt":
        model.load_reference_checkpoint(str(ckpt))
    elif ckpt.exists():
        model.load_checkpoint(str(ckpt))
    else:
        print(f"[warn] checkpoint {ckpt} not found - using random init")
    if args.optimize or args.path:
        adj = model.ensure_adjust()
        if args.path:
            adj.load(args.path)
    if w_vina > 0 and getattr(args, "pdbfile", None):
        model.oracle.set_receptor(args.pdbfile)
    return model


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax
    import numpy as np

    from diffndm_tpu.chem.io import write_sdf

    model = load_model(args)
    num_nodes = (np.full((args.n_samples,), args.num_nodes_lig)
                 if args.num_nodes_lig else None)
    loops = max(1, args.rl_loops if args.path_save else 1)
    for loop in range(loops):
        mols, result = model.generate_ligands(
            args.pdbfile, args.n_samples, args.ref_ligand,
            key=jax.random.PRNGKey(args.seed + loop),
            timesteps=args.timesteps,
            num_nodes_lig=num_nodes, optimize=bool(args.optimize),
            train_rl=bool(args.path_save), sanitize=args.sanitize,
            # reference generate_ligands.py:101: largest_frag defaults on
            # (independent of --sanitize) unless --all_frags is passed
            largest_frag=not args.all_frags,
            relax_iter=(200 if args.relax else 0))
        if args.path_save:
            model.adjust_state.save(args.path_save)
            print(f"[loop {loop}] saved AdjustNet checkpoint to "
                  f"{args.path_save}")
    write_sdf(args.outfile, mols)
    n_ok = sum(m is not None for m in mols)
    print(f"wrote {n_ok}/{len(mols)} molecules to {args.outfile}")


if __name__ == "__main__":
    main()
