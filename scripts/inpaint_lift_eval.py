"""Inpainting quality, guided vs unguided, with a trained checkpoint —
the reference's SECOND evaluation axis (table 4-2 / result/inpaint_t.png:
inpaint baseline QED 0.516 -> ATP 0.632).

For each held-out virtual-pocket test pair: fix the first quarter of the
REAL test ligand's atoms (my_fix_ligand.py:9-66 fixture semantics), add
``add_n_nodes`` new nodes, and RePaint-complete the molecule against the
pocket — once unguided and once with ATP/SVDD guidance — at the
reference sweep configuration (timesteps 60, resamplings 10,
my_test_inpaint.py:38-52).  Scoring matches the reference's inpaint
pipeline: WHOLE molecule (inpaint.py keeps largest_frag=False), sanitize
= validity, then QED/SA/LogP/Lipinski.

Usage (TPU):
  python scripts/inpaint_lift_eval.py --run examples/checkpoints/virtual_cond_v2 \
      [--n_pockets 8] [--n_samples 16] [--json OUT.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run", default="examples/checkpoints/virtual_cond_v2")
    ap.add_argument("--ckpt", default="last")
    ap.add_argument("--data", default="data/processed/virtual_v2/test.npz")
    ap.add_argument("--n_pockets", type=int, default=8)
    ap.add_argument("--n_samples", type=int, default=16)
    ap.add_argument("--timesteps", type=int, default=60)
    ap.add_argument("--resamplings", type=int, default=10)
    ap.add_argument("--add_n_nodes", type=int, default=10)
    ap.add_argument("--frag_fraction", type=float, default=0.25)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from diffndm_tpu.config import (ATPConfig, SampleConfig,
                                    load_yaml, model_config_from_yaml)
    from diffndm_tpu.data.dataset import ProcessedLigandPocketDataset
    from diffndm_tpu.model import DiffNDM
    from diffndm_tpu.structs import NodeBatch

    raw = load_yaml(os.path.join(args.run, "hparams.yaml"))
    mcfg = model_config_from_yaml(raw)
    hist_path = os.path.join(os.path.dirname(args.data),
                             "size_distribution.npy")
    hist = np.load(hist_path) if os.path.exists(hist_path) else None

    def load(model):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckpt = os.path.join(args.run, args.ckpt)
        target = jax.device_get({"params": model.params, "step": 0})
        try:
            restored = ckptr.restore(
                os.path.abspath(ckpt),
                dict(target, ema_params=target["params"]))
            params, which = restored["ema_params"], "ema"
        except Exception:
            restored = ckptr.restore(os.path.abspath(ckpt), target)
            params, which = restored["params"], "raw"
        model.set_params(params)
        print(f"loaded {ckpt} (step {restored['step']}, {which})")

    model = DiffNDM(mcfg, size_histogram=hist)
    load(model)
    gcfg = SampleConfig(atp=ATPConfig(enabled=True))
    guided = DiffNDM(mcfg, sample_cfg=gcfg, size_histogram=hist)
    guided.set_params(model.params)

    ds = ProcessedLigandPocketDataset(args.data)
    rng = np.random.default_rng(args.seed)
    picks = rng.choice(len(ds.pairs),
                       size=min(args.n_pockets, len(ds.pairs)),
                       replace=False)
    nf = mcfg.atom_nf

    def eval_mode(m, svdd, label, key):
        from diffndm_tpu.chem.bonds import build_molecules_batch
        from diffndm_tpu.chem.metrics import MoleculeProperties
        from diffndm_tpu.chem.sanitize import (SanitizeError,
                                               connectivity_fraction,
                                               sanitize)

        props = MoleculeProperties()
        rows, n_tot, conn = [], 0, []
        for pi in picks:
            pair = ds.pairs[int(pi)]
            npk = len(pair.pocket_coords)
            npad = -(-npk // 16) * 16
            B = args.n_samples
            rnf = mcfg.residue_nf
            px = np.zeros((B, npad, 3), np.float32)
            ph = np.zeros((B, npad, rnf), np.float32)
            pm = np.zeros((B, npad), np.float32)
            px[:, :npk] = pair.pocket_coords
            ph[:, :npk] = pair.pocket_one_hot[:, :rnf]
            pm[:, :npk] = 1.0
            pocket = NodeBatch(x=px, h=ph, mask=pm)

            lig_xyz = np.asarray(pair.lig_coords, np.float32)
            lig_oh = np.asarray(pair.lig_one_hot, np.float32)[:, :nf]
            n_fixed = max(int(len(lig_xyz) * args.frag_fraction), 1)
            nl = -(-(n_fixed + args.add_n_nodes) // 8) * 8
            lx = np.zeros((B, nl, 3), np.float32)
            lh = np.zeros((B, nl, nf), np.float32)
            lm = np.zeros((B, nl), np.float32)
            lf = np.zeros((B, nl), np.float32)
            lx[:, :n_fixed] = lig_xyz[:n_fixed]
            lh[:, :n_fixed] = lig_oh[:n_fixed]
            lm[:, :n_fixed + args.add_n_nodes] = 1.0
            lf[:, :n_fixed] = 1.0
            ligand = NodeBatch(x=jnp.asarray(lx), h=jnp.asarray(lh),
                               mask=jnp.asarray(lm))

            key, k = jax.random.split(key)
            res = m.inpaint_sampler.inpaint(
                k, ligand, jnp.asarray(lf), pocket,
                timesteps=args.timesteps,
                resamplings=args.resamplings, svdd=svdd)
            lig = res.ligand
            mols = build_molecules_batch(np.asarray(lig.x),
                                         np.asarray(lig.h).argmax(-1),
                                         np.asarray(lig.mask),
                                         m.dataset_info)
            for mol in mols:
                n_tot += 1
                conn.append(connectivity_fraction(mol))
                # reference inpaint protocol: whole molecule, no
                # largest-fragment extraction (inpaint.py:65 default)
                try:
                    sanitize(mol)
                except SanitizeError:
                    continue
                rows.append((props.calculate_qed(mol),
                             props.calculate_sa(mol),
                             props.calculate_logp(mol),
                             props.calculate_lipinski(mol)))
        arr = np.asarray(rows, float) if rows else np.zeros((0, 4))
        out = {
            "mode": label, "n": int(n_tot),
            "valid": len(rows) / max(n_tot, 1),
            "connectivity": float(np.mean(conn)) if conn else 0.0,
            "qed": float(arr[:, 0].mean()) if len(rows) else 0.0,
            "sa": float(arr[:, 1].mean()) if len(rows) else 0.0,
            "logp": float(arr[:, 2].mean()) if len(rows) else 0.0,
            "lipinski": float(arr[:, 3].mean()) if len(rows) else 0.0,
        }
        print("%-9s n=%3d valid=%.3f conn=%.3f QED=%.3f SA=%.3f "
              "LogP=%.3f Lip=%.2f" % (
                  label, out["n"], out["valid"], out["connectivity"],
                  out["qed"], out["sa"], out["logp"], out["lipinski"]),
              flush=True)
        return out

    key = jax.random.PRNGKey(args.seed + 7)
    k_u, k_g = jax.random.split(key)
    unguided = eval_mode(model, False, "unguided", k_u)
    guided_r = eval_mode(guided, True, "ATP", k_g)
    result = {"unguided": unguided, "guided": guided_r,
              "qed_lift": guided_r["qed"] - unguided["qed"],
              "timesteps": args.timesteps,
              "resamplings": args.resamplings,
              "add_n_nodes": args.add_n_nodes,
              "ckpt": os.path.join(args.run, args.ckpt),
              "data": args.data,
              "n_pockets": len(picks), "n_samples": args.n_samples}
    print(json.dumps({"qed_lift": result["qed_lift"]}))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
