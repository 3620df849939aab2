"""Guided vs unguided quality with a trained checkpoint (VERDICT r2 #3).

Loads a checkpoint trained on the virtual-pocket set
(configs/virtual_cond.yml), samples ligands for held-out test pockets
unguided and with SPSA+ATP guidance, scores both with the real chemistry
oracle, and prints a comparison table.  The reference's headline result
is QED 0.490 -> 0.578 and SA 0.626 -> 0.771 under the same guidance
(BASELINE.md table 4-1, result/cond_t.png); the demo reproduces the
*direction* of that lift end-to-end on TPU.

Usage:
  python scripts/guided_lift_eval.py --run runs/virtual_cond \
      [--ckpt best|last] [--n_pockets 8] [--n_samples 16] [--T 500] \
      [--json OUT.json]
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
    ap.add_argument("--run", default="runs/virtual_cond")
    ap.add_argument("--ckpt", default="best")
    ap.add_argument("--data", default="data/processed/virtual/test.npz")
    ap.add_argument("--n_pockets", type=int, default=8)
    ap.add_argument("--n_samples", type=int, default=16,
                    help="ligands per pocket (batch rows)")
    ap.add_argument("--T", type=int, default=500)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json", default=None)
    ap.add_argument("--w_connectivity", type=float, default=0.0,
                    help="opt-in guidance-reward connectivity weight "
                         "(SPSAConfig/ATPConfig.w_connectivity; beyond "
                         "the reference's reward set)")
    ap.add_argument("--noise_scale", type=float, default=1.0,
                    help="opt-in low-temperature sampling applied to "
                         "BOTH modes (SampleConfig.noise_scale; beyond "
                         "the reference; flagged in the JSON)")
    args = ap.parse_args(argv)

    import jax

    from diffndm_tpu.config import (ATPConfig, SampleConfig, SPSAConfig,
                                    load_yaml, model_config_from_yaml)
    from diffndm_tpu.data.dataset import ProcessedLigandPocketDataset
    from diffndm_tpu.model import DiffNDM
    from diffndm_tpu.structs import NodeBatch

    raw = load_yaml(os.path.join(args.run, "hparams.yaml"))
    mcfg = model_config_from_yaml(raw)
    hist_path = os.path.join(os.path.dirname(args.data),
                             "size_distribution.npy")
    hist = np.load(hist_path) if os.path.exists(hist_path) else None
    model = DiffNDM(mcfg, size_histogram=hist,
                    sample_cfg=SampleConfig(
                        noise_scale=args.noise_scale))
    ckpt = os.path.join(args.run, args.ckpt)
    if not os.path.isdir(ckpt):
        ckpt = os.path.join(args.run, "last")
    # the trainer checkpoint carries {params, step}
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    target = jax.device_get({"params": model.params, "step": 0})
    # prefer the EMA weights when the checkpoint carries them
    try:
        restored = ckptr.restore(
            os.path.abspath(ckpt),
            dict(target, ema_params=target["params"]))
        params, which = restored["ema_params"], "ema"
    except Exception:
        restored = ckptr.restore(os.path.abspath(ckpt), target)
        params, which = restored["params"], "raw"
    model.set_params(params)
    print(f"loaded {ckpt} (step {restored['step']}, {which} weights)")

    ds = ProcessedLigandPocketDataset(args.data)
    rng = np.random.default_rng(args.seed)
    picks = rng.choice(len(ds.pairs), size=min(args.n_pockets,
                                               len(ds.pairs)),
                       replace=False)

    gcfg = SampleConfig(
        noise_scale=args.noise_scale,
        spsa=SPSAConfig(enabled=True,
                        w_connectivity=args.w_connectivity),
        atp=ATPConfig(enabled=True,
                      w_connectivity=args.w_connectivity))
    guided_model = DiffNDM(mcfg, sample_cfg=gcfg, size_histogram=hist)
    guided_model.set_params(model.params)

    def eval_mode(m, label, key):
        from diffndm_tpu.chem.bonds import build_molecules_batch
        from diffndm_tpu.chem.metrics import MoleculeProperties
        from diffndm_tpu.chem.sanitize import (SanitizeError,
                                               connectivity_fraction,
                                               largest_fragment,
                                               sanitize)

        props = MoleculeProperties()
        rows, n_tot, conn = [], 0, []
        for pi in picks:
            pair = ds.pairs[int(pi)]
            npk = len(pair.pocket_coords)
            npad = -(-npk // 16) * 16
            # drop the padding feature columns exactly like BucketedLoader
            # (train-time collate) does
            nf = mcfg.residue_nf
            px = np.zeros((args.n_samples, npad, 3), np.float32)
            ph = np.zeros((args.n_samples, npad, nf), np.float32)
            pm = np.zeros((args.n_samples, npad), np.float32)
            px[:, :npk] = pair.pocket_coords
            ph[:, :npk] = pair.pocket_one_hot[:, :nf]
            pm[:, :npk] = 1.0
            pocket = NodeBatch(x=px, h=ph, mask=pm)
            key, k_n, k_s = jax.random.split(key, 3)
            sizes = np.asarray(m.size_distribution.sample_conditional(
                k_n, n2=np.full(args.n_samples, npk)))
            sizes = np.maximum(sizes, 4)
            res = m.sampler.sample_given_pocket(k_s, pocket, sizes,
                                                timesteps=args.T)
            lig = res.ligand
            mols = build_molecules_batch(np.asarray(lig.x),
                                         np.asarray(lig.h).argmax(-1),
                                         np.asarray(lig.mask),
                                         m.dataset_info)
            for mol in mols:
                n_tot += 1
                # fraction of atoms in the largest fragment of the RAW
                # generated molecule (metrics.py compute_connectivity
                # semantics, VERDICT r3 weak #2) — reported before any
                # extraction so fragmentation stays visible
                conn.append(connectivity_fraction(mol))
                # reference protocol (generate_ligands.py:101
                # largest_frag=not all_frags; my_test.py passes no
                # --all_frags): score the LARGEST FRAGMENT; validity =
                # it sanitizes (my_new_evaluate.py reads with RDKit
                # default sanitize)
                frag = largest_fragment(mol)
                try:
                    sanitize(frag)
                except SanitizeError:
                    continue
                rows.append((props.calculate_qed(frag),
                             props.calculate_sa(frag),
                             props.calculate_logp(frag),
                             props.calculate_lipinski(frag)))
        arr = np.asarray(rows, float) if rows else np.zeros((0, 4))
        out = {
            "mode": label,
            "n": int(n_tot),
            "valid": len(rows) / max(n_tot, 1),
            # mean largest-fragment fraction over ALL generated molecules,
            # and the strict fraction that are fully connected graphs
            "connectivity": float(np.mean(conn)) if conn else 0.0,
            "connected": (float(np.mean([c >= 1.0 for c in conn]))
                          if conn else 0.0),
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

    key = jax.random.PRNGKey(args.seed + 1)
    k_u, k_g = jax.random.split(key)
    unguided = eval_mode(model, "unguided", k_u)
    guided = eval_mode(guided_model, "SPSA+ATP", k_g)
    result = {"unguided": unguided, "guided": guided,
              "qed_lift": guided["qed"] - unguided["qed"],
              "sa_lift": guided["sa"] - unguided["sa"],
              "ckpt": ckpt, "T": args.T, "data": args.data,
              "n_pockets": len(picks), "n_samples": args.n_samples}
    if args.w_connectivity:
        # flag non-reference reward configurations in the artifact
        result["w_connectivity"] = args.w_connectivity
    if args.noise_scale != 1.0:
        result["noise_scale"] = args.noise_scale
    print(json.dumps({k: result[k] for k in
                      ("qed_lift", "sa_lift")}))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
