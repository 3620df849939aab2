"""Quality parity of approximate banding vs the exact window (VERDICT r3
next-round #5).

Runs the flagship sampling configuration (hidden 256 / 6 layers, real
3rfm pocket, B=20) twice — once with the exact per-pocket band window,
once with the capped approximate window (default 128) — under IDENTICAL
PRNG keys, and reports:

- decoded atom-type flips (argmax of h) between the two runs,
- coordinate RMS deviation over real atoms,
- for the GUIDED path: decoded-molecule quality deltas (validity / QED
  / SA) with the committed trained checkpoint.  Trajectory RMS is not a
  meaningful guided parity metric — ATP/hybrid selection is a discrete
  top-k, so any eps difference can flip one selection and relocate the
  whole trajectory (measured: 63 A RMS between exact and approx runs
  whose decoded QUALITY is statistically unchanged).  What licenses the
  approximation is that the guided RESULT distribution is unchanged;
  every guidance event re-scores real decoded molecules either way.

The committed result (examples/band_parity.json) is what licenses
bench.py's default guided band (BENCH_GUIDED_BAND=128);
tests/test_band_parity_artifact.py pins its claims.

Usage (TPU):  python scripts/band_parity_eval.py [--json OUT.json]
CPU smoke:    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
                python scripts/band_parity_eval.py --small --T 20
"""

from __future__ import annotations

import argparse
import dataclasses as dc
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--T", type=int, default=500)
    ap.add_argument("--T_guided", type=int, default=60)
    ap.add_argument("--B", type=int, default=20)
    ap.add_argument("--approx", type=int, default=128)
    ap.add_argument("--small", action="store_true",
                    help="tiny model for CPU smoke testing")
    ap.add_argument("--ckpt_run",
                    default="examples/checkpoints/virtual_cond_v3b",
                    help="trained run dir for the guided quality "
                         "comparison (skipped when absent)")
    ap.add_argument("--guided_only", default=None, metavar="PREV_JSON",
                    help="reuse the unguided section from a previous "
                         "artifact (identical settings/keys) and only "
                         "re-run the guided quality comparison — for "
                         "recovering from a mid-run backend loss")
    ap.add_argument("--seeds", type=int, default=3,
                    help="independent guided trajectories per band mode "
                         "(single-run means are noisy: ATP top-k "
                         "correlates the batch)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from bench import build_pocket
    from diffndm_tpu.config import (ATPConfig, DiffusionConfig, EGNNConfig,
                                    SampleConfig, SPSAConfig)
    from diffndm_tpu.constants import dataset_params
    from diffndm_tpu.diffusion import schedules as S
    from diffndm_tpu.diffusion.core import CondDiffusion
    from diffndm_tpu.diffusion.sampler import ConditionalSampler
    from diffndm_tpu.model import to_default_device
    from diffndm_tpu.models.banding import band_halfwidth_atoms
    from diffndm_tpu.models.dynamics import EGNNDynamics

    atom_nf, NL = 10, 24
    B = args.B
    pocket, pocket_name = build_pocket(B, 320, atom_nf)
    np_pad = pocket.x.shape[1]
    row_tile = 8
    hw = band_halfwidth_atoms(np.asarray(pocket.x[:1]),
                              np.asarray(pocket.mask[:1]), 5.0)
    w_exact = -(-(2 * hw + row_tile + 8) // 16) * 16

    base = EGNNConfig(hidden_nf=32 if args.small else 256,
                      joint_nf=16 if args.small else 128,
                      n_layers=2 if args.small else 6,
                      attention=True, tanh=True,
                      reflection_equivariant=False,
                      edge_cutoff_pocket=5.0, edge_cutoff_interaction=5.0,
                      row_tile=row_tile,
                      compute_dtype="float32" if args.small
                      else "bfloat16")

    key = jax.random.PRNGKey(0)
    init_mod = EGNNDynamics(base, atom_nf=atom_nf, residue_nf=atom_nf)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_mod.init(key, jnp.zeros((1, NL, 13)),
                               jnp.zeros((1, np_pad, 13)),
                               jnp.zeros((1,)), jnp.ones((1, NL)),
                               jnp.ones((1, np_pad)))
    params = to_default_device(params)
    core = CondDiffusion(S.make_schedule("polynomial_2", 500, 5e-4),
                         DiffusionConfig(timesteps=500), atom_nf, atom_nf)
    DP = dataset_params["crossdock_full"]
    sizes = np.full((B,), NL)

    def run(window, guided, T):
        cfg = dc.replace(base, band_window=window)
        module = EGNNDynamics(cfg, atom_nf=atom_nf, residue_nf=atom_nf)
        scfg = (SampleConfig(spsa=SPSAConfig(enabled=True),
                             atp=ATPConfig(enabled=True))
                if guided else SampleConfig())
        sampler = ConditionalSampler(core, module, params, scfg, DP)
        res = sampler.sample_given_pocket(jax.random.PRNGKey(42), pocket,
                                          sizes, timesteps=T)
        lig = res.ligand
        return (np.asarray(lig.x), np.asarray(lig.h).argmax(-1),
                np.asarray(lig.mask).astype(bool))

    def compare(tag, a, b):
        xa, ta, m = a
        xb, tb, _ = b
        flips = int((ta[m] != tb[m]).sum())
        rms = float(np.sqrt(np.mean((xa[m] - xb[m]) ** 2)))
        n = int(m.sum())
        print(f"{tag}: atoms={n} type_flips={flips} coord_rms={rms:.4f} A",
              flush=True)
        return {"atoms": n, "type_flips": flips,
                "coord_rms_angstrom": round(rms, 4)}

    w_ap = min(args.approx, w_exact)
    result = {
        "pocket": pocket_name, "B": B, "T": args.T,
        "T_guided": args.T_guided,
        "band_exact_window": int(w_exact),
        "band_approx_window": int(w_ap),
        "model": "small" if args.small else "flagship",
    }
    print(f"exact window {w_exact}, approx {w_ap} ({pocket_name})",
          flush=True)
    if args.guided_only:
        with open(args.guided_only) as f:
            prev = json.load(f)
        assert prev["band_exact_window"] == w_exact \
            and prev["band_approx_window"] == w_ap \
            and prev["T"] == args.T and prev["B"] == B, \
            "previous artifact settings differ — run the full eval"
        result["unguided"] = prev["unguided"]
        print(f"unguided section reused from {args.guided_only}",
              flush=True)
    else:
        exact_u = run(w_exact, False, args.T)
        approx_u = run(w_ap, False, args.T)
        result["unguided"] = compare("unguided", exact_u, approx_u)
    # guided: quality parity with the trained flagship checkpoint
    if os.path.isdir(args.ckpt_run):
        import orbax.checkpoint as ocp

        from diffndm_tpu.chem.bonds import build_molecules_batch
        from diffndm_tpu.chem.metrics import MoleculeProperties
        from diffndm_tpu.chem.sanitize import (SanitizeError,
                                               largest_fragment, sanitize)
        from diffndm_tpu.config import load_yaml, model_config_from_yaml
        from diffndm_tpu.model import DiffNDM

        mcfg = model_config_from_yaml(
            load_yaml(os.path.join(args.ckpt_run, "hparams.yaml")))
        gcfg = SampleConfig(spsa=SPSAConfig(enabled=True),
                            atp=ATPConfig(enabled=True))
        proto = DiffNDM(mcfg, sample_cfg=gcfg)
        ckptr = ocp.StandardCheckpointer()
        tgt = jax.device_get({"params": proto.params, "step": 0})
        path = os.path.abspath(os.path.join(args.ckpt_run, "last"))
        try:
            restored = ckptr.restore(path,
                                     dict(tgt, ema_params=tgt["params"]))
            ck_params = restored["ema_params"]
        except Exception:
            ck_params = ckptr.restore(path, tgt)["params"]
        nf = mcfg.residue_nf
        gpocket = pocket._replace(h=pocket.h[..., :nf])
        props = MoleculeProperties()

        def guided_quality(cap, seed=42):
            old = os.environ.pop("DIFFNDM_BAND_APPROX", None)
            if cap:
                os.environ["DIFFNDM_BAND_APPROX"] = str(cap)
            try:
                m = DiffNDM(mcfg, sample_cfg=gcfg)
                m.set_params(ck_params)
                w = m.ensure_band_for(gpocket)
                res = m.sampler.sample_given_pocket(
                    jax.random.PRNGKey(seed), gpocket, sizes,
                    timesteps=args.T_guided)
                lig = res.ligand
                mols = build_molecules_batch(
                    np.asarray(lig.x), np.asarray(lig.h).argmax(-1),
                    np.asarray(lig.mask), m.dataset_info)
                rows = []
                for mol in mols:
                    frag = largest_fragment(mol)
                    try:
                        sanitize(frag)
                    except SanitizeError:
                        continue
                    rows.append((props.calculate_qed(frag),
                                 props.calculate_sa(frag)))
                arr = (np.asarray(rows, float) if rows
                       else np.zeros((0, 2)))
                out = {"band_window": int(w),
                       "valid": len(rows) / max(len(mols), 1),
                       "qed": float(arr[:, 0].mean()) if len(rows)
                       else 0.0,
                       "sa": float(arr[:, 1].mean()) if len(rows)
                       else 0.0}
                print(f"guided band={w} valid={out['valid']:.3f} "
                      f"QED={out['qed']:.3f} SA={out['sa']:.3f}",
                      flush=True)
                return out
            finally:
                os.environ.pop("DIFFNDM_BAND_APPROX", None)
                if old is not None:
                    os.environ["DIFFNDM_BAND_APPROX"] = old

        # multi-seed: a single guided run's mean is noisy (ATP top-k makes
        # the B samples correlated — one selection flip relocates the whole
        # batch; measured single-seed SA spread ~0.09), so average both
        # modes over --seeds independent trajectories and report the
        # per-seed rows alongside the pooled means.
        def pooled(cap):
            rows = [guided_quality(cap, seed=42 + 101 * i)
                    for i in range(args.seeds)]
            agg = {k: float(np.mean([r[k] for r in rows]))
                   for k in ("valid", "qed", "sa")}
            agg["band_window"] = rows[0]["band_window"]
            agg["per_seed"] = rows
            agg["seeds"] = args.seeds
            return agg

        ge = pooled(0)
        ga = pooled(args.approx)
        result["guided_quality"] = {
            "ckpt": args.ckpt_run, "exact": ge, "approx": ga,
            "valid_delta": round(ga["valid"] - ge["valid"], 4),
            "qed_delta": round(ga["qed"] - ge["qed"], 4),
            "sa_delta": round(ga["sa"] - ge["sa"], 4),
        }
    else:
        print(f"no checkpoint at {args.ckpt_run}; guided quality "
              f"comparison skipped", flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
