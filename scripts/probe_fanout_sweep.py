"""Row-tile / band-window sweep of the SPSA probe fan-out forward.

The guided headline's overhead is dominated by the fused k*2B-row probe
forward (~80% of guided overhead per DIFFNDM_GUIDED_PROFILE; NOTES round
4): one denoiser call of shape [2k*B, NL, .] per SPSA event.  bench.py
measures it at one configuration; this script sweeps (row_tile,
band_window) at the exact fan-out shape and prints ms + TF/s per cell so
the default ``SampleConfig.fanout_row_tile`` / guided band stay the
measured optimum rather than a guess.

Coverage note: cells are labeled ``cov_ok`` when the window preserves the
licensed per-row coverage of W=128 @ tile 8 (window >= 128 + (tile - 8);
host_guided._fanout_eps_fn applies the same widening rule).  Cells
without it are shown for the shape of the curve only.

Usage (TPU): python scripts/probe_fanout_sweep.py [--B 20] [--k 10]
             [--tiles 8,16,32] [--bands 128,136,152,176,0]
"""

from __future__ import annotations

import argparse
import dataclasses as dc
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--B", type=int, default=20)
    ap.add_argument("--k", type=int, default=10,
                    help="SPSA probe pairs (fan-out batch = 2k*B rows)")
    ap.add_argument("--NL", type=int, default=24)
    ap.add_argument("--tiles", default="8,16,32")
    ap.add_argument("--bands", default="128,136,152,176,0",
                    help="0 = no banding (full pocket)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import build_pocket
    from diffndm_tpu.config import EGNNConfig
    from diffndm_tpu.model import to_default_device
    from diffndm_tpu.models.dynamics import EGNNDynamics
    from diffndm_tpu.utils.flops import egnn_flops_analytic, peak_tflops_for

    atom_nf = 10
    B2 = 2 * args.k * args.B
    pocket, name = build_pocket(B2, 320, atom_nf)
    np_pad = pocket.x.shape[1]
    xp = jnp.concatenate([pocket.x, pocket.h], -1)
    z = jax.random.normal(jax.random.PRNGKey(0),
                          (B2, args.NL, 3 + atom_nf)) * 0.5
    lm = jnp.ones((B2, args.NL))
    t = jnp.zeros((B2,))
    base = EGNNConfig(hidden_nf=256, joint_nf=128, n_layers=6,
                      inv_sublayers=1, attention=True, tanh=True,
                      norm_constant=1.0, reflection_equivariant=False,
                      edge_cutoff_pocket=5.0, edge_cutoff_interaction=5.0,
                      row_tile=8, compute_dtype="bfloat16")
    # one param tree shared by every cell (same algebra, cheap CPU init)
    init_mod = EGNNDynamics(dc.replace(base, band_window=None),
                            atom_nf=atom_nf, residue_nf=atom_nf)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_mod.init(jax.random.PRNGKey(1),
                               jnp.zeros((1, args.NL, 13)),
                               jnp.zeros((1, np_pad, 13)),
                               jnp.zeros((1,)), jnp.ones((1, args.NL)),
                               jnp.ones((1, np_pad)))
    params = to_default_device(params)
    peak = peak_tflops_for(jax.devices()[0].device_kind) or 0.0

    rows = []
    print(f"fan-out shape: [{B2}, {args.NL}] vs pocket {name} "
          f"(padded {np_pad}); licensed coverage = W128 @ tile 8")
    for tile in [int(x) for x in args.tiles.split(",")]:
        for band in [int(x) for x in args.bands.split(",")]:
            bw = band or None
            if bw is not None and bw >= np_pad:
                continue
            cfg = dc.replace(base, row_tile=tile, band_window=bw)
            mod = EGNNDynamics(cfg, atom_nf=atom_nf, residue_nf=atom_nf)
            fwd = jax.jit(lambda zz, pp, tt, l, m, _mod=mod:
                          _mod.apply(params, zz, pp, tt, l, m))
            try:
                r = fwd(z, xp, t, lm, pocket.mask)
                jax.block_until_ready(r)
                best = float("inf")
                for _ in range(args.reps):
                    t0 = time.time()
                    r = fwd(z, xp, t, lm, pocket.mask)
                    jax.block_until_ready(r)
                    best = min(best, time.time() - t0)
            except Exception as e:
                print(f"tile={tile:3d} band={band:4d}  FAILED "
                      f"{type(e).__name__}: {e}")
                continue
            fl = egnn_flops_analytic(cfg, atom_nf, B2, args.NL, np_pad)
            tf = fl / best / 1e12
            cov_ok = bw is None or bw >= 128 + max(tile - 8, 0)
            rows.append({"row_tile": tile, "band": band,
                         "ms": round(best * 1e3, 2),
                         "tflops_per_s": round(tf, 1),
                         "mfu": round(tf / peak, 4) if peak else None,
                         "cov_ok": cov_ok})
            print(f"tile={tile:3d} band={band:4d}  {best*1e3:8.2f} ms  "
                  f"{tf:6.1f} TF/s  mfu={tf/peak if peak else 0:.3f}"
                  f"{'' if cov_ok else '  (coverage NOT licensed)'}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"B2": B2, "NL": args.NL, "pocket": name,
                       "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
