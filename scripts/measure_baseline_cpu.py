"""Measure the reference PyTorch sampler's hot-path cost on this host's
CPU — a *measured* anchor for the baseline denominator that bench.py's
``vs_baseline`` estimate rests on (VERDICT r2, next #5).

What is measured (flagship benchmark shapes: real 3rfm pocket, B=20
samples, NL=24 ligand atoms, hidden 256 / joint 128 / 6 layers, T=500;
my_test.py:86-88 + configs/crossdock_fullatom_cond.yml):

- ``ref_fwd_ms``: one EGNN denoiser forward of the reference
  (equivariant_diffusion/dynamics.py through the tests/reference_shim
  torch_scatter shim), torch.no_grad, float32, all CPU cores.  A LOWER
  bound on the reference's per-step cost — its sampling loop adds
  posterior algebra, re-centering and Python overhead per step.
- ``ours_cpu_fwd_ms``: our dense row-tiled EGNN forward on the JAX CPU
  backend at the same shapes.  Reported for completeness: the padded
  dense design trades ~12x more masked edge-MLP work for MXU-friendly
  static shapes, so it intentionally LOSES on CPU and wins on TPU
  (measured round-2: 66 ms/step on v5e vs the reference's CUDA stack).

Derived:
- ``ref_cpu_lig_s_upper_bound`` = B / (T * ref_fwd): reference unguided
  throughput ceiling on this CPU (0.0023 lig/s measured).
- ``implied_gpu_over_cpu``: BASELINE.md's GPU estimate (20 ligands /
  12 min = 0.0278 lig/s) divided by the measured CPU ceiling.  Measured
  value ~12x — a conservative CPU->datacenter-GPU ratio for a
  scatter-bound torch workload, which supports the estimate's sanity:
  even granting the reference GPU 100x this CPU (0.23 lig/s), the TPU
  stack's measured 0.60 lig/s unguided / >=0.2 guided still exceeds it.

Usage:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
        python scripts/measure_baseline_cpu.py        # ~6 min
    SKIP_OURS=1 ...                                   # ~2 min, ref only
Writes BASELINE_MEASURED.json at the repo root.
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import numpy as np  # noqa: E402

B = int(os.environ.get("BASE_B", 20))
NL = int(os.environ.get("BASE_NL", 24))
T = 500
BASELINE_GPU_ESTIMATE = 20.0 / 720.0  # lig/s (BASELINE.md, unguided)


def build_pocket_arrays():
    """Real 3rfm pocket (full-atom, 10-type encoder) as numpy arrays."""
    from diffndm_tpu.constants import dataset_params
    from diffndm_tpu.data.pdb import parse_pdb
    from diffndm_tpu.data.pocket import get_pocket_from_ligand, \
        prepare_pocket

    pdb = "/root/reference/example/3rfm.pdb"
    sdf = "/root/reference/example/3rfm_B_CFF.sdf"
    enc = {k: v for k, v in
           dataset_params["crossdock_full"]["atom_encoder"].items()
           if v < 10}
    residues = get_pocket_from_ligand(parse_pdb(pdb), sdf, 8.0)
    pocket = prepare_pocket(residues, enc, "full-atom", repeats=B,
                            pad_multiple=64)
    x = np.asarray(pocket.x, np.float32)
    h = np.asarray(pocket.h, np.float32)
    m = np.asarray(pocket.mask, bool)
    return x, h, m, pocket


def measure_reference(x_poc, h_poc, m_poc, reps=3):
    import reference_shim
    reference_shim.install()
    import torch
    from equivariant_diffusion.dynamics import EGNNDynamics as TorchDyn

    torch.manual_seed(0)
    tdyn = TorchDyn(
        atom_nf=10, residue_nf=10, n_dims=3, joint_nf=128, hidden_nf=256,
        device="cpu", act_fn=torch.nn.SiLU(), n_layers=6, attention=True,
        condition_time=True, tanh=True, mode="egnn_dynamics",
        norm_constant=1, inv_sublayers=1, sin_embedding=False,
        normalization_factor=100, aggregation_method="sum",
        update_pocket_coords=False, edge_cutoff_ligand=None,
        edge_cutoff_pocket=5.0, edge_cutoff_interaction=5.0,
        reflection_equivariant=False).float().eval()

    rng = np.random.default_rng(0)
    npk = int(m_poc[0].sum())
    poc_flat = []
    lig_flat = []
    for b in range(B):
        poc_flat.append(np.concatenate(
            [x_poc[b, :npk], h_poc[b, :npk]], axis=1))
        com = x_poc[b, :npk].mean(0)
        lig_x = com + rng.normal(size=(NL, 3)).astype(np.float32)
        lig_h = np.eye(10, dtype=np.float32)[
            rng.integers(0, 4, size=NL)]
        lig_flat.append(np.concatenate([lig_x, lig_h], axis=1))
    poc_flat = torch.tensor(np.concatenate(poc_flat), dtype=torch.float32)
    lig_flat = torch.tensor(np.concatenate(lig_flat), dtype=torch.float32)
    lidx = torch.repeat_interleave(torch.arange(B), NL)
    pidx = torch.repeat_interleave(torch.arange(B), npk)
    t = torch.full((B, 1), 0.5, dtype=torch.float32)

    print("[ref] warmup...", flush=True)
    with torch.no_grad():
        tdyn(lig_flat, poc_flat, t, lidx, pidx)  # warmup
        print("[ref] timing...", flush=True)
        times = []
        for _ in range(reps):
            t0 = time.time()
            tdyn(lig_flat, poc_flat, t, lidx, pidx)
            times.append(time.time() - t0)
    return float(np.median(times)), npk


def measure_ours_fwd(np_pad):
    """One dense row-tiled EGNN forward at the same shapes, JAX CPU."""
    import jax
    import jax.numpy as jnp

    from diffndm_tpu.config import EGNNConfig
    from diffndm_tpu.models.dynamics import EGNNDynamics

    cfg = EGNNConfig(hidden_nf=256, joint_nf=128, n_layers=6,
                     inv_sublayers=1, attention=True, tanh=True,
                     norm_constant=1.0, reflection_equivariant=False,
                     edge_cutoff_pocket=5.0, edge_cutoff_interaction=5.0,
                     row_tile=8, compute_dtype="float32",
                     use_pallas=False, band_window=None)
    module = EGNNDynamics(cfg, atom_nf=10, residue_nf=10)
    print("[ours] init...", flush=True)
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, NL, 13)), jnp.zeros((1, np_pad, 13)),
                         jnp.zeros((1,)), jnp.ones((1, NL)),
                         jnp.ones((1, np_pad)))
    fwd = jax.jit(lambda p, *a: module.apply(p, *a))
    args = (jnp.zeros((B, NL, 13)), jnp.zeros((B, np_pad, 13)),
            jnp.zeros((B,)), jnp.ones((B, NL)), jnp.ones((B, np_pad)))
    print("[ours] compile...", flush=True)
    jax.block_until_ready(fwd(params, *args))
    t0 = time.time()
    jax.block_until_ready(fwd(params, *args))
    return time.time() - t0


def main():
    x, h, m, pocket = build_pocket_arrays()
    ref_fwd, npk = measure_reference(x, h, m)
    ours_fwd = None
    if os.environ.get("SKIP_OURS") != "1":
        ours_fwd = measure_ours_fwd(int(pocket.x.shape[1]))

    ref_lig_s = B / (T * ref_fwd)
    out = {
        "cpu_count": os.cpu_count(),
        "shapes": {"B": B, "NL": NL, "pocket_atoms": npk,
                   "pocket_padded": int(pocket.x.shape[1])},
        "ref_fwd_ms": round(ref_fwd * 1e3, 1),
        "ref_cpu_lig_s_upper_bound": round(ref_lig_s, 5),
        "gpu_estimate_lig_s": round(BASELINE_GPU_ESTIMATE, 5),
        "implied_gpu_over_cpu": round(BASELINE_GPU_ESTIMATE / ref_lig_s, 1),
        "ours_cpu_fwd_ms": (None if ours_fwd is None
                            else round(ours_fwd * 1e3, 1)),
        "note": ("ref_fwd_ms is one reference EGNN forward (torch CPU, "
                 "no_grad): a lower bound on its per-step cost. "
                 "ours_cpu_fwd_ms is the dense padded design, which "
                 "intentionally trades CPU efficiency for TPU shape "
                 "friendliness — compare on TPU via bench.py."),
    }
    print(json.dumps(out, indent=1))
    with open(os.path.join(ROOT, "BASELINE_MEASURED.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
