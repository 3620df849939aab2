"""Test-set sweep: generate for many pockets in ONE process.

Replaces the reference's per-pocket subprocess spawning (my_test.py:90,
test.py:81-176) — the jitted sampler is compiled once per shape bucket and
reused across pockets; per-pocket wall time and sec/mol are recorded like
test.py:151-176, with the same retry + oversample-until-valid policy.
"""

from __future__ import annotations

import argparse
import os
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint", type=str)
    p.add_argument("--test_dir", type=str, required=True,
                   help="dir of <name>.pdb + <name>.sdf pairs")
    p.add_argument("--outdir", type=str, required=True)
    p.add_argument("--n_samples", type=int, default=20)
    p.add_argument("--timesteps", type=int, default=None)
    p.add_argument("--max_pockets", type=int, default=100)
    p.add_argument("--sanitize", action="store_true")
    p.add_argument("--all_frags", action="store_true",
                   help="keep all fragments (reference test.py:127 defaults\n                   to the largest fragment)")
    p.add_argument("--oversample_maxiter", type=int, default=10,
                   help="regenerate until n_samples valid (test.py:102-135)")
    p.add_argument("--max_tries", type=int, default=10)
    p.add_argument("--SVDD", type=int, default=0)
    p.add_argument("--SPSA", type=int, default=0)
    p.add_argument("--batch_pockets", type=int, default=1,
                   help="pockets generated together in one device batch "
                        "(amortizes compiles/dispatch; with --SVDD the "
                        "ATP top-k is restricted to each pocket's rows)")
    # inpaint sweep (my_test_inpaint.py:38-52 defaults)
    p.add_argument("--inpaint", action="store_true",
                   help="inpainting sweep: fragments extracted from each "
                        "reference ligand (first 1/4 of atoms)")
    p.add_argument("--add_n_nodes", type=int, default=10)
    p.add_argument("--resamplings", type=int, default=10)
    p.add_argument("--frag_fraction", type=float, default=0.25)
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--noise_scale", type=float, default=1.0,
                   help="low-temperature sampling (see cli/generate)")
    p.add_argument("--w_connectivity", type=float, default=0.0,
                   help="opt-in connectivity guidance-reward weight "
                        "(see cli/generate)")
    p.add_argument("--resume", action="store_true",
                   help="skip pockets whose output SDF already exists "
                        "(restart a crashed sweep without redoing work)")
    args = p.parse_args(argv)

    import jax

    from diffndm_tpu.chem.io import write_sdf
    from diffndm_tpu.chem.sanitize import is_valid
    from diffndm_tpu.cli.generate import load_model

    args.optimize = 0
    args.path = args.path_save = None
    model = load_model(args)
    os.makedirs(args.outdir, exist_ok=True)

    pdbs = sorted(f for f in os.listdir(args.test_dir)
                  if f.endswith(".pdb"))[: args.max_pockets]
    key = jax.random.PRNGKey(args.seed)
    times = []

    def find_sdf(name):
        sdf = os.path.join(args.test_dir, name + ".sdf")
        if os.path.exists(sdf):
            return sdf
        cands = [f for f in os.listdir(args.test_dir)
                 if f.startswith(name) and f.endswith(".sdf")]
        return os.path.join(args.test_dir, cands[0]) if cands else None

    if args.inpaint:
        # inpainting sweep (reference my_test_inpaint.py): fragment of each
        # test ligand fixed, rest regenerated
        import tempfile

        from diffndm_tpu.chem.io import read_sdf
        from diffndm_tpu.cli.fix_ligand import extract_fragment
        from diffndm_tpu.cli.inpaint import prepare_inpaint_ligand

        timesteps = args.timesteps or 60
        for pdb in pdbs:
            name = pdb[:-4]
            sdf = find_sdf(name)
            if sdf is None:
                continue
            out_path = os.path.join(args.outdir, f"{name}_inpaint.sdf")
            if args.resume and os.path.exists(out_path):
                print(f"{name}: skipped (resume)")
                continue
            t0 = time.time()
            try:
                frag = extract_fragment(read_sdf(sdf)[0],
                                        args.frag_fraction)
                with tempfile.NamedTemporaryFile(
                        suffix=".sdf", delete=False) as tmp:
                    from diffndm_tpu.chem.io import write_sdf as _w

                    _w(tmp.name, [frag])
                    frag_path = tmp.name
                ligand, lig_fixed = prepare_inpaint_ligand(
                    model, frag_path, args.n_samples, args.add_n_nodes)
                pocket = model.pocket_from_pdb(
                    os.path.join(args.test_dir, pdb), sdf, args.n_samples)
                key, k = jax.random.split(key)
                res = model.inpaint_sampler.inpaint(
                    k, ligand, lig_fixed, pocket, timesteps=timesteps,
                    resamplings=args.resamplings, svdd=bool(args.SVDD),
                    spsa=bool(args.SPSA))
                mols = model.result_to_molecules(
                    res, sanitize=args.sanitize)
                write_sdf(out_path,
                          [m for m in mols if m is not None])
                dt = time.time() - t0
                times.append(dt)
                print(f"{name}: inpainted {len(mols)} in {dt:.1f}s")
            except Exception as e:
                print(f"[skip] {name}: {e}")
        with open(os.path.join(args.outdir, "pocket_times.txt"), "w") as f:
            for dt in times:
                f.write(f"{dt:.2f}\n")
        return

    if args.batch_pockets > 1:
        # multi-pocket device batching (generate_ligands_multi)
        group = []
        for pdb in pdbs:
            sdf = find_sdf(pdb[:-4])
            if sdf:
                group.append((os.path.join(args.test_dir, pdb), sdf))
        for i in range(0, len(group), args.batch_pockets):
            chunk = group[i:i + args.batch_pockets]
            t0 = time.time()
            key, k = jax.random.split(key)
            out = model.generate_ligands_multi(
                chunk, args.n_samples, key=k, timesteps=args.timesteps,
                sanitize=args.sanitize,
                largest_frag=not args.all_frags)
            dt = time.time() - t0
            for name, mols in out.items():
                write_sdf(os.path.join(
                    args.outdir, f"{name[:-4]}_gen.sdf"),
                    [m for m in mols if m is not None])
            print(f"batch of {len(chunk)} pockets in {dt:.1f}s "
                  f"({dt / (len(chunk) * args.n_samples):.2f} s/mol)")
            times.append(dt)
        with open(os.path.join(args.outdir, "pocket_times.txt"), "w") as f:
            for dt in times:
                f.write(f"batch {dt:.2f}\n")
        return
    for pdb in pdbs:
        name = pdb[:-4]
        sdf = os.path.join(args.test_dir, name + ".sdf")
        if not os.path.exists(sdf):
            cands = [f for f in os.listdir(args.test_dir)
                     if f.startswith(name) and f.endswith(".sdf")]
            if not cands:
                continue
            sdf = os.path.join(args.test_dir, cands[0])
        if args.resume and os.path.exists(
                os.path.join(args.outdir, f"{name}_gen.sdf")):
            print(f"{name}: skipped (resume)")
            continue
        t0 = time.time()
        valid_mols = []
        for attempt in range(args.max_tries):
            try:
                for _ in range(args.oversample_maxiter):
                    key, k = jax.random.split(key)
                    mols, _ = model.generate_ligands(
                        os.path.join(args.test_dir, pdb),
                        args.n_samples, sdf, key=k,
                        timesteps=args.timesteps, sanitize=args.sanitize,
                        largest_frag=not args.all_frags)
                    valid_mols += [m for m in mols
                                   if m is not None and is_valid(m)]
                    if len(valid_mols) >= args.n_samples:
                        break
                break
            except Exception as e:  # retry policy, test.py:81-168
                print(f"[retry {attempt}] {name}: {e}")
        dt = time.time() - t0
        times.append(dt)
        out = os.path.join(args.outdir, f"{name}_gen.sdf")
        write_sdf(out, valid_mols[: args.n_samples])
        print(f"{name}: {len(valid_mols)} valid in {dt:.1f}s "
              f"({dt / max(len(valid_mols), 1):.2f} s/mol)")
    with open(os.path.join(args.outdir, "pocket_times.txt"), "w") as f:
        for pdb, dt in zip(pdbs, times):
            f.write(f"{pdb} {dt:.2f}\n")
        if times:
            f.write(f"mean {sum(times) / len(times):.2f}\n")


if __name__ == "__main__":
    main()
