"""CLI surface smoke tests (argument parsing + host-side mains)."""

import os

import numpy as np
import pytest


def _write_mols_sdf(path, n=3):
    from diffndm_tpu.chem.io import write_sdf
    from diffndm_tpu.chem.mol import Molecule

    mols = []
    for i in range(n):
        coords = np.array([[0, 0, 0], [1.5, 0, 0], [2.3, 1.2, 0],
                           [3.8, 1.2, 0]]) + i * 0.01
        mols.append(Molecule(["C", "C", "O", "C"],
                             [(0, 1, 1), (1, 2, 1), (2, 3, 1)],
                             coords=coords))
    write_sdf(path, mols)


def test_evaluate_cli(tmp_path, capsys):
    from diffndm_tpu.cli.evaluate import main

    sdf = str(tmp_path / "gen.sdf")
    _write_mols_sdf(sdf)
    out = str(tmp_path / "report.txt")
    main([str(tmp_path), "--expected_per_file", "3", "--out", out])
    report = open(out).read()
    assert "AGGREGATE" in report and "QED=" in report


def test_evaluate_cli_per_step(tmp_path):
    from diffndm_tpu.cli.evaluate import main

    for step in (100, 20, 300):
        _write_mols_sdf(str(tmp_path / f"try_{step}.sdf"))
    out = str(tmp_path / "steps.txt")
    main([str(tmp_path), "--per_step", "--out", out])
    lines = open(out).read().strip().splitlines()
    steps = [int(l.split()[1].rstrip(":")) for l in lines]
    assert steps == sorted(steps) == [20, 100, 300]
    assert all("QED:" in l and "SA:" in l for l in lines)


def test_plot_cli(tmp_path):
    from diffndm_tpu.cli.evaluate import main as eval_main
    from diffndm_tpu.cli.plot import main as plot_main

    sdf = str(tmp_path / "gen.sdf")
    _write_mols_sdf(sdf)
    rep = str(tmp_path / "r.txt")
    eval_main([str(tmp_path), "--out", rep])
    outdir = str(tmp_path / "plots")
    plot_main([f"origin={rep}", "--outdir", outdir])
    assert os.path.exists(os.path.join(outdir, "qed_violin.png"))


def test_fix_ligand_cli(tmp_path):
    from diffndm_tpu.cli.fix_ligand import main

    sdf_dir = tmp_path / "ligs"
    sdf_dir.mkdir()
    _write_mols_sdf(str(sdf_dir / "a.sdf"), n=1)
    outdir = str(tmp_path / "frags")
    main([str(sdf_dir), "--outdir", outdir])
    assert os.listdir(outdir) == ["a_frag.sdf"]


def test_debug_cli_sdf(tmp_path, capsys):
    from diffndm_tpu.cli.debug import main

    sdf = str(tmp_path / "m.sdf")
    _write_mols_sdf(sdf, n=1)
    main(["sdf", sdf])
    out = capsys.readouterr().out
    assert "4 atoms" in out and "valid=True" in out


def test_generate_parser_flags():
    from diffndm_tpu.cli.generate import build_parser

    args = build_parser().parse_args(
        ["ckpt", "--pdbfile", "p.pdb", "--outfile", "o.sdf",
         "--SPSA", "1", "--SVDD", "1", "--timesteps", "600",
         "--optimize", "1", "--path_save", "adj.npz"])
    assert args.SPSA == 1 and args.SVDD == 1 and args.timesteps == 600
