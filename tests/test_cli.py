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


@pytest.mark.skipif(not os.path.exists("/root/reference/example/3rfm.pdb"),
                    reason="reference example not mounted")
def test_optimize_cli_end_to_end(tmp_path):
    """Evolutionary optimizer: tiny population, two generations, real
    pocket; final SDF written and score trajectory printed."""
    import yaml

    from diffndm_tpu.cli.optimize import main

    cfg = {
        "dataset": "crossdock",
        "mode": "pocket_conditioning",
        "pocket_representation": "full-atom",
        "egnn_params": {"joint_nf": 8, "hidden_nf": 16, "n_layers": 1,
                        "inv_sublayers": 1, "attention": False,
                        "reflection_equivariant": True,
                        "edge_cutoff_ligand": None,
                        "edge_cutoff_pocket": 5.0,
                        "edge_cutoff_interaction": 5.0},
        "diffusion_params": {"diffusion_steps": 8,
                             "diffusion_noise_schedule": "polynomial_2",
                             "diffusion_noise_precision": 5.0e-4,
                             "normalize_factors": [1, 4]},
    }
    cfg_path = tmp_path / "tiny.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    out = tmp_path / "opt.sdf"
    main(["none", "--pdbfile", "/root/reference/example/3rfm.pdb",
          "--ref_ligand", "/root/reference/example/3rfm_B_CFF.sdf",
          "--outfile", str(out), "--objective", "qed",
          "--population_size", "8", "--evolution_steps", "2",
          "--top_k", "3", "--timesteps", "4", "--config", str(cfg_path)])
    assert out.exists()
    from diffndm_tpu.chem.io import read_sdf

    assert len(read_sdf(str(out))) >= 1

    # vina objective: native structure-based affinity vs the receptor
    # (beyond the reference's qed/sa pair)
    out2 = tmp_path / "opt_vina.sdf"
    main(["none", "--pdbfile", "/root/reference/example/3rfm.pdb",
          "--ref_ligand", "/root/reference/example/3rfm_B_CFF.sdf",
          "--outfile", str(out2), "--objective", "vina",
          "--population_size", "4", "--evolution_steps", "1",
          "--top_k", "2", "--timesteps", "4", "--config", str(cfg_path)])
    assert out2.exists()


def test_plot_curves_from_metrics_jsonl(tmp_path):
    import json

    from diffndm_tpu.cli.plot import main

    path = tmp_path / "metrics.jsonl"
    with open(path, "w") as f:
        for step in (1, 2, 3):
            f.write(json.dumps({"step": step, "split": "train",
                                "loss": 1.0 / step}) + "\n")
        f.write(json.dumps({"step": 3, "split": "val", "loss": 0.5,
                            "QED": 0.4}) + "\n")
    out = tmp_path / "curves"
    main([str(path), "--outdir", str(out), "--curves"])
    files = sorted(os.listdir(out))
    assert "curve_loss.png" in files and "curve_QED.png" in files


@pytest.mark.skipif(not os.path.exists("/root/reference/example/3rfm.pdb"),
                    reason="reference example not mounted")
def test_sweep_resume_skips_existing(tmp_path, capsys):
    """--resume must skip pockets whose output SDF already exists without
    touching the model."""
    from diffndm_tpu.cli.sweep import main

    outdir = tmp_path / "out"
    outdir.mkdir()
    # pre-create outputs for both example pockets
    for name in ("3rfm", "5ndu"):
        (outdir / f"{name}_gen.sdf").write_text("")
    main(["none", "--test_dir", "/root/reference/example",
          "--outdir", str(outdir), "--n_samples", "2", "--timesteps", "2",
          "--max_pockets", "2", "--resume"])
    out = capsys.readouterr().out
    assert out.count("skipped (resume)") == 2
