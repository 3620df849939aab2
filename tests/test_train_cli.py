"""End-to-end train CLI smoke test: tiny synthetic dataset in the
reference npz format -> cli.train.main -> metrics.jsonl with train AND
val records including the chemistry dashboard, checkpoints, hparams.yaml,
and the resume-hparam merge."""

import json
import os

import numpy as np
import pytest
import yaml

from diffndm_tpu.constants import dataset_params

DP = dataset_params["crossdock_full"]
N_TYPES = len(DP["atom_decoder"])  # includes the dropped 'others' column


def _write_split(path, n_complexes, rng):
    lig_coords, lig_oh, lig_mask = [], [], []
    poc_coords, poc_oh, poc_mask = [], [], []
    for i in range(n_complexes):
        nl = rng.integers(4, 8)
        npk = rng.integers(8, 14)
        lig_coords.append(rng.normal(size=(nl, 3)) * 2)
        lig_oh.append(np.eye(N_TYPES)[rng.integers(0, 4, nl)])
        lig_mask.append(np.full(nl, i))
        poc_coords.append(rng.normal(size=(npk, 3)) * 3)
        poc_oh.append(np.eye(N_TYPES)[rng.integers(0, 4, npk)])
        poc_mask.append(np.full(npk, i))
    np.savez(
        path,
        lig_coords=np.concatenate(lig_coords).astype(np.float32),
        lig_one_hot=np.concatenate(lig_oh).astype(np.float32),
        lig_mask=np.concatenate(lig_mask),
        pocket_coords=np.concatenate(poc_coords).astype(np.float32),
        pocket_one_hot=np.concatenate(poc_oh).astype(np.float32),
        pocket_mask=np.concatenate(poc_mask),
        names=np.array([f"c{i}" for i in range(n_complexes)]))


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    from diffndm_tpu.cli import train as train_cli

    root = tmp_path_factory.mktemp("train_cli")
    datadir = root / "data"
    datadir.mkdir()
    rng = np.random.default_rng(0)
    _write_split(datadir / "train.npz", 8, rng)
    _write_split(datadir / "val.npz", 4, rng)

    cfg = {
        "run_name": "smoke",
        "logdir": str(root / "runs"),
        "dataset": "crossdock",
        "datadir": str(datadir),
        "mode": "pocket_conditioning",
        "pocket_representation": "full-atom",
        "batch_size": 4,
        "lr": 1.0e-3,
        "n_epochs": 1,
        "clip_grad": True,
        "accumulate_grad_batches": 1,
        "auxiliary_loss": False,
        "eval_epochs": 1,
        "egnn_params": {
            "joint_nf": 8, "hidden_nf": 16, "n_layers": 1,
            "inv_sublayers": 1, "attention": False, "tanh": True,
            "norm_constant": 1, "reflection_equivariant": True,
            "edge_cutoff_ligand": None, "edge_cutoff_pocket": 5.0,
            "edge_cutoff_interaction": 5.0,
        },
        "diffusion_params": {
            "diffusion_steps": 10,
            "diffusion_noise_schedule": "polynomial_2",
            "diffusion_noise_precision": 5.0e-4,
            "diffusion_loss_type": "l2",
            "normalize_factors": [1, 4],
        },
    }
    cfg_path = root / "smoke.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    train_cli.main(["--config", str(cfg_path), "--max_steps", "4"])
    return root, cfg_path


def test_metrics_stream(tiny_run):
    root, _ = tiny_run
    outdir = root / "runs" / "smoke"
    lines = [json.loads(l) for l in open(outdir / "metrics.jsonl")]
    splits = {l["split"] for l in lines}
    assert "train" in splits and "val" in splits
    train_recs = [l for l in lines if l["split"] == "train"]
    assert np.isfinite(train_recs[-1]["loss"])
    val = [l for l in lines if l["split"] == "val"][-1]
    # the chemistry dashboard ran (lightning_modules.py:515-533 metrics)
    for k in ("Validity", "Connectivity", "Uniqueness", "QED", "SA",
              "LogP", "Lipinski", "Diversity", "kl_div_atom_types"):
        assert k in val, f"missing dashboard metric {k}"


def test_checkpoints_and_hparams(tiny_run):
    root, _ = tiny_run
    outdir = root / "runs" / "smoke"
    assert (outdir / "last").exists()
    assert (outdir / "hparams.yaml").exists()


def test_resume_hparam_merge(tiny_run, capsys):
    from diffndm_tpu.cli.train import merge_resume_hparams

    root, cfg_path = tiny_run
    outdir = root / "runs" / "smoke"
    raw = yaml.safe_load(open(cfg_path))
    raw["lr"] = 123.0  # conflicting value -> ckpt hparams must win
    merged = merge_resume_hparams(raw, str(outdir / "last"))
    assert merged["lr"] == 1.0e-3
    assert "overwritten" in capsys.readouterr().out


def test_set_override_beats_resume_merge(tiny_run):
    """--set KEY=VALUE applies AFTER the resume merge (the merge itself
    follows the reference: checkpoint hparams win), so a deliberate
    low-LR continuation is expressible: --set lr=3e-4."""
    from diffndm_tpu.cli import train as train_cli

    root, cfg_path = tiny_run
    outdir = root / "runs" / "smoke"
    train_cli.main(["--config", str(cfg_path), "--max_steps", "1",
                    "--resume", str(outdir / "last"),
                    "--set", "lr=3.0e-4", "--set", "run_name=smoke2"])
    hp = yaml.safe_load(open(root / "runs" / "smoke2" / "hparams.yaml"))
    assert hp["lr"] == pytest.approx(3.0e-4)
