"""Training CLI (reference train.py): YAML config -> data-parallel training
with periodic eval (loss + chemistry dashboard) and orbax checkpoints.

Parity notes:
- resume-hparam merge (reference train.py:62-75): ``--resume <ckpt_dir>``
  reads the run's saved ``hparams.yaml`` and merges it over the given
  config (checkpoint hyperparameters win, with a warning per overwrite);
- eval cadence (lightning_modules.py:431-598): every ``eval_epochs`` the
  val loss is computed AND ligands are sampled for val pockets and scored
  (type-KL, validity/connectivity/uniqueness/novelty, QED/SA/LogP/
  Lipinski/diversity), all streamed to ``metrics.jsonl`` via
  MetricsLogger (the wandb-equivalent);
- ModelCheckpoint on val loss, save_top_k=1 + last (train.py:137-144).
"""

from __future__ import annotations

import argparse
import os
import time


def merge_resume_hparams(raw: dict, resume_dir: str) -> dict:
    """Reference train.py:62-75: checkpoint hparams take precedence over
    the passed config; every overwritten key prints a warning."""
    import yaml

    hp_path = os.path.join(os.path.dirname(os.path.abspath(resume_dir)),
                           "hparams.yaml")
    if not os.path.exists(hp_path):
        hp_path = os.path.join(resume_dir, "hparams.yaml")
    if not os.path.exists(hp_path):
        print(f"[resume] no hparams.yaml next to {resume_dir}; "
              f"using the passed config as-is")
        return raw
    with open(hp_path) as f:
        saved = yaml.safe_load(f)
    merged = dict(raw)
    for k, v in saved.items():
        if k in ("datadir", "logdir", "run_name", "eval_epochs",
                 "n_epochs"):
            continue  # paths + run-control cadence follow the current
            #           invocation; only model/optimizer hparams carry
            #           over from the checkpoint
        if k in merged and merged[k] != v:
            print(f"[resume] config value {k}={merged[k]!r} overwritten "
                  f"by checkpoint value {v!r}")
        merged[k] = v
    return merged


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint dir to resume from")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--max_seconds", type=float, default=None,
                   help="wall-clock budget; stops after the current epoch")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="hparam override applied AFTER the resume merge "
                        "(values yaml-parsed), e.g. --set lr=3e-4 for a "
                        "low-LR continuation; repeatable")
    args = p.parse_args(argv)

    import jax
    import numpy as np
    import yaml

    from diffndm_tpu.config import (TrainConfig, load_yaml,
                                    model_config_from_yaml)
    from diffndm_tpu.constants import dataset_params
    from diffndm_tpu.data.dataset import (BucketedLoader,
                                          ProcessedLigandPocketDataset)
    from diffndm_tpu.model import DiffNDM
    from diffndm_tpu.train.eval_dashboard import ChemistryDashboard
    from diffndm_tpu.train.metrics_logger import MetricsLogger
    from diffndm_tpu.train.trainer import Trainer

    raw = load_yaml(args.config)
    if args.resume:
        raw = merge_resume_hparams(raw, args.resume)
    for ov in args.overrides:
        k, eq, v = ov.partition("=")
        if not eq:
            p.error(f"--set expects KEY=VALUE, got {ov!r}")
        # dotted paths reach nested hparam dicts: --set egnn_params.n_layers=6
        cur, parts = raw, k.split(".")
        for pk in parts[:-1]:
            nxt = cur.setdefault(pk, {})
            if not isinstance(nxt, dict):
                p.error(f"--set {k}: {pk!r} is not a mapping")
            cur = nxt
        if parts[-1] not in cur:
            print(f"[override] WARNING: {k!r} was not present in the "
                  f"merged hparams — check for a typo")
        cur[parts[-1]] = yaml.safe_load(v)
        print(f"[override] {k} = {cur[parts[-1]]!r}")
    mcfg = model_config_from_yaml(raw)
    lp = raw.get("loss_params", {})
    tcfg = TrainConfig(
        lr=float(raw.get("lr", 1e-3)),
        batch_size=int(raw.get("batch_size", 16)),
        n_epochs=int(raw.get("n_epochs", 1000)),
        clip_grad=bool(raw.get("clip_grad", True)),
        accumulate_grad_batches=int(
            raw.get("accumulate_grad_batches", 1)),
        auxiliary_loss=bool(raw.get("auxiliary_loss", False)),
        aux_max_weight=float(lp.get("max_weight", 1e-3)),
        aux_schedule=lp.get("schedule", "linear"),
        aux_clamp_lj=float(lp.get("clamp_lj", 3.0)),
        eval_epochs=int(raw.get("eval_epochs", 50)),
        ema_decay=float(raw.get("ema_decay", 0.0)),
    )
    datadir = raw["datadir"]
    outdir = raw.get("logdir", "runs") + "/" + raw.get("run_name", "run")
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "hparams.yaml"), "w") as f:
        yaml.safe_dump(raw, f)
    logger = MetricsLogger(outdir)

    hist_path = os.path.join(datadir, "size_distribution.npy")
    hist = np.load(hist_path) if os.path.exists(hist_path) else None
    model = DiffNDM(mcfg, size_histogram=hist)
    di = dataset_params[mcfg.dataset]
    gamma_module = None
    train_params = model.params
    if mcfg.diffusion.noise_schedule == "learned":
        # train the GammaNetwork jointly with the dynamics (VLB objective)
        gamma_module = model.core.schedule.module
        train_params = {"dynamics": model.params,
                        "gamma": model.core.schedule.params}
    trainer = Trainer(model.core, model.module, train_params, tcfg,
                      lj_rm=di["lennard_jones_rm"],
                      gamma_module=gamma_module)
    if args.resume:
        trainer.load_checkpoint(args.resume)

    train_ds = ProcessedLigandPocketDataset(
        os.path.join(datadir, "train.npz"))
    val_path = os.path.join(datadir, "val.npz")
    val_ds = (ProcessedLigandPocketDataset(val_path)
              if os.path.exists(val_path) else None)
    drop = di["_pad_types"]
    loader = BucketedLoader(train_ds, tcfg.batch_size,
                            drop_feature_cols=drop)

    smiles_path = os.path.join(datadir, "train_smiles.npy")
    train_smiles = (np.load(smiles_path, allow_pickle=True).tolist()
                    if os.path.exists(smiles_path) else None)
    dashboard = ChemistryDashboard(di, os.path.join(outdir, "eval"),
                                   train_smiles=train_smiles,
                                   n_visualize=int(
                                       raw.get("eval_params", {}).get(
                                           "n_visualize_samples", 0)),
                                   receptor_pdb=raw.get(
                                       "eval_params", {}).get(
                                           "receptor_pdb"))

    def current_dynamics_params():
        # sample/eval from the EMA weights when enabled
        params = jax.device_get(trainer.state.ema_params
                                if tcfg.ema_decay > 0.0
                                else trainer.state.params)
        return params["dynamics"] if gamma_module is not None else params

    key = jax.random.PRNGKey(tcfg.seed)
    step = 0
    best_val = float("inf")
    t_start = time.time()
    stop = False
    for epoch in range(tcfg.n_epochs):
        t0 = time.time()
        losses = []
        for ligand, pocket in loader:
            key, k = jax.random.split(key)
            loss, info = trainer.train_step(k, ligand, pocket)
            losses.append(loss)
            step += 1
            if args.max_steps and step >= args.max_steps:
                stop = True
                break
        logger.log({"loss": float(np.mean(losses)),
                    "grad_norm": info.get("grad_norm", 0.0),
                    "epoch_seconds": time.time() - t0,
                    "steps": len(losses)}, step, epoch, "train")
        if val_ds is not None and (epoch + 1) % tcfg.eval_epochs == 0:
            vl = []
            val_loader = BucketedLoader(val_ds, tcfg.batch_size,
                                        shuffle=False,
                                        drop_feature_cols=drop)
            first_batch = None
            for ligand, pocket in val_loader:
                if first_batch is None:
                    first_batch = pocket
                key, k = jax.random.split(key)
                loss, _ = trainer.eval_step(k, ligand, pocket)
                vl.append(loss)
            v = float(np.mean(vl))
            metrics = {"loss": v}
            # chemistry dashboard on the first val pocket batch
            # (lightning_modules.py:461-598)
            if first_batch is not None:
                model.set_params(current_dynamics_params())
                key, k = jax.random.split(key)
                try:
                    metrics.update(dashboard.sample_and_analyze(
                        k, model.sampler, first_batch,
                        model.size_distribution, epoch=epoch,
                        dump_sdf=True))
                except Exception as e:
                    print(f"[dashboard] eval sampling failed: {e}")
            logger.log(metrics, step, epoch, "val")
            if v < best_val:
                best_val = v
                trainer.save_checkpoint(os.path.join(outdir, "best"))
        trainer.save_checkpoint(os.path.join(outdir, "last"))
        if args.max_seconds and time.time() - t_start > args.max_seconds:
            print(f"[train] wall-clock budget reached "
                  f"({args.max_seconds}s); stopping")
            stop = True
        if stop:
            break
    logger.close()
    print("training done")


if __name__ == "__main__":
    main()
