"""Training CLI (reference train.py): YAML config -> data-parallel training
with periodic eval and orbax checkpoints."""

from __future__ import annotations

import argparse
import os
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint dir to resume from")
    p.add_argument("--max_steps", type=int, default=None)
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from diffndm_tpu.config import (TrainConfig, load_yaml,
                                    model_config_from_yaml)
    from diffndm_tpu.constants import dataset_params
    from diffndm_tpu.data.dataset import (BucketedLoader,
                                          ProcessedLigandPocketDataset)
    from diffndm_tpu.model import DiffNDM
    from diffndm_tpu.train.trainer import Trainer

    raw = load_yaml(args.config)
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
    )
    datadir = raw["datadir"]
    outdir = raw.get("logdir", "runs") + "/" + raw.get("run_name", "run")
    os.makedirs(outdir, exist_ok=True)

    hist_path = os.path.join(datadir, "size_distribution.npy")
    hist = np.load(hist_path) if os.path.exists(hist_path) else None
    model = DiffNDM(mcfg, size_histogram=hist)
    di = dataset_params[mcfg.dataset]
    trainer = Trainer(model.core, model.module, model.params, tcfg,
                      lj_rm=di["lennard_jones_rm"])
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

    key = jax.random.PRNGKey(tcfg.seed)
    step = 0
    best_val = float("inf")
    for epoch in range(tcfg.n_epochs):
        t0 = time.time()
        losses = []
        for ligand, pocket in loader:
            key, k = jax.random.split(key)
            loss, info = trainer.train_step(k, ligand, pocket)
            losses.append(loss)
            step += 1
            if args.max_steps and step >= args.max_steps:
                break
        print(f"epoch {epoch}: loss={np.mean(losses):.4f} "
              f"({time.time() - t0:.1f}s, {len(losses)} steps)")
        if val_ds is not None and (epoch + 1) % tcfg.eval_epochs == 0:
            vl = []
            for ligand, pocket in BucketedLoader(
                    val_ds, tcfg.batch_size, shuffle=False,
                    drop_feature_cols=drop):
                key, k = jax.random.split(key)
                loss, _ = trainer.eval_step(k, ligand, pocket)
                vl.append(loss)
            v = float(np.mean(vl))
            print(f"  val loss={v:.4f}")
            if v < best_val:
                best_val = v
                trainer.save_checkpoint(os.path.join(outdir, "best"))
        trainer.save_checkpoint(os.path.join(outdir, "last"))
        if args.max_steps and step >= args.max_steps:
            break
    print("training done")


if __name__ == "__main__":
    main()
