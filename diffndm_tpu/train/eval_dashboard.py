"""Eval-time chemistry dashboard.

Reference ``sample_and_analyze_given_pocket`` / ``analyze_sample``
(lightning_modules.py:461-598): every eval epoch, sample ligands for the
validation pockets with the CURRENT parameters and report

- atom-type KL vs the training histogram (metrics.py:11-32),
- validity / connectivity / uniqueness / novelty,
- QED / SA / LogP / Lipinski / pairwise diversity,
- optional molecule SDF dumps + 3D renders.

All metrics go through MetricsLogger (wandb-equivalent JSONL) so a run
produces the same dashboard stream the reference logs to wandb.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from diffndm_tpu.chem.bonds import build_molecules_batch
from diffndm_tpu.chem.metrics import (BasicMolecularMetrics,
                                      CategoricalDistribution,
                                      MoleculeProperties)
from diffndm_tpu.structs import NodeBatch


class ChemistryDashboard:
    def __init__(self, dataset_info: dict, outdir: str,
                 train_smiles: Optional[Sequence[str]] = None,
                 n_visualize: int = 0,
                 receptor_pdb: Optional[str] = None):
        """receptor_pdb: when given, eval samples are also scored with the
        native Vina-style affinity (the reference logs smina at eval when
        receptors are available, lightning_modules.py:530-532)."""
        self.dataset_info = dataset_info
        self.outdir = outdir
        self.n_visualize = n_visualize
        self.props = MoleculeProperties()
        self.metrics = BasicMolecularMetrics(dataset_info, train_smiles)
        hist = dataset_info.get("atom_hist")
        self.type_dist = None
        if hist:
            self.type_dist = CategoricalDistribution(
                hist, dataset_info["atom_encoder"])
        self.scorer = None
        if receptor_pdb:
            from diffndm_tpu.chem.scoring import VinaScorer

            self.scorer = VinaScorer.from_pdb(receptor_pdb)

    def analyze(self, ligand: NodeBatch, epoch: int = 0,
                dump_sdf: bool = False) -> dict:
        """Decoded ligand batch -> dashboard metric dict
        (analyze_sample, lightning_modules.py:498-534)."""
        coords = np.asarray(ligand.x)
        types = np.asarray(ligand.h).argmax(-1)
        mask = np.asarray(ligand.mask)

        out = {}
        if self.type_dist is not None:
            flat_types = types[mask > 0.5]
            out["kl_div_atom_types"] = self.type_dist.kl_divergence(
                flat_types.tolist())

        mols = build_molecules_batch(coords, types, mask,
                                     self.dataset_info)
        (validity, connectivity, uniqueness,
         novelty), (valid, connected) = self.metrics.evaluate_rdmols(mols)
        out.update(Validity=validity, Connectivity=connectivity,
                   Uniqueness=uniqueness, Novelty=novelty)

        qed, sa, logp, lipinski, diversity = self.props.evaluate_mean(
            connected if connected else valid)
        out.update(QED=qed, SA=sa, LogP=logp, Lipinski=lipinski,
                   Diversity=diversity)

        if self.scorer is not None and valid:
            out["VinaAffinity"] = float(np.mean(
                [self.scorer.score(m) for m in valid]))

        if dump_sdf and valid:
            from diffndm_tpu.chem.io import write_sdf

            os.makedirs(self.outdir, exist_ok=True)
            sdf = os.path.join(self.outdir, f"eval_ep{epoch}.sdf")
            write_sdf(sdf, valid)
            if self.n_visualize > 0:
                try:
                    from diffndm_tpu.utils.visualization import \
                        visualize_molecules

                    visualize_molecules(
                        sdf, os.path.join(self.outdir, f"viz_ep{epoch}"))
                except Exception as e:  # rendering is best-effort
                    print(f"[dashboard] visualization failed: {e}")
        return out

    def sample_and_analyze(self, key, sampler, pocket: NodeBatch,
                           size_distribution, epoch: int = 0,
                           dump_sdf: bool = False) -> dict:
        """Sample ligands for the given (padded) pockets with the sampler's
        current params, then analyze (lightning_modules.py:541-598)."""
        import jax

        key, k_n = jax.random.split(key)
        n_pocket = np.asarray(pocket.mask.sum(1)).astype(int)
        num_nodes = np.asarray(
            size_distribution.sample_conditional(k_n, n2=n_pocket))
        num_nodes = np.maximum(num_nodes, 2)
        result = sampler.sample_given_pocket(key, pocket, num_nodes)
        return self.analyze(result.ligand, epoch=epoch, dump_sdf=dump_sdf)
