"""DiffNDM: the high-level ligand-pocket diffusion model API.

Equivalent of the reference ``LigandPocketDDPM`` Lightning module
(lightning_modules.py:32-934) without the framework: construction from
config, pocket preparation from PDB, conditional generation, inpainting,
diversification, RL-guided generation, checkpointing.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from diffndm_tpu.config import (ModelConfig, RLConfig, SampleConfig,
                                model_config_from_yaml)
from diffndm_tpu.constants import dataset_params
from diffndm_tpu.chem.bonds import build_molecule
from diffndm_tpu.chem.sanitize import process_molecule
from diffndm_tpu.data.pdb import parse_pdb
from diffndm_tpu.data.pocket import get_pocket_from_ligand, prepare_pocket
from diffndm_tpu.diffusion import schedules as S
from diffndm_tpu.diffusion.core import CondDiffusion
from diffndm_tpu.diffusion.diversify import DiversifySampler
from diffndm_tpu.diffusion.inpaint import InpaintSampler
from diffndm_tpu.diffusion.node_distribution import (DistributionNodes,
                                                     default_histogram)
from diffndm_tpu.diffusion.sampler import ConditionalSampler, SampleResult
from diffndm_tpu.guidance.oracle import RewardOracle
from diffndm_tpu.models.adjust_net import AdjustNetState
from diffndm_tpu.models.dynamics import EGNNDynamics
from diffndm_tpu.structs import NodeBatch, to_lists


def to_default_device(params):
    """Move CPU-committed parameters to the default accelerator once.

    Parameters are initialised (or orbax-restored) on the CPU to avoid a
    device compile of the init program, but a CPU-committed array is
    re-transferred on EVERY jitted call that takes it as an argument.
    The fused sampler pays that once per trajectory; the host-orchestrated
    guided loop dispatches ~50 jitted calls per trajectory, and on a
    link-limited PJRT attachment (~24 MB/s axon tunnel) each re-upload of
    the ~6 MB tree cost ~0.5 s — the dominant guided-overhead term until
    round 3.  Sharded / already-on-device trees pass through untouched.
    """
    default = jax.devices()[0]
    if default.platform == "cpu":
        return params

    def move(x):
        if isinstance(x, jax.Array) and not x.is_deleted():
            devs = x.devices()
            if len(devs) == 1 and next(iter(devs)).platform == "cpu":
                return jax.device_put(x, default)
        return x

    return jax.tree_util.tree_map(move, params)


class DiffNDM:
    def __init__(self, model_cfg: ModelConfig,
                 sample_cfg: Optional[SampleConfig] = None,
                 size_histogram: Optional[np.ndarray] = None,
                 params=None, key: Optional[jax.Array] = None):
        self.cfg = model_cfg
        self.sample_cfg = sample_cfg or SampleConfig()
        self.dataset_info = dataset_params[model_cfg.dataset]
        key = key if key is not None else jax.random.PRNGKey(0)

        self.module = EGNNDynamics(model_cfg.egnn,
                                   atom_nf=model_cfg.atom_nf,
                                   residue_nf=model_cfg.residue_nf)
        if params is None:
            nl, npk = 8, 16
            # init on CPU: avoids a TPU compile of the init program; use a
            # non-Pallas clone (CPU only supports interpret mode, and the
            # param tree is identical either way)
            import dataclasses as _dc

            init_module = EGNNDynamics(
                _dc.replace(model_cfg.egnn, use_pallas=False),
                atom_nf=model_cfg.atom_nf,
                residue_nf=model_cfg.residue_nf)
            with jax.default_device(jax.devices("cpu")[0]):
                params = init_module.init(
                    key,
                    jnp.zeros((1, nl, 3 + model_cfg.atom_nf)),
                    jnp.zeros((1, npk, 3 + model_cfg.residue_nf)),
                    jnp.zeros((1,)), jnp.ones((1, nl)),
                    jnp.ones((1, npk)))
        self.params = to_default_device(params)

        d = model_cfg.diffusion
        if d.noise_schedule == "learned":
            # VDM-style monotone gamma network (requires the vlb loss,
            # en_diffusion.py:30-32).  To TRAIN it, pass
            # gamma_module=self.core.schedule.module to Trainer with
            # params={"dynamics":..., "gamma": self.core.schedule.params}
            # (cli/train.py does this); inference uses the params frozen in
            # the schedule here.
            from diffndm_tpu.diffusion.learned_gamma import \
                make_learned_gamma

            assert d.loss_type == "vlb", \
                "a learned noise schedule requires the vlb objective"
            schedule = make_learned_gamma(d.timesteps, key)
        else:
            schedule = S.make_schedule(d.noise_schedule, d.timesteps,
                                       d.noise_precision)
            S.check_norm_values(schedule, d.norm_values[1])
        self.core = CondDiffusion(
            schedule, d, atom_nf=model_cfg.atom_nf,
            residue_nf=model_cfg.residue_nf,
            simple=(model_cfg.mode == "pocket_conditioning_simple"))

        hist = (size_histogram if size_histogram is not None
                else default_histogram())
        self.size_distribution = DistributionNodes(hist)

        self.oracle = RewardOracle(self.dataset_info)
        self.sampler = ConditionalSampler(
            self.core, self.module, self.params, self.sample_cfg,
            self.dataset_info, oracle=self.oracle)
        self.inpaint_sampler = InpaintSampler(
            self.core, self.module, self.params, self.sample_cfg,
            self.dataset_info, oracle=self.oracle)
        self.diversify_sampler = DiversifySampler(self.core, self.module,
                                                  self.params)
        self.joint_sampler = None
        if model_cfg.mode == "joint":
            from diffndm_tpu.diffusion.joint import (JointDiffusion,
                                                     JointSampler)

            joint_core = JointDiffusion(schedule, d,
                                        atom_nf=model_cfg.atom_nf,
                                        residue_nf=model_cfg.residue_nf)
            self.joint_sampler = JointSampler(joint_core, self.module,
                                              self.params)
        self.adjust_state: Optional[AdjustNetState] = None

    # -----------------------------------------------------------------
    @classmethod
    def from_yaml(cls, path: str, **kw) -> "DiffNDM":
        from diffndm_tpu.config import load_yaml

        return cls(model_config_from_yaml(load_yaml(path)), **kw)

    def set_params(self, params) -> None:
        params = to_default_device(params)
        self.params = params
        samplers = [self.sampler, self.inpaint_sampler,
                    self.diversify_sampler]
        if self.joint_sampler is not None:
            samplers.append(self.joint_sampler)
        for s in samplers:
            s.params = params

    def enable_banding(self, pocket: NodeBatch, margin: int = 16,
                       row_tile: int = 8) -> int:
        """Turn on sorted-band sparsity (models/banding.py) with a window
        chosen EXACTLY for this pocket: (window - row_tile)/2 must cover
        band_halfwidth_atoms(pocket, cutoff), so banding provably drops
        only pairs outside the edge cutoffs.  Returns the chosen window
        (0 = banding not worthwhile for this pocket).  The pocket is
        static for a whole sampling run, so one call before
        sample_given_pocket covers every step.  Params are reused; the
        dynamics module and samplers are rebuilt (param trees are
        identical with banding on or off)."""
        import dataclasses as dc

        from diffndm_tpu.models.banding import band_halfwidth_atoms

        eg = self.cfg.egnn
        cutoff = max(eg.edge_cutoff_pocket or 0.0,
                     eg.edge_cutoff_interaction or 0.0)
        if cutoff <= 0 or eg.neighbors is not None or eg.use_pallas:
            return 0
        hw = band_halfwidth_atoms(np.asarray(pocket.x),
                                  np.asarray(pocket.mask), cutoff)
        # smaller row tiles shrink the exact window (W >= 2*hw + tile);
        # row_tile 8 measured fastest with banding on v5e
        tile = min(row_tile or eg.row_tile, eg.row_tile)
        w = 2 * hw + tile + margin
        w = -(-w // 16) * 16
        # DIFFNDM_BAND_APPROX=W caps the window regardless of the exact
        # bound — an opt-in speed knob trading provable losslessness for
        # throughput (round-3 measured numbers in NOTES_NEXT_ROUND.md);
        # exact stays the default
        approx = int(os.environ.get("DIFFNDM_BAND_APPROX") or 0)
        if approx > 0:
            w = min(w, -(-approx // 16) * 16)
        np_total = pocket.x.shape[1]
        if w >= np_total:
            if eg.band_window is not None:
                # a previously-chosen (now too narrow) window must not
                # survive — fall back to dense for this pocket
                self.cfg = dc.replace(
                    self.cfg, egnn=dc.replace(eg, band_window=None))
                self._rebuild_samplers()
            return 0
        self.cfg = dc.replace(self.cfg,
                              egnn=dc.replace(eg, band_window=w,
                                              row_tile=tile))
        self._rebuild_samplers()
        return w

    def ensure_band_for(self, pocket: NodeBatch) -> int:
        """Exactness guard for banding across pockets: keep the current
        window when it already covers this pocket's halfwidth bound,
        widen (rebuild) when it does not, pick one when banding is off.
        Returns the active window (0 = dense)."""
        import dataclasses as dc

        from diffndm_tpu.models.banding import band_halfwidth_atoms

        eg = self.cfg.egnn
        current = eg.band_window
        if current is None:
            return self.enable_banding(pocket)
        cutoff = max(eg.edge_cutoff_pocket or 0.0,
                     eg.edge_cutoff_interaction or 0.0)
        hw = band_halfwidth_atoms(np.asarray(pocket.x),
                                  np.asarray(pocket.mask), cutoff)
        needed = 2 * hw + eg.row_tile
        if current >= needed:
            return current
        if needed >= pocket.x.shape[1]:  # banding not worthwhile here
            self.cfg = dc.replace(self.cfg,
                                  egnn=dc.replace(eg, band_window=None))
            self._rebuild_samplers()
            return 0
        return self.enable_banding(pocket, row_tile=eg.row_tile)

    def _rebuild_samplers(self) -> None:
        """Re-instantiate the dynamics module + samplers after a config
        change, keeping the current params (tree layout is config-
        independent)."""
        self.module = EGNNDynamics(self.cfg.egnn,
                                   atom_nf=self.cfg.atom_nf,
                                   residue_nf=self.cfg.residue_nf)
        self.sampler = ConditionalSampler(
            self.core, self.module, self.params, self.sample_cfg,
            self.dataset_info, oracle=self.oracle)
        self.inpaint_sampler = InpaintSampler(
            self.core, self.module, self.params, self.sample_cfg,
            self.dataset_info, oracle=self.oracle)
        self.diversify_sampler = DiversifySampler(self.core, self.module,
                                                  self.params)

    def ensure_adjust(self, rl_cfg: Optional[RLConfig] = None
                      ) -> AdjustNetState:
        if self.adjust_state is None:
            rl_cfg = rl_cfg or RLConfig(
                input_dim=3 + self.cfg.atom_nf)
            self.adjust_state = AdjustNetState(rl_cfg)
            self.sampler.adjust_module = self.adjust_state.module
        return self.adjust_state

    # -----------------------------------------------------------------
    def pocket_from_pdb(self, pdb_file: str, ref_ligand: str,
                        n_samples: int, dist_cutoff: float = 8.0
                        ) -> NodeBatch:
        """(lightning_modules.py:843-852 + prepare_pocket :763-801)"""
        structure = parse_pdb(pdb_file)
        residues = get_pocket_from_ligand(structure, ref_ligand,
                                          dist_cutoff)
        encoder = (self.dataset_info["aa_encoder"]
                   if self.cfg.pocket_representation == "CA"
                   else self.dataset_info["atom_encoder"])
        # drop padding type columns to match the model feature size
        enc = {k: v for k, v in encoder.items() if v < self.cfg.residue_nf}
        return prepare_pocket(residues, enc,
                              self.cfg.pocket_representation,
                              repeats=n_samples,
                              pad_multiple=self.sample_cfg.pocket_pad_multiple)

    def sample_ligand_sizes(self, key, pocket: NodeBatch) -> np.ndarray:
        """N_lig ~ p(N_lig | N_pocket) (lightning_modules.py:861-862)."""
        n_pocket = np.asarray(pocket.size).astype(int)
        n_pocket = np.clip(n_pocket, 0,
                           self.size_distribution.prob.shape[1] - 1)
        sizes = self.size_distribution.sample_conditional(
            key, n2=jnp.asarray(n_pocket))
        return np.maximum(np.asarray(sizes), 2)

    # -----------------------------------------------------------------
    def generate_ligands(self, pdb_file: str, n_samples: int,
                         ref_ligand: str, key=None,
                         timesteps: Optional[int] = None,
                         num_nodes_lig: Optional[np.ndarray] = None,
                         optimize: bool = False, train_rl: bool = False,
                         sanitize: bool = False, largest_frag: bool = False,
                         relax_iter: int = 0):
        """End-to-end generation for one pocket
        (lightning_modules.py:803-934). Returns a list of Molecules."""
        key = key if key is not None else jax.random.PRNGKey(0)
        k_size, k_sample = jax.random.split(key)
        pocket = self.pocket_from_pdb(pdb_file, ref_ligand, n_samples)
        # exact sorted-band sparsity by default (provably lossless window;
        # 115 -> 66 ms/step on the real 3rfm pocket); DIFFNDM_AUTO_BAND=0
        # opts out.  Revalidated per pocket: a sweep's later pocket may
        # need a wider window than the first one did.
        if os.environ.get("DIFFNDM_AUTO_BAND", "1") != "0":
            w = self.ensure_band_for(pocket)
            if w:
                print(f"[banding] window={w} pocket atoms="
                      f"{int(np.asarray(pocket.mask).sum(1).max())}")
        if num_nodes_lig is None:
            num_nodes_lig = self.sample_ligand_sizes(k_size, pocket)
        adjust_params = None
        if optimize or train_rl:
            adjust_params = self.ensure_adjust().params
        result = self.sampler.sample_given_pocket(
            k_sample, pocket, num_nodes_lig, timesteps=timesteps,
            adjust_params=adjust_params, optimize=optimize,
            collect_rl=train_rl)
        if train_rl:
            loss, gnorm, reward = self.sampler.rl_update(
                self.adjust_state, result, pocket)
        mols = self.result_to_molecules(result, sanitize=sanitize,
                                        largest_frag=largest_frag,
                                        relax_iter=relax_iter)
        return mols, result

    def generate_ligands_multi(self, pdb_refs: Sequence[tuple],
                               n_samples: int, key=None,
                               timesteps: Optional[int] = None,
                               sanitize: bool = False,
                               largest_frag: bool = False):
        """Batched generation for MANY pockets in one device batch: pockets
        are padded to a common bucket and stacked ([n_pockets * n_samples]
        samples), so one compiled sampler amortizes across the sweep.
        Returns {pocket_name: [molecules]}.

        The reference runs one subprocess per pocket (my_test.py:90); this
        replaces that pattern for production sweeps.
        """
        from diffndm_tpu.structs import concat_batches

        key = key if key is not None else jax.random.PRNGKey(0)
        pockets, names = [], []
        for pdb_file, ref_ligand in pdb_refs:
            pockets.append(self.pocket_from_pdb(pdb_file, ref_ligand,
                                                n_samples))
            names.append(os.path.basename(pdb_file))
        pocket = concat_batches(pockets)
        if os.environ.get("DIFFNDM_AUTO_BAND", "1") != "0":
            # per-sample principal-axis sorting makes banding valid for
            # heterogeneous pocket batches; the window covers the widest
            # pocket's halfwidth (band_halfwidth_atoms maxes over rows)
            self.ensure_band_for(pocket)
        k_size, k_sample = jax.random.split(key)
        sizes = self.sample_ligand_sizes(k_size, pocket)
        result = self.sampler.sample_given_pocket(
            k_sample, pocket, sizes, timesteps=timesteps)
        mols = self.result_to_molecules(result, sanitize=sanitize,
                                        largest_frag=largest_frag)
        out = {}
        for i, name in enumerate(names):
            out[name] = mols[i * n_samples:(i + 1) * n_samples]
        return out

    def result_to_molecules(self, result: SampleResult, sanitize=False,
                            largest_frag=False, relax_iter=0):
        mols = []
        for coords, types in to_lists(result.ligand):
            mol = build_molecule(coords, types, self.dataset_info)
            mol = process_molecule(mol, sanitize_flag=sanitize,
                                   relax_iter=relax_iter,
                                   largest_frag=largest_frag)
            mols.append(mol)
        return mols

    # -- checkpointing -------------------------------------------------
    def save_checkpoint(self, path: str) -> None:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path),
                   jax.device_get({"params": self.params}), force=True)
        ckptr.wait_until_finished()

    def load_checkpoint(self, path: str) -> None:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(
            os.path.abspath(path),
            jax.device_get({"params": self.params}))
        self.set_params(restored["params"])

    def load_reference_checkpoint(self, path: str) -> None:
        """Load a reference PyTorch-Lightning .ckpt (torch state dict)."""
        from diffndm_tpu.convert import load_reference_checkpoint

        self.set_params(load_reference_checkpoint(path, self.cfg,
                                                  self.params))
