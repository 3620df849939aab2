"""Configuration dataclasses.

The reference scatters hyperparameters across YAML configs
(configs/crossdock_fullatom_cond.yml), argparse flags and hard-coded
constants inside the sampler (conditional_model.py:764,1085,1243-1247).
Here everything — including every guidance hyperparameter — lives in typed,
serializable dataclasses.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Sequence


@dataclass(frozen=True)
class EGNNConfig:
    """EGNN denoiser, cf. reference egnn_params (crossdock_fullatom_cond.yml:36-51)."""
    joint_nf: int = 128
    hidden_nf: int = 256
    n_layers: int = 6
    inv_sublayers: int = 1
    attention: bool = True
    tanh: bool = True
    coords_range: float = 15.0
    norm_constant: float = 1.0
    sin_embedding: bool = False
    normalization_factor: float = 100.0
    aggregation_method: str = "sum"  # 'sum' | 'mean'
    reflection_equivariant: bool = False
    edge_cutoff_ligand: Optional[float] = None
    edge_cutoff_pocket: Optional[float] = 5.0
    edge_cutoff_interaction: Optional[float] = 5.0
    edge_embedding_dim: Optional[int] = None
    update_pocket_coords: bool = False  # conditional mode freezes the pocket
    condition_time: bool = True
    mode: str = "egnn_dynamics"  # 'egnn_dynamics' | 'gnn_dynamics'
    # TPU-specific: nodes processed per message-passing row tile.
    row_tile: int = 64
    # Fully unroll the row-tile scans (lax.scan(unroll=True)).  Runtime
    # default is the rolled loop (compiles fast, identical math); the
    # FLOPs counter (utils/flops.py) sets this because XLA's cost model
    # counts a While body once, so only an unrolled lowering yields the
    # true per-forward FLOP count.
    scan_unroll: bool = False
    # Rematerialize each EquivariantBlock in the backward pass
    # (jax.checkpoint): activations of the [B, N, N, hidden] edge tensors
    # are recomputed instead of stored, cutting training-step HBM from
    # O(n_layers * N^2 * hidden) to O(N^2 * hidden).  Forward-only cost:
    # none; training cost: ~1 extra forward per block.
    remat: bool = False
    compute_dtype: str = "float32"  # 'float32' | 'bfloat16'
    # Fused Pallas message-passing kernels (ops/pallas_egnn.py): the whole
    # edge chain (first-layer add + silu + hidden matmul + attention +
    # masked reduce) stays in VMEM per (row, col) tile instead of
    # round-tripping [B, T, N, H] activations through HBM.  Requires the
    # dense column provider, scalar edge features (no sin embedding, no
    # edge-type embedding) and 'sum' aggregation; other configurations
    # silently fall back to the XLA row-tiled path.
    use_pallas: bool = False
    pallas_row_tile: int = 16
    pallas_col_tile: int = 128
    pallas_interpret: bool = False  # CPU-testable interpret mode
    # Fixed-K nearest-neighbour lists instead of dense N columns (exact as
    # long as every node has <= K edges under the cutoffs); None = dense.
    neighbors: Optional[int] = None
    # Sorted-band sparsity (models/banding.py): pocket nodes sorted along
    # their principal axis; pocket-row tiles see [ligand block + this many
    # contiguous sorted-pocket columns] instead of all N columns.  EXACT
    # when (band_window - row_tile)/2 >= banding.band_halfwidth_atoms(
    # pocket, cutoff) — the 1-D projection bound guarantees every pair
    # within the cutoff stays inside the window.  None = off.  Mutually
    # exclusive with `neighbors` and the Pallas path.
    band_window: Optional[int] = None


@dataclass(frozen=True)
class DiffusionConfig:
    """cf. reference diffusion_params (crossdock_fullatom_cond.yml:53-58)."""
    timesteps: int = 500
    noise_schedule: str = "polynomial_2"  # 'polynomial_P' | 'cosine' | 'learned'
    noise_precision: float = 5.0e-4
    loss_type: str = "l2"  # 'l2' | 'vlb'
    norm_values: Sequence[float] = (1.0, 4.0)
    norm_biases: Sequence[float] = (0.0, 0.0)
    virtual_node_idx: Optional[int] = None


@dataclass(frozen=True)
class SPSAConfig:
    """Zero-order SPSA guidance (reference conditional_model.py:723-843,
    schedule constants at :1243-1247)."""
    enabled: bool = False
    num_probes: int = 10           # k perturbation pairs averaged (:764)
    start_step: int = 30           # active for s <= start_step (:1243)
    every: int = 2                 # ... at s % every == 0
    zeta0: float = 1e-3            # zeta = zeta0 * s / zeta_denom (:1245)
    zeta_denom: float = 500.0
    guidance_scale: float = 1e-3   # gradient-ascent step (:1247)
    # reward weights (my_reward_for_SPSA, :835-841): 2*QED + 3*SA + Lip/5
    w_qed: float = 2.0
    w_sa: float = 3.0
    w_lipinski: float = 0.2
    # OPTIONAL affinity term (beyond the reference): reward +=
    # w_vina * (-VinaScorer.score) when the oracle has a receptor
    # (RewardOracle.set_receptor); 0 = reference behaviour
    w_vina: float = 0.0
    # OPTIONAL connectivity term (beyond the reference): reward +=
    # w_connectivity * largest_fragment_fraction — steers SPSA ascent /
    # ATP selection toward single-fragment molecules (guided sampling
    # otherwise trades connectivity for QED/SA, which the reference's
    # largest-fragment eval protocol never penalises); 0 = reference
    w_connectivity: float = 0.0
    # one-off hybrid branch-ensemble + prune at s == start_step
    # (conditional_model.py:1261-1418)
    hybrid_prune: bool = True
    # Batch all k probes into ONE denoiser forward of batch k*2B (and one
    # reward callback) instead of k sequential 2B forwards under lax.map.
    # Identical math (perturbations come from the same per-probe keys);
    # bigger matmuls feed the MXU better.  False restores the sequential
    # memory-bounded path.
    fuse_probes: bool = True


@dataclass(frozen=True)
class ATPConfig:
    """Adaptive trajectory pruning / SVDD-style candidate selection
    (reference conditional_model.py:1085-1241)."""
    enabled: bool = False
    num_groups: int = 5            # 1 current + 4 resampled branches (:1109)
    start_step: int = 50           # active for s <= start_step (:1085)
    every: int = 10                # ... at s % every == 0
    # mixed reward r = r_x0 * (s/mix_denom) + r_z * mix_z_weight(s); the
    # reference computes the second factor as (250 - s/250) due to an
    # operator-precedence quirk (:1203).  compat_precedence=True reproduces
    # that behaviour; False uses the presumably-intended (250-s)/250.
    mix_denom: float = 250.0
    compat_precedence: bool = True
    # Selection scope.  False (reference semantics, conditional_model.py:1205)
    # runs ONE top-B over all G*B candidates — population-level selection that
    # can keep several descendants of a good sample and drop a bad sample
    # entirely; per-row state (masks, pocket identity) is gathered along.
    # True selects the best of the G branches independently per batch row —
    # required for multi-pocket batches, where global selection would move
    # ligands between pockets.
    per_sample: bool = False
    # Rows form contiguous groups of this size sharing one pocket
    # (pockets*samples layout): top-group_size selection runs within each
    # group — the reference's population selection applied per pocket.
    group_size: Optional[int] = None
    # reward weights (my_reward_for_SVDD, :644-650):
    # 2*QED + 2*SA + sigmoid-window(LogP, k, [lo, hi]) + Lip/5
    w_qed: float = 2.0
    w_sa: float = 2.0
    w_lipinski: float = 0.2
    w_vina: float = 0.0  # optional affinity term, see SPSAConfig.w_vina
    # optional connectivity term, see SPSAConfig.w_connectivity
    w_connectivity: float = 0.0
    logp_k: float = 20.0
    logp_lo: float = -1.0
    logp_hi: float = 5.0


@dataclass(frozen=True)
class RLConfig:
    """AdjustNet noise-adjustment policy (reference conditional_model.py:26-41,
    :503-540, :1447-1485)."""
    enabled: bool = False          # 'optimize' flag: add adjustment to eps
    train: bool = False            # run the REINFORCE update after sampling
    input_dim: int = 13            # 3 coords + atom_nf
    hidden_dim: int = 128
    lr: float = 1e-3
    reward_scale: float = 0.1      # REINFORCE loss scale (:1468)
    # final reward weights (my_reward_function, :614-619): mean of
    # 6*QED + 2*SA + Lip/5
    w_qed: float = 6.0
    w_sa: float = 2.0
    w_lipinski: float = 0.2


@dataclass(frozen=True)
class InpaintConfig:
    """RePaint-style inpainting (reference conditional_model.py:1491-1791)."""
    resamplings: int = 1
    jump_length: int = 1
    center: str = "ligand"  # 'ligand' | 'pocket'
    # SPSA hook window inside inpainting (:1573-1586)
    spsa_low: int = 12
    spsa_high: int = 16
    spsa_zeta_denom: float = 1200.0
    # ATP hook cadence inside inpainting (:1629)
    atp_start_step: int = 10
    atp_every: int = 2


@dataclass(frozen=True)
class ModelConfig:
    dataset: str = "crossdock_full"
    mode: str = "pocket_conditioning"  # 'joint'|'pocket_conditioning'|'pocket_conditioning_simple'
    pocket_representation: str = "full-atom"  # 'CA' | 'full-atom'
    atom_nf: int = 10
    residue_nf: int = 10
    n_dims: int = 3
    egnn: EGNNConfig = field(default_factory=EGNNConfig)
    diffusion: DiffusionConfig = field(default_factory=DiffusionConfig)


@dataclass(frozen=True)
class SampleConfig:
    n_samples: int = 20
    timesteps: Optional[int] = None  # default: diffusion.timesteps
    spsa: SPSAConfig = field(default_factory=SPSAConfig)
    atp: ATPConfig = field(default_factory=ATPConfig)
    rl: RLConfig = field(default_factory=RLConfig)
    inpaint: InpaintConfig = field(default_factory=InpaintConfig)
    sanitize: bool = False
    relax_iter: int = 0
    largest_frag: bool = False
    # OPTIONAL low-temperature sampling (beyond the reference): scales
    # the noise injected at every REVERSE step (trajectory, ATP/hybrid
    # candidate branches) while keeping the posterior mean and all
    # forward/re-noising steps exact.  < 1.0 trades sample diversity for
    # typicality (often higher validity/QED); 1.0 = reference parity.
    noise_scale: float = 1.0
    # row_tile override for the guidance fan-out forwards (SPSA k*2B
    # probe batches, ATP/hybrid candidate rollouts) in the
    # host-orchestrated sampler.  The big fused batches prefer a wider
    # row tile than the B-sized trajectory steps (measured on v5e,
    # 3rfm, band 128: k*2B=400 probe forward 1437 ms at row_tile 8 vs
    # 1356 ms at 16).  None = inherit the module's row_tile.
    fanout_row_tile: Optional[int] = None
    # padding buckets
    lig_pad_multiple: int = 8
    pocket_pad_multiple: int = 64


@dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-3
    weight_decay: float = 1e-12
    amsgrad: bool = True
    batch_size: int = 16
    n_epochs: int = 1000
    clip_grad: bool = True
    accumulate_grad_batches: int = 4
    auxiliary_loss: bool = False
    aux_max_weight: float = 1e-3
    aux_schedule: str = "linear"
    aux_clamp_lj: float = 3.0
    eval_epochs: int = 50
    seed: int = 0
    # exponential moving average of the weights; 0 disables.  The
    # reference has no EMA (lightning_modules.py keeps raw weights) but
    # sampling from EMA weights is the standard diffusion-quality lever
    # and is what the eval/"best" checkpoints should carry.
    ema_decay: float = 0.0


def asdict(cfg) -> dict:
    return dataclasses.asdict(cfg)


def load_yaml(path: str) -> dict:
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)


def model_config_from_yaml(raw: dict) -> ModelConfig:
    """Build a ModelConfig from a reference-style YAML dict (train.py:26-50
    equivalent), so the reference's configs keep working."""
    eg = raw.get("egnn_params", {})
    di = raw.get("diffusion_params", {})
    egnn = EGNNConfig(
        joint_nf=eg.get("joint_nf", 128),
        hidden_nf=eg.get("hidden_nf", 256),
        n_layers=eg.get("n_layers", 6),
        inv_sublayers=eg.get("inv_sublayers", 1),
        attention=eg.get("attention", True),
        tanh=eg.get("tanh", True),
        norm_constant=eg.get("norm_constant", 1.0),
        sin_embedding=eg.get("sin_embedding", False),
        normalization_factor=eg.get("normalization_factor", 100.0),
        aggregation_method=eg.get("aggregation_method", "sum"),
        reflection_equivariant=eg.get("reflection_equivariant", False),
        edge_cutoff_ligand=eg.get("edge_cutoff_ligand"),
        edge_cutoff_pocket=eg.get("edge_cutoff_pocket"),
        edge_cutoff_interaction=eg.get("edge_cutoff_interaction"),
        edge_embedding_dim=eg.get("edge_embedding_dim"),
        update_pocket_coords=raw.get("mode", "pocket_conditioning") == "joint",
        remat=eg.get("remat", False),
    )
    diffusion = DiffusionConfig(
        timesteps=di.get("diffusion_steps", 500),
        noise_schedule=di.get("diffusion_noise_schedule", "polynomial_2"),
        noise_precision=di.get("diffusion_noise_precision", 5e-4),
        loss_type=di.get("diffusion_loss_type", "l2"),
        norm_values=tuple(di.get("normalize_factors", (1.0, 4.0))),
    )
    dataset = raw.get("dataset", "crossdock")
    if raw.get("pocket_representation", "full-atom") == "full-atom" and \
            dataset == "crossdock":
        dataset = "crossdock_full"
    from diffndm_tpu.constants import dataset_params

    params = dataset_params[dataset]
    # The reference drops the 11th 'others' one-hot column at train time to
    # match the 10-type checkpoint (lightning_modules.py:264-272); mirror
    # that by sizing the feature dims to the non-pad type count.
    nf = len(params["atom_decoder"]) - params["_pad_types"]
    return ModelConfig(
        dataset=dataset,
        mode=raw.get("mode", "pocket_conditioning"),
        pocket_representation=raw.get("pocket_representation", "full-atom"),
        atom_nf=nf,
        residue_nf=(nf if raw.get("pocket_representation") == "full-atom"
                    else len(params["aa_decoder"])),
        egnn=egnn,
        diffusion=diffusion,
    )
