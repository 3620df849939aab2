"""Host-orchestrated guided sampling (the no-io_callback runtime path)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffndm_tpu.config import (ATPConfig, DiffusionConfig, EGNNConfig,
                                SampleConfig, SPSAConfig)
from diffndm_tpu.constants import dataset_params
from diffndm_tpu.diffusion import schedules as S
from diffndm_tpu.diffusion.core import CondDiffusion
from diffndm_tpu.diffusion.sampler import ConditionalSampler
from diffndm_tpu.models.dynamics import EGNNDynamics
from diffndm_tpu.structs import NodeBatch

ATOM_NF = 10
T = 10
B, NL, NP = 2, 8, 16
DP = dataset_params["crossdock_full"]


@pytest.fixture(scope="module")
def setup():
    cfg = EGNNConfig(hidden_nf=16, joint_nf=8, n_layers=1, row_tile=16,
                     attention=False, reflection_equivariant=True)
    module = EGNNDynamics(cfg, atom_nf=ATOM_NF, residue_nf=ATOM_NF)
    key = jax.random.PRNGKey(0)
    params = module.init(key, jnp.zeros((1, NL, 13)),
                         jnp.zeros((1, NP, 13)), jnp.zeros((1,)),
                         jnp.ones((1, NL)), jnp.ones((1, NP)))
    core = CondDiffusion(S.make_schedule("polynomial_2", T, 5e-4),
                         DiffusionConfig(timesteps=T), ATOM_NF, ATOM_NF)
    pocket = NodeBatch(
        x=jax.random.normal(key, (B, NP, 3)) * 2 + 8,
        h=jax.nn.one_hot(jax.random.randint(key, (B, NP), 0, 4), ATOM_NF),
        mask=jnp.ones((B, NP)))
    return core, module, params, pocket


def run_host(setup, sample_cfg, **kw):
    core, module, params, pocket = setup
    sampler = ConditionalSampler(core, module, params, sample_cfg, DP)
    os.environ["DIFFNDM_HOST_GUIDANCE"] = "1"
    try:
        return sampler.sample_given_pocket(jax.random.PRNGKey(5), pocket,
                                           np.array([5, 7]), **kw)
    finally:
        os.environ.pop("DIFFNDM_HOST_GUIDANCE", None)


def test_host_guided_spsa_atp(setup):
    cfg = SampleConfig(
        spsa=SPSAConfig(enabled=True, num_probes=2, start_step=4, every=2),
        atp=ATPConfig(enabled=True, num_groups=3, start_step=6, every=3))
    res = run_host(setup, cfg)
    assert np.all(np.isfinite(np.asarray(res.ligand.x)))
    hs = np.asarray(res.ligand.h).sum(-1) * np.asarray(res.ligand.mask)
    np.testing.assert_allclose(hs, np.asarray(res.ligand.mask), atol=1e-6)


def test_host_matches_fused_with_guidance(setup):
    """Position-based RNG derivation (fold_in(run_key, s)) makes the fused
    io_callback scan and the host-orchestrated event loop derive IDENTICAL
    keys; with the same oracle both modes must produce the same guided
    samples (small tolerance: XLA fuses the two programs differently)."""
    core, module, params, pocket = setup
    cfg = SampleConfig(
        spsa=SPSAConfig(enabled=True, num_probes=2, start_step=4, every=2),
        atp=ATPConfig(enabled=True, num_groups=3, start_step=6, every=3))
    num_nodes = np.array([5, 7])

    fused = ConditionalSampler(core, module, params, cfg, DP)
    r1 = fused.sample_given_pocket(jax.random.PRNGKey(7), pocket, num_nodes)

    host = ConditionalSampler(core, module, params, cfg, DP)
    os.environ["DIFFNDM_HOST_GUIDANCE"] = "1"
    try:
        r2 = host.sample_given_pocket(jax.random.PRNGKey(7), pocket,
                                      num_nodes)
    finally:
        os.environ.pop("DIFFNDM_HOST_GUIDANCE", None)

    np.testing.assert_array_equal(np.asarray(r1.ligand.mask),
                                  np.asarray(r2.ligand.mask))
    np.testing.assert_allclose(np.asarray(r1.ligand.x),
                               np.asarray(r2.ligand.x), atol=5e-4)
    np.testing.assert_array_equal(np.asarray(r1.ligand.h),
                                  np.asarray(r2.ligand.h))


def test_host_matches_fused_without_guidance_structure(setup):
    """Unguided: host mode falls through to the fused scan (identical
    results for the same key)."""
    core, module, params, pocket = setup
    sampler = ConditionalSampler(core, module, params, SampleConfig(), DP)
    r1 = sampler.sample_given_pocket(jax.random.PRNGKey(6), pocket,
                                     np.array([5, 7]))
    os.environ["DIFFNDM_HOST_GUIDANCE"] = "1"
    try:
        r2 = sampler.sample_given_pocket(jax.random.PRNGKey(6), pocket,
                                         np.array([5, 7]))
    finally:
        os.environ.pop("DIFFNDM_HOST_GUIDANCE", None)
    np.testing.assert_allclose(np.asarray(r1.ligand.x),
                               np.asarray(r2.ligand.x), atol=1e-5)


def test_fanout_row_tile_matches_default(setup):
    """SampleConfig.fanout_row_tile re-tiles only the guidance fan-out
    forwards (SPSA probes, ATP candidates); each row's banded reduction
    set is unchanged, so guided samples must match the default run."""
    base = SampleConfig(
        spsa=SPSAConfig(enabled=True, num_probes=2, start_step=4, every=2),
        atp=ATPConfig(enabled=True, num_groups=3, start_step=6, every=3))
    r1 = run_host(setup, base)
    import dataclasses as dc
    r2 = run_host(setup, dc.replace(base, fanout_row_tile=8))
    np.testing.assert_array_equal(np.asarray(r1.ligand.mask),
                                  np.asarray(r2.ligand.mask))
    np.testing.assert_allclose(np.asarray(r1.ligand.x),
                               np.asarray(r2.ligand.x), atol=5e-4)
    np.testing.assert_array_equal(np.asarray(r1.ligand.h),
                                  np.asarray(r2.ligand.h))


def test_fanout_row_tile_banded_exact_preserves_results():
    """In banded mode the window is centred per row tile, so a larger
    fan-out tile alone would shrink guaranteed per-row coverage;
    _fanout_eps_fn widens the window by the tile delta to compensate.
    With an exactness-satisfying window for BOTH (tile, window) pairs,
    the guided samples must be identical to the default run."""
    import dataclasses as dc

    nl, npk = 8, 64
    cfg = EGNNConfig(hidden_nf=16, joint_nf=8, n_layers=1, row_tile=8,
                     attention=False, reflection_equivariant=True,
                     edge_cutoff_pocket=5.0, edge_cutoff_interaction=5.0,
                     band_window=48)
    module = EGNNDynamics(cfg, atom_nf=ATOM_NF, residue_nf=ATOM_NF)
    key = jax.random.PRNGKey(3)
    params = module.init(key, jnp.zeros((1, nl, 13)),
                         jnp.zeros((1, npk, 13)), jnp.zeros((1,)),
                         jnp.ones((1, nl)), jnp.ones((1, npk)))
    core = CondDiffusion(S.make_schedule("polynomial_2", T, 5e-4),
                         DiffusionConfig(timesteps=T), ATOM_NF, ATOM_NF)
    # a thin elongated pocket: small sorted-band half-width, so both
    # (48, tile 8) and the widened (56, tile 16) windows are exact
    zline = jnp.linspace(0.0, 2.0 * npk, npk)[None, :, None]
    jitter = jax.random.normal(key, (1, npk, 3)) * 0.5
    x = jnp.concatenate([jitter[..., :2],
                         zline + jitter[..., 2:]], -1) + 4.0
    pocket = NodeBatch(
        x=jnp.broadcast_to(x, (2, npk, 3)),
        h=jnp.broadcast_to(
            jax.nn.one_hot(jax.random.randint(key, (1, npk), 0, 4),
                           ATOM_NF), (2, npk, ATOM_NF)),
        mask=jnp.ones((2, npk)))
    from diffndm_tpu.models.banding import band_halfwidth_atoms
    hw = band_halfwidth_atoms(np.asarray(pocket.x[:1]),
                              np.asarray(pocket.mask[:1]), 5.0)
    assert 48 >= 2 * hw + 8 and 56 >= 2 * hw + 16, hw

    base = SampleConfig(
        spsa=SPSAConfig(enabled=True, num_probes=2, start_step=4, every=2),
        atp=ATPConfig(enabled=True, num_groups=3, start_step=6, every=3))
    setup = (core, module, params, pocket)
    r1 = run_host(setup, base)
    r2 = run_host(setup, dc.replace(base, fanout_row_tile=16))
    np.testing.assert_allclose(np.asarray(r1.ligand.x),
                               np.asarray(r2.ligand.x), atol=5e-4)
    np.testing.assert_array_equal(np.asarray(r1.ligand.h),
                                  np.asarray(r2.ligand.h))
