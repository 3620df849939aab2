"""Semantic correctness of the guidance math, driven by mock oracles:

- candidate selection + per-row state gathering (the mask-consistency
  contract of atp.gather_selected) under heterogeneous ligand sizes;
- ATP pruning may never decrease the population's mixed reward (the
  original population is always among the candidates);
- SPSA must *increase* the oracle reward it ascends (measured on the same
  x0 decode the oracle scores), not merely move;
- the mixed-reward weighting must follow the configured precedence mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffndm_tpu.config import (ATPConfig, DiffusionConfig, EGNNConfig,
                                SampleConfig, SPSAConfig)
from diffndm_tpu.constants import dataset_params
from diffndm_tpu.diffusion import schedules as S
from diffndm_tpu.diffusion.core import CondDiffusion
from diffndm_tpu.guidance.atp import (atp_prune, gather_selected,
                                      select_candidates)
from diffndm_tpu.guidance.spsa import spsa_update
from diffndm_tpu.models.dynamics import EGNNDynamics

ATOM_NF = 10
T = 10
B, NL, NP = 3, 8, 12
DP = dataset_params["crossdock_full"]


class MockOracle:
    """Deterministic reward = negative mean squared distance of real atoms
    from a target point (higher reward closer to target)."""

    def __init__(self, target=(1.0, 2.0, -1.0)):
        self.target = np.asarray(target, np.float32)
        self.calls = 0

    def _host(self, c, hh, m):
        self.calls += 1
        c = np.asarray(c)
        m = np.asarray(m)
        d2 = ((c - self.target) ** 2).sum(-1)
        d2 = (d2 * m).sum(-1) / np.maximum(m.sum(-1), 1)
        return (-d2).astype(np.float32)

    def _score(self, coords, h, mask):
        from jax.experimental import io_callback

        return io_callback(self._host,
                           jax.ShapeDtypeStruct((coords.shape[0],),
                                                jnp.float32),
                           coords, h, mask, ordered=False)

    def svdd_rewards(self, coords, h, mask, cfg):
        return self._score(coords, h, mask)

    def spsa_rewards(self, coords, h, mask, cfg):
        return self._score(coords, h, mask)


class CompactOracle(MockOracle):
    """Translation-invariant reward = negative mean squared deviation from
    the molecule's own COM; invariant to the COM re-projection inside
    gather_selected, so rewards can be re-measured on its outputs."""

    def _host(self, c, hh, m):
        self.calls += 1
        c = np.asarray(c)
        m = np.asarray(m)[..., None]
        com = (c * m).sum(-2, keepdims=True) / np.maximum(m.sum(-2,
                                                                keepdims=True),
                                                          1)
        d2 = (((c - com) ** 2).sum(-1) * m[..., 0])
        return (-(d2.sum(-1) / np.maximum(m[..., 0].sum(-1), 1))
                ).astype(np.float32)


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

    def eps_fn(z, xh_p, t, lm, pm):
        return module.apply(params, z, xh_p, t, lm, pm)

    key = jax.random.PRNGKey(1)
    z = jax.random.normal(key, (B, NL, 3 + ATOM_NF))
    xh_p = jax.random.normal(key, (B, NP, 3 + ATOM_NF))
    lm, pm = jnp.ones((B, NL)), jnp.ones((B, NP))
    return core, eps_fn, z, xh_p, lm, pm


# ---------------------------------------------------------------------------
# selection + gathering unit tests
# ---------------------------------------------------------------------------

def _hetero_masks():
    counts_l, counts_p = (2, 4, 6), (3, 5, 8)
    lm = (np.arange(NL)[None, :] < np.array(counts_l)[:, None]
          ).astype(np.float32)
    pm = (np.arange(NP)[None, :] < np.array(counts_p)[:, None]
          ).astype(np.float32)
    return jnp.asarray(lm), jnp.asarray(pm)


def test_global_selection_gathers_origin_masks(setup):
    """A candidate selected into output row j must carry its ORIGIN row's
    masks (conditional_model.py:1209-1232 rebuilds them per candidate);
    using row j's masks silently truncates/extends the ligand."""
    core = setup[0]
    lm, pm = _hetero_masks()
    g = 2
    rng = np.random.default_rng(0)
    z_flat = jnp.asarray(rng.normal(size=(g * B, NL, 3 + ATOM_NF)),
                         jnp.float32)
    xh_flat = jnp.asarray(rng.normal(size=(g * B, NP, 3 + ATOM_NF)),
                          jnp.float32)
    # force cross-row selection: best three are flat 3 (g1,row0),
    # 1 (g0,row1), 5 (g1,row2)
    rewards = jnp.asarray([0.1, 0.8, 0.2, 0.9, 0.0, 0.7])
    cfg = ATPConfig(per_sample=False)
    sel = select_candidates(rewards, cfg, B)
    assert sorted(np.asarray(sel).tolist()) == [1, 3, 5]
    z_new, xh_new, lm_new, pm_new = gather_selected(
        sel, z_flat, xh_flat, lm, pm, core)
    for j, flat_idx in enumerate(np.asarray(sel)):
        origin = flat_idx % B
        np.testing.assert_array_equal(np.asarray(lm_new[j]),
                                      np.asarray(lm[origin]))
        np.testing.assert_array_equal(np.asarray(pm_new[j]),
                                      np.asarray(pm[origin]))
        # feature channels are not COM-projected: must match the candidate
        np.testing.assert_allclose(
            np.asarray(z_new[j, :, 3:]),
            np.asarray(z_flat[flat_idx, :, 3:]
                       * lm[origin][:, None]), atol=1e-6)


def test_group_selection_stays_within_pocket_groups():
    """group_size restricts the population top-k to each pocket's rows:
    candidates never cross pocket groups, but CAN replicate within one."""
    b, g, gs = 4, 2, 2  # 2 pockets x 2 samples, 2 groups of candidates
    # flat index = g_i * b + row; rewards chosen so the global top-4 would
    # all come from pocket group 0
    rewards = jnp.asarray([9.0, 8.0, 1.0, 0.0,   # g=0, rows 0..3
                           7.0, 6.0, 2.0, 0.5])  # g=1, rows 0..3
    cfg = ATPConfig(group_size=gs)
    sel = np.asarray(select_candidates(rewards, cfg, b))
    rows = sel % b
    # output rows 0..1 must come from pocket 0's rows {0,1}, rows 2..3
    # from pocket 1's rows {2,3}
    assert set(rows[:gs]) <= {0, 1}, rows
    assert set(rows[gs:]) <= {2, 3}, rows
    # pocket 1's best two are (g0,row2)=1.0 and (g1,row2)=2.0 -> row 2
    # replicated, row 3 dropped (population selection within the pocket)
    assert sorted(rows[gs:].tolist()) == [2, 2]


def test_per_sample_selection_keeps_rows(setup):
    core = setup[0]
    lm, pm = _hetero_masks()
    g = 3
    rewards = jnp.asarray(np.arange(g * B, dtype=np.float32))  # best: g=2
    cfg = ATPConfig(per_sample=True)
    sel = select_candidates(rewards, cfg, B)
    np.testing.assert_array_equal(np.asarray(sel), [2 * B, 2 * B + 1,
                                                    2 * B + 2])
    rng = np.random.default_rng(1)
    z_flat = jnp.asarray(rng.normal(size=(g * B, NL, 3 + ATOM_NF)),
                         jnp.float32)
    xh_flat = jnp.asarray(rng.normal(size=(g * B, NP, 3 + ATOM_NF)),
                          jnp.float32)
    _, _, lm_new, pm_new = gather_selected(sel, z_flat, xh_flat, lm, pm,
                                           core)
    np.testing.assert_array_equal(np.asarray(lm_new), np.asarray(lm))
    np.testing.assert_array_equal(np.asarray(pm_new), np.asarray(pm))


# ---------------------------------------------------------------------------
# ATP pruning: population reward must not decrease
# ---------------------------------------------------------------------------

def _mixed_reward_of(core, eps_fn, oracle, z, xh_p, lm, pm, t_norm, s_step,
                     cfg):
    """Re-measure the exact mixed reward atp_prune optimizes."""
    nx = core.cfg.norm_values[0]
    z0 = core.to_x0(z, xh_p, jnp.asarray(t_norm), lm, pm, eps_fn)
    r_z = np.asarray(oracle.svdd_rewards(z[..., :3] * nx, z[..., 3:], lm,
                                         cfg))
    r_x0 = np.asarray(oracle.svdd_rewards(z0[..., :3] * nx, z0[..., 3:],
                                          lm, cfg))
    s = float(s_step)
    if cfg.compat_precedence:
        w_z = cfg.mix_denom - s / cfg.mix_denom
    else:
        w_z = (cfg.mix_denom - s) / cfg.mix_denom
    return r_x0 * (s / cfg.mix_denom) + r_z * w_z


@pytest.mark.parametrize("per_sample", [False, True])
def test_atp_never_worsens_population(setup, per_sample):
    """The current population is always among the candidates, so selection
    (global top-B or per-row argmax) can only improve the mixed reward.
    CompactOracle is translation-invariant, so the COM re-projection in
    gather_selected does not perturb the re-measured reward."""
    core, eps_fn, z, xh_p, lm, pm = setup
    oracle = CompactOracle()
    cfg = ATPConfig(enabled=True, num_groups=4, per_sample=per_sample)
    s_norm, t_norm, s_step = 0.3, 0.4, 3
    before = _mixed_reward_of(core, eps_fn, oracle, z, xh_p, lm, pm,
                              t_norm, s_step, cfg)
    z_new, xh_new, lm_new, pm_new, sel = atp_prune(
        jax.random.PRNGKey(2), core, eps_fn, oracle, z, xh_p, lm, pm,
        s_norm, t_norm, jnp.asarray(s_step), cfg)
    after = _mixed_reward_of(core, eps_fn, oracle, z_new, xh_new, lm_new,
                             pm_new, t_norm, s_step, cfg)
    if per_sample:
        # row identity is preserved: every row must be >= its own previous
        assert np.all(after >= before - 1e-3), (before, after)
        np.testing.assert_array_equal(np.asarray(lm_new), np.asarray(lm))
    else:
        # population-level: the selected set beats the original set
        assert after.mean() >= before.mean() - 1e-3, (before, after)
    assert oracle.calls >= 2


def test_atp_keeps_planted_optimum(setup):
    """When one candidate is planted exactly at the oracle's optimum, the
    global selection must include it."""
    core = setup[0]
    lm, pm = _hetero_masks()
    g = 2
    rng = np.random.default_rng(3)
    z_flat = np.asarray(rng.normal(size=(g * B, NL, 3 + ATOM_NF)),
                        np.float32) * 5
    # plant candidate (g=1, row=1): all real atoms exactly at the target
    target = np.array([1.0, 2.0, -1.0], np.float32)
    planted = B + 1
    z_flat[planted, :, :3] = target
    oracle = MockOracle(target=tuple(target))
    lm_f = jnp.tile(lm, (g, 1))
    rewards = np.asarray(oracle.svdd_rewards(
        jnp.asarray(z_flat[..., :3]), jnp.asarray(z_flat[..., 3:]), lm_f,
        None))
    sel = select_candidates(jnp.asarray(rewards), ATPConfig(), B)
    assert planted in np.asarray(sel).tolist()


# ---------------------------------------------------------------------------
# SPSA: must increase the reward it ascends
# ---------------------------------------------------------------------------

def test_spsa_increases_reward(setup):
    """SPSA ascends oracle(x0(z)); with enough probes the realized update
    must increase that exact quantity (averaged over seeds)."""
    core, eps_fn, z, xh_p, lm, pm = setup
    target = (0.5, -0.5, 1.0)
    oracle = MockOracle(target=target)
    cfg = SPSAConfig(enabled=True, num_probes=24, guidance_scale=2e-2)
    t_norm = 0.4
    nx = core.cfg.norm_values[0]

    # centre the input ligand COM (sampler invariant)
    zx = z[..., :3] - z[..., :3].mean(axis=1, keepdims=True)
    z = jnp.concatenate([zx, z[..., 3:]], -1)

    def reward_of(zz):
        z0 = core.to_x0(zz, xh_p, jnp.asarray(t_norm), lm, pm, eps_fn)
        return float(np.asarray(oracle.svdd_rewards(
            z0[..., :3] * nx, z0[..., 3:], lm, None)).mean())

    before = reward_of(z)
    deltas = []
    for seed in range(3):
        z_new, _ = spsa_update(jax.random.PRNGKey(10 + seed), core, eps_fn,
                               oracle, z, xh_p, lm, pm, t_norm, 0.05, cfg)
        d = np.asarray(z_new[..., :3] - z[..., :3])
        assert np.isfinite(d).all()
        assert np.abs(d.sum(axis=1)).max() < 1e-4  # COM-free update
        deltas.append(reward_of(z_new) - before)
    deltas = np.asarray(deltas)
    # the realized ascent direction must actually go uphill
    assert deltas.mean() > 0, deltas
    assert (deltas > 0).sum() >= 2, deltas


# ---------------------------------------------------------------------------
# mixed-reward precedence
# ---------------------------------------------------------------------------

def test_mixed_reward_precedence():
    from diffndm_tpu.diffusion.host_guided import HostGuidedSampler

    class Dummy(HostGuidedSampler):
        def __init__(self, cfg):
            self.cfg = cfg

    s = 40.0
    r_x0, r_z = np.asarray([1.0]), np.asarray([2.0])
    compat = Dummy(SampleConfig(atp=ATPConfig(compat_precedence=True)))
    sane = Dummy(SampleConfig(atp=ATPConfig(compat_precedence=False)))
    m_compat = compat._mixed_reward(r_x0, r_z, s)
    m_sane = sane._mixed_reward(r_x0, r_z, s)
    # reference quirk: (250 - s/250) ~ 249.8 vs intended (250-s)/250 = 0.84
    assert m_compat[0] > 100
    assert 0 < m_sane[0] < 5


def test_fused_probes_match_sequential():
    """SPSAConfig.fuse_probes=True (one k*2B forward) must produce the
    same guidance update as the sequential lax.map path — identical
    per-probe keys, same math, only the batching differs."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffndm_tpu.config import (DiffusionConfig, EGNNConfig,
                                    SPSAConfig)
    from diffndm_tpu.constants import dataset_params
    from diffndm_tpu.diffusion import schedules as S
    from diffndm_tpu.diffusion.core import CondDiffusion
    from diffndm_tpu.guidance.oracle import RewardOracle
    from diffndm_tpu.guidance.spsa import spsa_update
    from diffndm_tpu.models.dynamics import EGNNDynamics

    ATOM_NF, B, NL, NP = 10, 3, 8, 16
    cfg = EGNNConfig(hidden_nf=16, joint_nf=8, n_layers=1, row_tile=8,
                     attention=False, reflection_equivariant=True)
    module = EGNNDynamics(cfg, atom_nf=ATOM_NF, residue_nf=ATOM_NF)
    key = jax.random.PRNGKey(0)
    params = module.init(key, jnp.zeros((1, NL, 13)),
                         jnp.zeros((1, NP, 13)), jnp.zeros((1,)),
                         jnp.ones((1, NL)), jnp.ones((1, NP)))

    def eps_fn(z, xh_p, t, lm, pm):
        return module.apply(params, z, xh_p, t, lm, pm)

    core = CondDiffusion(S.make_schedule("polynomial_2", 10, 5e-4),
                         DiffusionConfig(timesteps=10), ATOM_NF, ATOM_NF)
    oracle = RewardOracle(dataset_params["crossdock_full"])
    z = jax.random.normal(jax.random.PRNGKey(1), (B, NL, 3 + ATOM_NF))
    xh_p = jax.random.normal(jax.random.PRNGKey(2), (B, NP, 3 + ATOM_NF))
    lm = jnp.ones((B, NL))
    pm = jnp.ones((B, NP))

    outs = {}
    for fuse in (True, False):
        scfg = SPSAConfig(enabled=True, num_probes=3, fuse_probes=fuse)
        outs[fuse] = spsa_update(jax.random.PRNGKey(3), core, eps_fn,
                                 oracle, z, xh_p, lm, pm,
                                 jnp.asarray(0.5), jnp.asarray(1e-3),
                                 scfg)
    np.testing.assert_allclose(np.asarray(outs[True][0]),
                               np.asarray(outs[False][0]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(outs[True][1]),
                               np.asarray(outs[False][1]),
                               atol=1e-5, rtol=1e-5)
