"""Schedule algebra and conditional-diffusion math invariants."""

import jax
import jax.numpy as jnp
import numpy as np

from diffndm_tpu.config import DiffusionConfig
from diffndm_tpu.diffusion import schedules as S
from diffndm_tpu.diffusion.core import CondDiffusion, assert_mean_zero, \
    init_ligand_from_pocket
from diffndm_tpu.diffusion.node_distribution import (DistributionNodes,
                                                     default_histogram)


def make_core(T=100):
    sched = S.make_schedule("polynomial_2", T, 5e-4)
    return CondDiffusion(sched, DiffusionConfig(timesteps=T), atom_nf=10,
                         residue_nf=10)


def test_schedule_monotone_and_bounds():
    sched = S.make_schedule("polynomial_2", 500, 5e-4)
    g = np.asarray(sched.table)
    assert g.shape == (501,)
    assert np.all(np.diff(g) > 0), "gamma must be monotone increasing"
    # alpha^2 + sigma^2 == 1 by construction
    a2 = np.asarray(S.alpha(sched.table)) ** 2
    s2 = np.asarray(S.sigma(sched.table)) ** 2
    np.testing.assert_allclose(a2 + s2, 1.0, atol=1e-6)
    S.check_norm_values(sched, 4.0)


def test_cosine_schedule():
    sched = S.make_schedule("cosine", 100)
    assert np.all(np.isfinite(np.asarray(sched.table)))


def test_transition_identity():
    """alpha_t == alpha_{t|s} * alpha_s and sigma_t^2 == sigma_{t|s}^2 +
    alpha_{t|s}^2 sigma_s^2 (the Markov consistency the sampler relies on)."""
    sched = S.make_schedule("polynomial_2", 100, 5e-4)
    gs, gt = sched.at_step(jnp.array(30)), sched.at_step(jnp.array(60))
    s2_ts, s_ts, a_ts = S.sigma_and_alpha_t_given_s(gt, gs)
    np.testing.assert_allclose(float(S.alpha(gt)),
                               float(a_ts * S.alpha(gs)), rtol=1e-5)
    np.testing.assert_allclose(float(S.sigma(gt) ** 2),
                               float(s2_ts + a_ts ** 2 * S.sigma(gs) ** 2),
                               rtol=1e-5)


def test_noised_representation_zero_com():
    core = make_core()
    key = jax.random.PRNGKey(0)
    b, nl, npk = 3, 8, 16
    k1, k2 = jax.random.split(key)
    xh_lig = jax.random.normal(k1, (b, nl, 13))
    xh_poc = jax.random.normal(k2, (b, npk, 13))
    lm = (jnp.arange(nl)[None] < jnp.array([[5], [8], [6]])).astype(
        jnp.float32)
    pm = jnp.ones((b, npk))
    xh_lig = xh_lig * lm[..., None]
    gamma_t = core.gamma_int(jnp.array([10, 50, 90]))
    z, xh_p, eps = core.noised_representation(key, xh_lig, xh_poc, lm, pm,
                                              gamma_t)
    assert assert_mean_zero(z[..., :3], lm)
    # padded entries stay zero
    assert float(jnp.abs(z * (1 - lm[..., None])).max()) == 0.0


def test_x0_roundtrip():
    """xh_given_zt_and_epsilon inverts the forward noising exactly."""
    core = make_core()
    key = jax.random.PRNGKey(1)
    xh = jax.random.normal(key, (2, 6, 13))
    lm = jnp.ones((2, 6))
    gamma_t = core.gamma_int(jnp.array([40, 70]))
    a, s = S.alpha(gamma_t), S.sigma(gamma_t)
    eps = jax.random.normal(key, xh.shape)
    z_t = a[:, None, None] * xh + s[:, None, None] * eps
    xh_rec = core.xh_given_zt_and_epsilon(z_t, eps, gamma_t)
    np.testing.assert_allclose(np.asarray(xh_rec), np.asarray(xh), atol=1e-4)


def test_init_ligand_from_pocket():
    core = make_core()
    key = jax.random.PRNGKey(2)
    b, nl, npk = 2, 8, 32
    pocket_x = jax.random.normal(key, (b, npk, 3)) + 5.0
    pocket_h = jax.random.normal(key, (b, npk, 10))
    lm = jnp.ones((b, nl))
    pm = jnp.ones((b, npk))
    z, xh_p = init_ligand_from_pocket(key, core, pocket_x, pocket_h, lm, pm)
    assert assert_mean_zero(z[..., :3], lm)
    assert z.shape == (b, nl, 13)


def test_kl_prior_small():
    """KL(q(z_T|x)||N(0,1)) should be small for standardized data."""
    core = make_core(T=500)
    key = jax.random.PRNGKey(3)
    xh = jax.random.normal(key, (2, 10, 13))
    lm = jnp.ones((2, 10))
    kl = core.kl_prior(xh, lm, jnp.full((2,), 10.0))
    assert float(jnp.abs(kl).max()) < 0.1


def test_distribution_nodes():
    hist = default_histogram(max_lig=40, max_pocket=100)
    dist = DistributionNodes(hist)
    key = jax.random.PRNGKey(0)
    n1, n2 = dist.sample(key, 100)
    assert n1.shape == (100,)
    n_lig = dist.sample_conditional(key, n2=jnp.array([50, 60, 70]))
    assert n_lig.shape == (3,)
    assert int(n_lig.min()) >= 6
    lp = dist.log_prob_n1_given_n2(n_lig, jnp.array([50, 60, 70]))
    assert np.all(np.isfinite(np.asarray(lp)))
    assert dist.entropy > 0


def test_learned_gamma_monotone():
    from diffndm_tpu.diffusion.learned_gamma import make_learned_gamma

    lg = make_learned_gamma(100)
    t = jnp.linspace(0.0, 1.0, 64)
    g = np.asarray(lg(t))
    assert np.all(np.diff(g) >= -1e-6), "learned gamma must be monotone"
    # endpoints pinned to (gamma_0, gamma_1) = (-5, 10) at init
    np.testing.assert_allclose(g[0], -5.0, atol=1e-4)
    np.testing.assert_allclose(g[-1], 10.0, atol=1e-4)
    # GammaSchedule-compatible interface works with the conditional core
    core = CondDiffusion(lg, DiffusionConfig(timesteps=100, loss_type="vlb"),
                         atom_nf=10, residue_nf=10)
    gam = core.schedule(jnp.array([0.3, 0.7]))
    assert gam.shape == (2,)
    assert float(gam[1]) > float(gam[0])


def test_noise_scale_semantics():
    """Low-temperature reverse step (SampleConfig.noise_scale): the
    posterior mean is untouched, only the injected noise scales —
    noise_scale=0 equals fix_noise (deterministic mean) and the deviation
    from the mean is exactly linear in the scale under identical keys."""
    core = make_core()
    key = jax.random.PRNGKey(3)
    kx, kstep = jax.random.split(key)
    b, nl, npk, d = 2, 6, 8, 13
    z = jax.random.normal(kx, (b, nl, d))
    xh_p = jax.random.normal(kx, (b, npk, d))
    lm = jnp.ones((b, nl))
    pm = jnp.ones((b, npk))
    # remove ligand-COM so inputs are in the sampler's subspace
    from diffndm_tpu.diffusion.core import remove_mean_ligand

    zx, px = remove_mean_ligand(z[..., :3], xh_p[..., :3], lm, pm)
    z = jnp.concatenate([zx, z[..., 3:]], -1)
    xh_p = jnp.concatenate([px, xh_p[..., 3:]], -1)

    def eps_fn(z_lig, xh_pocket, t, lig_mask, pocket_mask):
        return z_lig * 0.1, None

    s_norm, t_norm = 0.3, 0.31

    def step(scale, fix=False):
        out, _, _, _ = core.sample_p_zs_given_zt(
            kstep, s_norm, t_norm, z, xh_p, lm, pm, eps_fn,
            fix_noise=fix, noise_scale=scale)
        return out

    mean = step(0.0)
    np.testing.assert_allclose(np.asarray(mean),
                               np.asarray(step(1.0, fix=True)),
                               atol=1e-6)
    full = step(1.0)
    half = step(0.5)
    np.testing.assert_allclose(np.asarray(half - mean),
                               0.5 * np.asarray(full - mean), atol=1e-5)
    # default parity: noise_scale=1.0 is the same program as before
    out_default, _, _, _ = core.sample_p_zs_given_zt(
        kstep, s_norm, t_norm, z, xh_p, lm, pm, eps_fn)
    np.testing.assert_array_equal(np.asarray(full),
                                  np.asarray(out_default))
