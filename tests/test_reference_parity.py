"""Cross-implementation numerical parity against the reference PyTorch code.

The reference EGNN stack (equivariant_diffusion/egnn_new.py, dynamics.py)
imports only torch; en_diffusion/conditional_model additionally need the
torch_scatter shim from reference_shim.  We instantiate the reference
modules with random weights, map them through convert.convert_state_dict,
and assert the flax forward agrees — in float64, so any structural drift
(gamma-lookup rounding, COM-projection order, the coords_range/n_layers
dead-code trap at egnn_new.py:197 vs :218, norm_values asymmetry) fails
loudly rather than hiding inside float32 noise.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if not os.path.isdir("/root/reference"):
    pytest.skip("reference checkout not available", allow_module_level=True)

torch = pytest.importorskip("torch")

import reference_shim  # noqa: E402

reference_shim.install()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffndm_tpu.config import DiffusionConfig, EGNNConfig, ModelConfig  # noqa: E402
from diffndm_tpu.convert import convert_state_dict  # noqa: E402
from diffndm_tpu.diffusion import schedules as S  # noqa: E402
from diffndm_tpu.diffusion.core import CondDiffusion  # noqa: E402
from diffndm_tpu.models.dynamics import EGNNDynamics  # noqa: E402

from equivariant_diffusion.dynamics import EGNNDynamics as TorchDynamics  # noqa: E402
from equivariant_diffusion.en_diffusion import PredefinedNoiseSchedule  # noqa: E402


# ---------------------------------------------------------------------------
# fixtures / helpers
# ---------------------------------------------------------------------------

B = 3
N_LIG = (4, 6, 5)
N_POC = (7, 10, 8)
NL, NP = 8, 12


def _masks():
    lig_mask = (np.arange(NL)[None, :] < np.array(N_LIG)[:, None])
    poc_mask = (np.arange(NP)[None, :] < np.array(N_POC)[:, None])
    return lig_mask.astype(np.float64), poc_mask.astype(np.float64)


def _padded_inputs(rng, feat_l, feat_p):
    lig_mask, poc_mask = _masks()
    xh_lig = rng.normal(size=(B, NL, 3 + feat_l)) * lig_mask[..., None]
    xh_poc = rng.normal(size=(B, NP, 3 + feat_p)) * poc_mask[..., None]
    # spread coordinates so the 5 A cutoffs produce a non-trivial adjacency
    xh_lig[..., :3] *= 2.0
    xh_poc[..., :3] *= 3.0
    xh_lig *= lig_mask[..., None]
    xh_poc *= poc_mask[..., None]
    return xh_lig, xh_poc, lig_mask, poc_mask


def _flatten(padded, mask):
    """[B, N, D] + [B, N] -> flat [sum(n), D] (row-major over batch)."""
    return padded[mask.astype(bool)]


def _batch_idx(counts):
    return np.concatenate([np.full(n, i) for i, n in enumerate(counts)])


def _torch_state_to_sd(model):
    return {f"dynamics.{k}": v.detach().cpu().numpy()
            for k, v in model.state_dict().items()}


def _build_pair(feat, reflection_equiv, attention, tanh, seed=0):
    """Matching (torch module, flax module, flax params) with random torch
    weights converted through convert_state_dict."""
    torch.manual_seed(seed)
    tdyn = TorchDynamics(
        atom_nf=feat, residue_nf=feat, n_dims=3, joint_nf=8, hidden_nf=16,
        device="cpu", act_fn=torch.nn.SiLU(), n_layers=2,
        attention=attention, condition_time=True, tanh=tanh,
        mode="egnn_dynamics", norm_constant=1, inv_sublayers=1,
        sin_embedding=False, normalization_factor=100,
        aggregation_method="sum", update_pocket_coords=False,
        edge_cutoff_ligand=None, edge_cutoff_pocket=5.0,
        edge_cutoff_interaction=5.0,
        reflection_equivariant=reflection_equiv).double().eval()

    cfg = EGNNConfig(joint_nf=8, hidden_nf=16, n_layers=2, inv_sublayers=1,
                     attention=attention, tanh=tanh, norm_constant=1.0,
                     sin_embedding=False, normalization_factor=100.0,
                     aggregation_method="sum",
                     reflection_equivariant=reflection_equiv,
                     edge_cutoff_ligand=None, edge_cutoff_pocket=5.0,
                     edge_cutoff_interaction=5.0,
                     update_pocket_coords=False, row_tile=8)
    jdyn = EGNNDynamics(cfg, atom_nf=feat, residue_nf=feat)
    params = convert_state_dict(_torch_state_to_sd(tdyn),
                                ModelConfig(egnn=cfg))
    return tdyn, jdyn, params


def _torch_forward(tdyn, xh_lig, xh_poc, lig_mask, poc_mask, t_vals):
    lig_flat = torch.tensor(_flatten(xh_lig, lig_mask))
    poc_flat = torch.tensor(_flatten(xh_poc, poc_mask))
    lidx = torch.tensor(_batch_idx(N_LIG), dtype=torch.long)
    pidx = torch.tensor(_batch_idx(N_POC), dtype=torch.long)
    t = torch.tensor(np.asarray(t_vals).reshape(B, 1))
    with torch.no_grad():
        out_l, out_p = tdyn(lig_flat, poc_flat, t, lidx, pidx)
    return out_l.numpy(), out_p.numpy()


# ---------------------------------------------------------------------------
# gamma schedule
# ---------------------------------------------------------------------------

def test_gamma_schedule_matches_reference_table():
    for name, T, prec in (("polynomial_2", 500, 5e-4),
                          ("polynomial_2", 50, 5e-4),
                          ("cosine", 100, 5e-4)):
        ref = PredefinedNoiseSchedule(name, timesteps=T, precision=prec)
        ours = S.make_schedule(name, T, prec)
        ref_table = ref.gamma.detach().numpy()
        np.testing.assert_allclose(np.asarray(ours.table), ref_table,
                                   rtol=0, atol=1e-6)
        # lookup rounding parity: round(t*T) incl. non-integer t*T
        ts = np.array([0.0, 0.2501, 0.4999, 0.5, 0.5001, 0.75, 1.0])
        ref_g = ref(torch.tensor(ts).reshape(-1, 1)).detach().numpy().ravel()
        our_g = np.asarray(ours(jnp.asarray(ts, jnp.float32)))
        np.testing.assert_allclose(our_g, ref_g, rtol=0, atol=1e-6)


# ---------------------------------------------------------------------------
# EGNN dynamics forward
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("reflection_equiv,attention,tanh", [
    (False, True, True),    # flagship crossdock_fullatom_cond settings
    (True, False, False),   # plain E(n) branch
])
def test_dynamics_forward_matches_reference(reflection_equiv, attention,
                                            tanh):
    rng = np.random.default_rng(0)
    feat = 6
    with jax.enable_x64(True):
        tdyn, jdyn, params = _build_pair(feat, reflection_equiv, attention,
                                         tanh)
        xh_lig, xh_poc, lig_mask, poc_mask = _padded_inputs(rng, feat, feat)
        t_vals = np.array([0.2, 0.5, 0.9])

        ref_l, ref_p = _torch_forward(tdyn, xh_lig, xh_poc, lig_mask,
                                      poc_mask, t_vals)
        out_l, out_p = jdyn.apply(params, jnp.asarray(xh_lig),
                                  jnp.asarray(xh_poc), jnp.asarray(t_vals),
                                  jnp.asarray(lig_mask),
                                  jnp.asarray(poc_mask))
        np.testing.assert_allclose(
            _flatten(np.asarray(out_l), lig_mask), ref_l, atol=1e-9, rtol=0)
        np.testing.assert_allclose(
            _flatten(np.asarray(out_p), poc_mask), ref_p, atol=1e-9, rtol=0)


def test_dynamics_forward_float32_tolerance():
    """Same comparison at production precision: must agree to ~1e-5."""
    rng = np.random.default_rng(1)
    feat = 6
    tdyn, jdyn, params = _build_pair(feat, False, True, True)
    tdyn = tdyn.float()
    xh_lig, xh_poc, lig_mask, poc_mask = _padded_inputs(rng, feat, feat)
    t_vals = np.array([0.2, 0.5, 0.9])
    lig_flat = torch.tensor(_flatten(xh_lig, lig_mask), dtype=torch.float32)
    poc_flat = torch.tensor(_flatten(xh_poc, poc_mask), dtype=torch.float32)
    lidx = torch.tensor(_batch_idx(N_LIG), dtype=torch.long)
    pidx = torch.tensor(_batch_idx(N_POC), dtype=torch.long)
    with torch.no_grad():
        ref_l, ref_p = tdyn(lig_flat, poc_flat,
                            torch.tensor(t_vals.reshape(B, 1),
                                         dtype=torch.float32), lidx, pidx)
    params32 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)
    out_l, out_p = jdyn.apply(params32,
                              jnp.asarray(xh_lig, jnp.float32),
                              jnp.asarray(xh_poc, jnp.float32),
                              jnp.asarray(t_vals, jnp.float32),
                              jnp.asarray(lig_mask, jnp.float32),
                              jnp.asarray(poc_mask, jnp.float32))
    np.testing.assert_allclose(_flatten(np.asarray(out_l), lig_mask),
                               ref_l.numpy(), atol=2e-5, rtol=0)
    np.testing.assert_allclose(_flatten(np.asarray(out_p), poc_mask),
                               ref_p.numpy(), atol=2e-5, rtol=0)


# ---------------------------------------------------------------------------
# full ConditionalDDPM reverse step + final decode
# ---------------------------------------------------------------------------

def _build_ddpm_pair(T=50):
    """Reference ConditionalDDPM + our CondDiffusion over the same
    random-weight dynamics (atom_nf=10 so the reference AdjustNet's
    hard-coded input_dim=13 lines up)."""
    from equivariant_diffusion.conditional_model import ConditionalDDPM

    feat = 10
    tdyn, jdyn, params = _build_pair(feat, False, True, True, seed=3)
    hist = np.ones((12, 14))
    ddpm = ConditionalDDPM(
        dynamics=tdyn, atom_nf=feat, residue_nf=feat, n_dims=3,
        size_histogram=hist, timesteps=T, parametrization="eps",
        noise_schedule="polynomial_2", noise_precision=5e-4,
        loss_type="l2", norm_values=(1.0, 4.0), norm_biases=(None, 0.0),
    ).double().eval()
    # deterministic: zero out the gaussian draws (the reference left
    # fix_noise NotImplemented, conditional_model.py:168-170)
    ddpm.sample_gaussian = \
        lambda size, device: torch.zeros(size, dtype=torch.float64)

    # identical gamma table: reference stores float32 values
    # (en_diffusion.py:1191), so round ours through float32 too
    alphas2 = S.polynomial_alphas2(T, s=5e-4, power=2.0)
    gamma = (-(np.log(alphas2) - np.log(1.0 - alphas2))).astype(np.float32)
    sched = S.GammaSchedule(table=jnp.asarray(gamma, jnp.float64),
                            timesteps=T)
    core = CondDiffusion(sched, DiffusionConfig(timesteps=T), feat, feat)

    def eps_fn(z, xh_p, t, lm, pm):
        return jdyn.apply(params, z, xh_p, t, lm, pm)

    return ddpm, core, eps_fn, feat


def _zero_com_state(rng, feat):
    """Normalized (z_lig, xh_pocket) with per-graph ligand COM = 0, plus
    masks in both layouts."""
    xh_lig, xh_poc, lig_mask, poc_mask = _padded_inputs(rng, feat, feat)
    com = (xh_lig[..., :3].sum(1, keepdims=True)
           / lig_mask.sum(1)[:, None, None])
    xh_lig[..., :3] -= com
    xh_poc[..., :3] -= com
    xh_lig *= lig_mask[..., None]
    xh_poc *= poc_mask[..., None]
    return xh_lig, xh_poc, lig_mask, poc_mask


def test_sample_step_matches_reference():
    rng = np.random.default_rng(2)
    with jax.enable_x64(True):
        ddpm, core, eps_fn, feat = _build_ddpm_pair(T=50)
        z_lig, xh_poc, lig_mask, poc_mask = _zero_com_state(rng, feat)
        s_int = 12
        s_norm, t_norm = s_int / 50.0, (s_int + 1) / 50.0

        lidx = torch.tensor(_batch_idx(N_LIG), dtype=torch.long)
        pidx = torch.tensor(_batch_idx(N_POC), dtype=torch.long)
        s_t = torch.full((B, 1), s_norm, dtype=torch.float64)
        t_t = torch.full((B, 1), t_norm, dtype=torch.float64)
        with torch.no_grad():
            ref_zs, ref_xh_poc, _ = ddpm.sample_p_zs_given_zt(
                s_t, t_t, torch.tensor(_flatten(z_lig, lig_mask)),
                torch.tensor(_flatten(xh_poc, poc_mask)), lidx, pidx,
                optimize=0)

        z_s, xh_p, _, _ = core.sample_p_zs_given_zt(
            jax.random.PRNGKey(0), jnp.asarray(s_norm), jnp.asarray(t_norm),
            jnp.asarray(z_lig), jnp.asarray(xh_poc), jnp.asarray(lig_mask),
            jnp.asarray(poc_mask), eps_fn, fix_noise=True)
        np.testing.assert_allclose(_flatten(np.asarray(z_s), lig_mask),
                                   ref_zs.numpy(), atol=1e-9, rtol=0)
        np.testing.assert_allclose(_flatten(np.asarray(xh_p), poc_mask),
                                   ref_xh_poc.numpy(), atol=1e-9, rtol=0)


def test_final_decode_matches_reference():
    rng = np.random.default_rng(4)
    with jax.enable_x64(True):
        ddpm, core, eps_fn, feat = _build_ddpm_pair(T=50)
        z0_lig, xh_poc, lig_mask, poc_mask = _zero_com_state(rng, feat)

        lidx = torch.tensor(_batch_idx(N_LIG), dtype=torch.long)
        pidx = torch.tensor(_batch_idx(N_POC), dtype=torch.long)
        with torch.no_grad():
            rx, rh, rpx, rph = ddpm.sample_p_xh_given_z0(
                torch.tensor(_flatten(z0_lig, lig_mask)),
                torch.tensor(_flatten(xh_poc, poc_mask)), lidx, pidx,
                batch_size=B)

        x_lig, h_lig, x_poc, h_poc = core.sample_p_xh_given_z0(
            jax.random.PRNGKey(0), jnp.asarray(z0_lig), jnp.asarray(xh_poc),
            jnp.asarray(lig_mask), jnp.asarray(poc_mask), eps_fn,
            fix_noise=True)
        np.testing.assert_allclose(_flatten(np.asarray(x_lig), lig_mask),
                                   rx.numpy(), atol=1e-9, rtol=0)
        np.testing.assert_allclose(_flatten(np.asarray(h_lig), lig_mask),
                                   rh.numpy(), atol=0, rtol=0)
        np.testing.assert_allclose(_flatten(np.asarray(x_poc), poc_mask),
                                   rpx.numpy(), atol=1e-9, rtol=0)
        np.testing.assert_allclose(_flatten(np.asarray(h_poc), poc_mask),
                                   rph.numpy(), atol=1e-9, rtol=0)


# ---------------------------------------------------------------------------
# joint (unconditional) model reverse step
# ---------------------------------------------------------------------------

def test_joint_sample_step_matches_reference():
    """EnVariationalDiffusion.sample_p_zs_given_zt (both parts denoised,
    joint-COM projection, en_diffusion.py:506-561) vs JointDiffusion."""
    from equivariant_diffusion.en_diffusion import EnVariationalDiffusion

    from diffndm_tpu.diffusion.joint import JointDiffusion

    rng = np.random.default_rng(6)
    feat = 10
    with jax.enable_x64(True):
        torch.manual_seed(7)
        tdyn = TorchDynamics(
            atom_nf=feat, residue_nf=feat, n_dims=3, joint_nf=8,
            hidden_nf=16, device="cpu", act_fn=torch.nn.SiLU(),
            n_layers=2, attention=True, condition_time=True, tanh=True,
            mode="egnn_dynamics", norm_constant=1, inv_sublayers=1,
            sin_embedding=False, normalization_factor=100,
            aggregation_method="sum", update_pocket_coords=True,
            edge_cutoff_ligand=None, edge_cutoff_pocket=5.0,
            edge_cutoff_interaction=5.0,
            reflection_equivariant=False).double().eval()
        cfg = EGNNConfig(joint_nf=8, hidden_nf=16, n_layers=2,
                         inv_sublayers=1, attention=True, tanh=True,
                         norm_constant=1.0, reflection_equivariant=False,
                         edge_cutoff_ligand=None, edge_cutoff_pocket=5.0,
                         edge_cutoff_interaction=5.0,
                         update_pocket_coords=True, row_tile=8)
        jdyn = EGNNDynamics(cfg, atom_nf=feat, residue_nf=feat)
        params = convert_state_dict(_torch_state_to_sd(tdyn),
                                    ModelConfig(egnn=cfg))

        T = 50
        hist = np.ones((12, 14))
        ref = EnVariationalDiffusion(
            dynamics=tdyn, atom_nf=feat, residue_nf=feat, n_dims=3,
            size_histogram=hist, timesteps=T,
            noise_schedule="polynomial_2", noise_precision=5e-4,
            loss_type="l2", norm_values=(1.0, 4.0),
            norm_biases=(None, 0.0)).double().eval()
        # deterministic: the sampled zs equals the posterior mean
        ref.sample_normal = lambda ml, mp, s, lm, pm, f=False: (ml, mp)

        alphas2 = S.polynomial_alphas2(T, s=5e-4, power=2.0)
        gamma = (-(np.log(alphas2)
                   - np.log(1.0 - alphas2))).astype(np.float32)
        sched = S.GammaSchedule(table=jnp.asarray(gamma, jnp.float64),
                                timesteps=T)
        core = JointDiffusion(sched, DiffusionConfig(timesteps=T), feat,
                              feat)

        def eps_fn(zl, zp, t, lm, pm):
            return jdyn.apply(params, zl, zp, t, lm, pm)

        # joint zero-COM state (both parts noised in the joint model)
        z_lig, z_poc, lig_mask, poc_mask = _zero_com_state(rng, feat)
        # re-centre on the JOINT mean (the conditional helper centres on
        # the ligand only)
        lm3 = lig_mask[..., None]
        pm3 = poc_mask[..., None]
        tot = lig_mask.sum(1) + poc_mask.sum(1)
        com = ((z_lig[..., :3] * lm3).sum(1)
               + (z_poc[..., :3] * pm3).sum(1)) / tot[:, None]
        z_lig[..., :3] = (z_lig[..., :3] - com[:, None]) * lm3
        z_poc[..., :3] = (z_poc[..., :3] - com[:, None]) * pm3

        s_int = 17
        s_norm, t_norm = s_int / T, (s_int + 1) / T
        lidx = torch.tensor(_batch_idx(N_LIG), dtype=torch.long)
        pidx = torch.tensor(_batch_idx(N_POC), dtype=torch.long)
        with torch.no_grad():
            ref_l, ref_p = ref.sample_p_zs_given_zt(
                torch.full((B, 1), s_norm, dtype=torch.float64),
                torch.full((B, 1), t_norm, dtype=torch.float64),
                torch.tensor(_flatten(z_lig, lig_mask)),
                torch.tensor(_flatten(z_poc, poc_mask)), lidx, pidx)

        z_l, z_p = core.sample_p_zs_given_zt(
            jax.random.PRNGKey(0), jnp.asarray(s_norm),
            jnp.asarray(t_norm), jnp.asarray(z_lig), jnp.asarray(z_poc),
            jnp.asarray(lig_mask), jnp.asarray(poc_mask), eps_fn,
            fix_noise=True)
        np.testing.assert_allclose(_flatten(np.asarray(z_l), lig_mask),
                                   ref_l.numpy(), atol=1e-9, rtol=0)
        np.testing.assert_allclose(_flatten(np.asarray(z_p), poc_mask),
                                   ref_p.numpy(), atol=1e-9, rtol=0)
