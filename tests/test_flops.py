"""FLOPs accounting (utils/flops.py): the XLA-counted forward cost that
bench.py turns into MFU must stay consistent with the closed-form
dominant-matmul count, and banding must reduce it.

XLA's cost model counts a rolled ``lax.scan`` body once, so the counter
lowers with ``scan_unroll=True``; these tests pin that the unrolled count
really scales with the tile count (the bug class that made round-3's
numbers impossible to ground).
"""

import jax
import jax.numpy as jnp
import pytest

from diffndm_tpu.config import EGNNConfig
from diffndm_tpu.models.dynamics import EGNNDynamics
from diffndm_tpu.utils.flops import (egnn_flops_analytic, peak_tflops_for,
                                     xla_forward_flops)

ANF = 10


def _module_and_params(cfg, nl, npk):
    m = EGNNDynamics(cfg, atom_nf=ANF, residue_nf=ANF)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, nl, 3 + ANF)),
               jnp.zeros((1, npk, 3 + ANF)), jnp.zeros((1,)),
               jnp.ones((1, nl)), jnp.ones((1, npk)))
    return m, p


def test_analytic_matches_xla_dense():
    cfg = EGNNConfig(hidden_nf=32, joint_nf=16, n_layers=2, row_tile=8,
                     use_pallas=False)
    m, p = _module_and_params(cfg, 16, 48)
    x = xla_forward_flops(m, p, 2, 16, 48)["flops"]
    a = egnn_flops_analytic(cfg, ANF, 2, 16, 48)
    # analytic counts only the dominant matmuls -> strictly below the
    # full XLA count, but by < 35% at these widths
    assert 0.65 * x < a < x, (a, x)


def test_flops_scale_with_tiles():
    """The unrolled lowering must count every row tile: quadrupling the
    column count (more pocket nodes) must scale edge-dominated FLOPs by
    well over the node-linear factor."""
    cfg = EGNNConfig(hidden_nf=32, joint_nf=16, n_layers=2, row_tile=8,
                     use_pallas=False)
    m1, p1 = _module_and_params(cfg, 16, 32)
    f1 = xla_forward_flops(m1, p1, 1, 16, 32)["flops"]
    m2, p2 = _module_and_params(cfg, 16, 128)
    f2 = xla_forward_flops(m2, p2, 1, 16, 128)["flops"]
    # n grows 48 -> 144 (3x); edges grow 9x.  A scan-undercounting
    # regression would show ~1x (body counted once in both).
    assert f2 / f1 > 5.0, (f1, f2)


def test_banding_reduces_flops():
    cfg_d = EGNNConfig(hidden_nf=32, joint_nf=16, n_layers=2, row_tile=8,
                       use_pallas=False)
    cfg_b = EGNNConfig(hidden_nf=32, joint_nf=16, n_layers=2, row_tile=8,
                       use_pallas=False, band_window=64)
    m_d, p_d = _module_and_params(cfg_d, 16, 160)
    m_b, p_b = _module_and_params(cfg_b, 16, 160)
    f_d = xla_forward_flops(m_d, p_d, 1, 16, 160)["flops"]
    f_b = xla_forward_flops(m_b, p_b, 1, 16, 160)["flops"]
    a_b = egnn_flops_analytic(cfg_b, ANF, 1, 16, 160)
    assert f_b < 0.75 * f_d, (f_b, f_d)
    assert 0.6 * f_b < a_b < f_b, (a_b, f_b)


def test_frozen_pocket_skip_reduces_flops():
    """Conditional mode must COST less than the joint model at the same
    shape: the coordinate-update chains for the frozen pocket rows are
    skipped (models/egnn.py coord_rows), not computed-then-zeroed.  A
    regression back to compute-and-mask shows up as f_cond ~= f_joint."""
    kw = dict(hidden_nf=32, joint_nf=16, n_layers=2, row_tile=8,
              use_pallas=False)
    cfg_c = EGNNConfig(update_pocket_coords=False, **kw)
    cfg_j = EGNNConfig(update_pocket_coords=True, **kw)
    m_c, p_c = _module_and_params(cfg_c, 8, 56)
    m_j, p_j = _module_and_params(cfg_j, 8, 56)
    f_c = xla_forward_flops(m_c, p_c, 1, 8, 56)["flops"]
    f_j = xla_forward_flops(m_j, p_j, 1, 8, 56)["flops"]
    a_c = egnn_flops_analytic(cfg_c, ANF, 1, 8, 56)
    # 8 of 64 rows move -> the equivariant edge chains shrink ~8x; with
    # the GCL chain unchanged the total must drop well below joint cost
    assert f_c < 0.72 * f_j, (f_c, f_j)
    assert 0.6 * f_c < a_c < f_c, (a_c, f_c)


def test_peak_lookup():
    assert peak_tflops_for("TPU v5 lite0") == 197.0
    assert peak_tflops_for("TPU v4 chip") == 275.0
    assert peak_tflops_for("cpu") is None
