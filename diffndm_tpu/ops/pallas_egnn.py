"""Fused Pallas TPU kernels for EGNN message passing.

The XLA row-tiled path (models/egnn.py) materializes the [B, T, N, H]
edge activations in HBM between each op of the chain
``silu(a_i + b_j + W_e e_ij) -> silu(. @ W2) -> attention -> masked sum``;
at the flagship size that is tens of GB of HBM traffic per denoising step
and the model becomes bandwidth-bound.  These kernels keep one
(row-tile x col-tile) block of the chain entirely in VMEM: the only HBM
traffic is the O(N*H) projections, the O(N^2) scalar edge inputs and the
O(N*H) output.

Two kernels:

- ``gcl_messages``:   feature aggregation  agg[i] = sum_j adj_ij * m_ij
                      (optionally attention-gated), m_ij in R^H.
- ``edge_vector_reduce``: coordinate aggregation
                      agg[i] = sum_j adj_ij * w_ij * v_ij with
                      w_ij = tanh(phi(m_ij)) * coords_range (or raw phi)
                      and v_ij the normalized difference or cross-product
                      direction — used for both the coord and the cross
                      MLP of EquivariantUpdate.

Both support interpret mode for CPU tests.

STATUS (round-2 hardware measurement, NOTES_NEXT_ROUND.md): at the
flagship shapes (N=344, H=256) these kernels LOSE to XLA's fused dense
path — 0.226-0.283 vs 0.333 lig/s — because the f32 z-chain widening
doubles VPU cost, and the bf16-z variant trips Mosaic verifier bugs.
They stay wired behind ``EGNNConfig.use_pallas`` (off by default, with
an interpret-mode equivalence test) as the starting point for larger
shapes, where the O(N^2 H) HBM-traffic argument above starts to win;
re-tune before enabling in production.

ROOFLINE (round-4, quantified — why XLA stays the default; counted by
utils/flops.py on the exact banded program, measured on one v5e chip):

- Flagship sampler step (B=20, N=24+320, H=256, 6 layers, band W=176):
  **3.584e12 FLOPs** (XLA cost model; closed-form matmul count agrees
  within 3%) in 60.9 ms = **58.9 TFLOP/s sustained = 29.9% MFU** against
  the 197 TFLOP/s bf16 peak — and that denominator includes the
  sampler's posterior/RNG algebra, so the EGNN forward alone sits
  higher.
- HLO "bytes accessed" = 2.21e11 per step, an upper bound that counts
  every producer/consumer pair.  If that traffic actually hit HBM the
  step would need 4.4x the chip's 819 GB/s — i.e. XLA's fusion already
  keeps >= 77% of the chain's bytes in registers/VMEM.  The residual
  headroom for a perfect kernel is bounded by 1/MFU ~= 3.3x, and the
  measured Pallas attempts above were *slower*, not faster: the chain's
  non-matmul half (silu/sigmoid/direction math) is VPU-bound, and
  Mosaic's f32-scalar constraints force a wider VPU footprint than
  XLA's fused bf16 elementwise ops.
- The dominant matmuls contract over H=256 or 2H=512 — already
  MXU-shaped; a hand kernel cannot shrink their FLOPs, only the HBM
  round-trips XLA has mostly eliminated.

Conclusion: at every shape this model family uses (N <= ~900 after
banding), the XLA row-tiled path runs within ~3x of the bf16 compute
roofline with most of the gap in VPU-bound elementwise work, so a Pallas
win would require beating XLA's elementwise fusion, not its memory
scheduling.  Revisit only if H grows past ~512 or banding is disabled on
N >> 1000 pockets.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# GCL message aggregation
# ---------------------------------------------------------------------------

def _gcl_kernel(a_ref, b_ref, d2c_ref, d2i_ref, adj_ref, we_ref, w2_ref,
                b2_ref, watt_ref, batt_ref, out_ref, *, attention: bool,
                norm_factor: float, mxu_dtype):
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    a = a_ref[0]          # [T, H]
    b = b_ref[0]          # [C, H]
    # Mosaic only supports minor-dim insertion ([:, :, None]) for 32-bit
    # types — widen the scalar edge planes before broadcasting
    d2c = d2c_ref[0].astype(jnp.float32)      # [T, C]
    d2i = d2i_ref[0].astype(jnp.float32)      # [T, C]
    adj = adj_ref[0].astype(jnp.float32)      # [T, C]
    we = we_ref[...].astype(jnp.float32)      # [2, H]

    z = (a[:, None, :] + b[None, :, :]
         + d2c[:, :, None] * we[0][None, None, :]
         + d2i[:, :, None] * we[1][None, None, :])
    z = jax.nn.silu(z)
    t, cc, h = z.shape
    # mxu_dtype operands onto the MXU, fp32 accumulation
    m = jax.nn.silu(
        jnp.dot(z.reshape(t * cc, h).astype(mxu_dtype),
                w2_ref[...].astype(mxu_dtype),
                preferred_element_type=jnp.float32) + b2_ref[...])
    if attention:
        att = jax.nn.sigmoid(
            jnp.dot(m.astype(mxu_dtype),
                    watt_ref[...].astype(mxu_dtype),
                    preferred_element_type=jnp.float32) + batt_ref[...])
        m = m * att
    m = m.reshape(t, cc, h) * adj[:, :, None]
    out_ref[0] += jnp.sum(m, axis=1) / norm_factor


def gcl_messages(a, b, d2c, d2i, adj, we, w2, b2, watt, batt=None,
                 attention: bool = True, norm_factor: float = 100.0,
                 row_tile: int = 16, col_tile: int = 128,
                 interpret: bool = False, mxu_dtype=jnp.bfloat16):
    """a, b: [B, N, H] (pre-projected node terms, bias folded into b);
    d2c/d2i/adj: [B, N, N]; we: [2, H]; w2: [H, H]; b2: [H]; watt: [H, 1];
    batt: [1] attention bias.  Returns agg [B, N, H] float32."""
    bsz, n, h = a.shape
    t = min(row_tile, n)
    c = min(col_tile, n)
    n_pad = _cdiv(n, t) * t
    c_pad = _cdiv(n, c) * c

    def pad(arr, rows=None, cols=None):
        cfg = [(0, 0)] * arr.ndim
        if rows is not None:
            cfg[1] = (0, rows - arr.shape[1])
        if cols is not None:
            cfg[2] = (0, cols - arr.shape[2])
        return jnp.pad(arr, cfg)

    a_p = pad(a, rows=n_pad)
    b_p = pad(b, rows=c_pad)
    d2c_p = pad(d2c, rows=n_pad, cols=c_pad)
    d2i_p = pad(d2i, rows=n_pad, cols=c_pad)
    adj_p = pad(adj, rows=n_pad, cols=c_pad)

    if batt is None:
        batt = jnp.zeros((1,), jnp.float32)
    grid = (bsz, n_pad // t, c_pad // c)
    out = pl.pallas_call(
        functools.partial(_gcl_kernel, attention=attention,
                          norm_factor=norm_factor, mxu_dtype=mxu_dtype),
        out_shape=jax.ShapeDtypeStruct((bsz, n_pad, h), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t, h), lambda bi, r, ci: (bi, r, 0)),
            pl.BlockSpec((1, c, h), lambda bi, r, ci: (bi, ci, 0)),
            pl.BlockSpec((1, t, c), lambda bi, r, ci: (bi, r, ci)),
            pl.BlockSpec((1, t, c), lambda bi, r, ci: (bi, r, ci)),
            pl.BlockSpec((1, t, c), lambda bi, r, ci: (bi, r, ci)),
            pl.BlockSpec((2, h), lambda bi, r, ci: (0, 0)),
            pl.BlockSpec((h, h), lambda bi, r, ci: (0, 0)),
            pl.BlockSpec((h,), lambda bi, r, ci: (0,)),
            pl.BlockSpec((h, 1), lambda bi, r, ci: (0, 0)),
            pl.BlockSpec((1,), lambda bi, r, ci: (0,)),
        ],
        out_specs=pl.BlockSpec((1, t, h), lambda bi, r, ci: (bi, r, 0)),
        interpret=interpret,
    )(a_p, b_p, d2c_p, d2i_p, adj_p, we, w2, b2, watt, batt)
    return out[:, :n]


# ---------------------------------------------------------------------------
# Coordinate-update aggregation
# ---------------------------------------------------------------------------

def _vec_kernel(a_ref, b_ref, d2c_ref, d2i_ref, adj_ref, xr_ref, xc_ref,
                ctr_ref, we_ref, w2_ref, b2_ref, wout_ref, out_ref, *,
                tanh: bool, coords_range: float, norm_constant: float,
                cross: bool, norm_factor: float, mxu_dtype):
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    a = a_ref[0]
    b = b_ref[0]
    d2c = d2c_ref[0].astype(jnp.float32)
    d2i = d2i_ref[0].astype(jnp.float32)
    adj = adj_ref[0].astype(jnp.float32)
    we = we_ref[...].astype(jnp.float32)

    z = (a[:, None, :] + b[None, :, :]
         + d2c[:, :, None] * we[0][None, None, :]
         + d2i[:, :, None] * we[1][None, None, :])
    z = jax.nn.silu(z)
    t, cc, h = z.shape
    m = jax.nn.silu(
        jnp.dot(z.reshape(t * cc, h).astype(mxu_dtype),
                w2_ref[...].astype(mxu_dtype),
                preferred_element_type=jnp.float32) + b2_ref[...])
    phi = jnp.dot(m.astype(mxu_dtype),
                  wout_ref[...].astype(mxu_dtype),
                  preferred_element_type=jnp.float32).reshape(t, cc)
    if tanh:
        phi = jnp.tanh(phi) * coords_range

    # planar coordinate math: [T, C] planes map onto 8x128 VPU tiles
    # (a packed [T, C, 3] layout would waste 125/128 lanes)
    xr = xr_ref[0]  # [T, 3]
    xc = xc_ref[0]  # [C, 3]
    w = phi * adj  # [T, C]
    if cross:
        ctr = ctr_ref[0]  # [1, 3]; slice (not scalar-index) — Mosaic only
        # converts 32-bit elements to scalars
        va = [(xr[:, k:k + 1] - ctr[:, k:k + 1]) for k in range(3)]
        vb = [(xc[:, k:k + 1] - ctr[:, k:k + 1]).T for k in range(3)]
        vx = va[1] * vb[2] - va[2] * vb[1]
        vy = va[2] * vb[0] - va[0] * vb[2]
        vz = va[0] * vb[1] - va[1] * vb[0]
        norm = jnp.sqrt(vx * vx + vy * vy + vz * vz)
        inv = w / (norm + norm_constant)
        comps = [vx * inv, vy * inv, vz * inv]
    else:
        dx = xr[:, 0][:, None] - xc[:, 0][None, :]
        dy = xr[:, 1][:, None] - xc[:, 1][None, :]
        dz = xr[:, 2][:, None] - xc[:, 2][None, :]
        radial = dx * dx + dy * dy + dz * dz
        inv = w / (jnp.sqrt(radial + 1e-8) + norm_constant)
        comps = [dx * inv, dy * inv, dz * inv]
    agg = jnp.stack([jnp.sum(cmp, axis=1) for cmp in comps], axis=-1)
    out_ref[0] += agg / norm_factor


def edge_vector_reduce(a, b, d2c, d2i, adj, x, center, we, w2, b2, wout,
                       tanh: bool = True, coords_range: float = 15.0,
                       norm_constant: float = 1.0, cross: bool = False,
                       norm_factor: float = 100.0, row_tile: int = 16,
                       col_tile: int = 128, interpret: bool = False,
                       mxu_dtype=jnp.bfloat16):
    """Returns agg [B, N, 3] = sum_j adj_ij * tanh(phi_ij) * range * v_ij.

    x: [B, N, 3]; center: [B, 1, 3] (joint COM, used when cross=True)."""
    bsz, n, h = a.shape
    t = min(row_tile, n)
    c = min(col_tile, n)
    n_pad = _cdiv(n, t) * t
    c_pad = _cdiv(n, c) * c

    def pad(arr, rows=None, cols=None):
        cfg = [(0, 0)] * arr.ndim
        if rows is not None:
            cfg[1] = (0, rows - arr.shape[1])
        if cols is not None:
            cfg[2] = (0, cols - arr.shape[2])
        return jnp.pad(arr, cfg)

    a_p = pad(a, rows=n_pad)
    b_p = pad(b, rows=c_pad)
    d2c_p = pad(d2c, rows=n_pad, cols=c_pad)
    d2i_p = pad(d2i, rows=n_pad, cols=c_pad)
    adj_p = pad(adj, rows=n_pad, cols=c_pad)
    xr_p = pad(x, rows=n_pad)
    xc_p = pad(x, rows=c_pad)

    grid = (bsz, n_pad // t, c_pad // c)
    out = pl.pallas_call(
        functools.partial(_vec_kernel, tanh=tanh,
                          coords_range=coords_range,
                          norm_constant=norm_constant, cross=cross,
                          norm_factor=norm_factor, mxu_dtype=mxu_dtype),
        out_shape=jax.ShapeDtypeStruct((bsz, n_pad, 3), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t, h), lambda bi, r, ci: (bi, r, 0)),
            pl.BlockSpec((1, c, h), lambda bi, r, ci: (bi, ci, 0)),
            pl.BlockSpec((1, t, c), lambda bi, r, ci: (bi, r, ci)),
            pl.BlockSpec((1, t, c), lambda bi, r, ci: (bi, r, ci)),
            pl.BlockSpec((1, t, c), lambda bi, r, ci: (bi, r, ci)),
            pl.BlockSpec((1, t, 3), lambda bi, r, ci: (bi, r, 0)),
            pl.BlockSpec((1, c, 3), lambda bi, r, ci: (bi, ci, 0)),
            pl.BlockSpec((1, 1, 3), lambda bi, r, ci: (bi, 0, 0)),
            pl.BlockSpec((2, h), lambda bi, r, ci: (0, 0)),
            pl.BlockSpec((h, h), lambda bi, r, ci: (0, 0)),
            pl.BlockSpec((h,), lambda bi, r, ci: (0,)),
            pl.BlockSpec((h, 1), lambda bi, r, ci: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, 3), lambda bi, r, ci: (bi, r, 0)),
        interpret=interpret,
    )(a_p, b_p, d2c_p, d2i_p, adj_p, xr_p, xc_p, center, we, w2, b2, wout)
    return out[:, :n]
