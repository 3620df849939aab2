"""E(n)-equivariant graph network over padded dense batches.

Functional parity with the reference EGNN stack (egnn_new.py:6-335) but
designed for the TPU memory system rather than translated from it:

- The flat edge list + ``unsorted_segment_sum`` scatter (egnn_new.py:319-335)
  becomes **masked dense message passing** over ``[B, N, N]`` adjacency.
  Aggregation is a plain masked sum over the neighbour axis, which XLA lowers
  to fused reductions — no scatters.
- The first edge-MLP layer is algebraically split: ``W @ [h_i; h_j; e_ij] =
  W_src h_i + W_dst h_j + W_e e_ij``, so the two O(N) projections run once
  per node on the MXU and only the cheap broadcast-add is O(N^2).
- The O(N^2 * H) message tensor is never fully materialized in HBM: rows are
  processed in tiles of ``row_tile`` nodes via ``lax.scan``, bounding peak
  memory at ``B * row_tile * N * H``.

Layer weights are explicit ``self.param`` arrays (not nested flax modules)
so the inner tile loop is pure jnp — scan-safe and easy to map onto a Pallas
kernel later.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffndm_tpu.config import EGNNConfig

_default_init = nn.initializers.lecun_normal()
_zeros = nn.initializers.zeros


def coord_diff(x_rows: jnp.ndarray, x: jnp.ndarray, norm_constant: float):
    """Pairwise squared distances and normalized difference vectors
    (cf. egnn_new.py:296-302).

    x_rows: [B, T, 3] (row tile), x: [B, N, 3]
    returns radial [B, T, N, 1], diff [B, T, N, 3]
    """
    d = x_rows[:, :, None, :] - x[:, None, :, :]
    radial = jnp.sum(d * d, axis=-1, keepdims=True)
    norm = jnp.sqrt(radial + 1e-8)
    return radial, d / (norm + norm_constant)


def coord_cross(x_rows: jnp.ndarray, x: jnp.ndarray, center: jnp.ndarray,
                norm_constant: float):
    """Pairwise cross products relative to the per-sample joint centre of
    mass (cf. egnn_new.py:305-316). Breaks reflection equivariance on
    purpose (reflection_equivariant: False in the crossdock config)."""
    a = x_rows - center  # [B, T, 3]
    b = x - center       # [B, N, 3]
    cross = jnp.cross(a[:, :, None, :], b[:, None, :, :])
    norm = jnp.linalg.norm(cross, axis=-1, keepdims=True)
    return cross / (norm + norm_constant)


def sinusoid_dims(max_res: float = 15.0, min_res: float = 15.0 / 2000.0,
                  div_factor: float = 4.0) -> int:
    return 2 * (int(math.log(max_res / min_res, div_factor)) + 1)


def sinusoid_embed(d2: jnp.ndarray, max_res: float = 15.0,
                   min_res: float = 15.0 / 2000.0, div_factor: float = 4.0):
    """Distance sinusoid embedding (cf. egnn_new.py:282-293)."""
    n_freq = int(math.log(max_res / min_res, div_factor)) + 1
    freqs = 2 * jnp.pi * (div_factor ** jnp.arange(n_freq)) / max_res
    emb = jnp.sqrt(d2 + 1e-8) * freqs
    return jax.lax.stop_gradient(
        jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1))


def _pad_rows(arr: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    n = arr.shape[1]
    if n_pad == n:
        return arr
    pad = [(0, 0), (0, n_pad - n)] + [(0, 0)] * (arr.ndim - 2)
    return jnp.pad(arr, pad)


def _tiling(n: int, row_tile: int):
    tile = min(row_tile, n)
    n_tiles = -(-n // tile)
    return tile, n_tiles, n_tiles * tile


def _linear(params, x):
    y = x @ params["kernel"]
    if "bias" in params:
        y = y + params["bias"]
    return y


class GCL(nn.Module):
    """Graph convolution layer: edge MLP + sigmoid attention + masked-sum
    aggregation + residual node MLP (cf. egnn_new.py:6-66)."""
    cfg: EGNNConfig
    edge_nf: int

    def _dense(self, name, din, dout, bias=True):
        p = {"kernel": self.param(f"{name}_kernel", _default_init,
                                  (din, dout))}
        if bias:
            p["bias"] = self.param(f"{name}_bias", _zeros, (dout,))
        return p

    @nn.compact
    def __call__(self, h, edge_attr_fn, adj, node_mask):
        """h: [B, N, H]; edge_attr_fn(i0, tile) -> [B, T, N, E];
        adj: [B, N, N] float edge mask. Returns updated h."""
        cfg = self.cfg
        H = cfg.hidden_nf
        dt = jnp.dtype(cfg.compute_dtype)

        w_src = self._dense("edge_src", H, H, bias=False)
        w_dst = self._dense("edge_dst", H, H, bias=True)
        w_edg = self._dense("edge_edge", self.edge_nf, H, bias=False)
        w_l2 = self._dense("edge_l2", H, H)
        w_att = self._dense("att", H, 1) if cfg.attention else None
        w_n1 = self._dense("node_l1", 2 * H, H)
        w_n2 = self._dense("node_l2", H, H)

        a = _linear(w_src, h.astype(dt))
        b = _linear(w_dst, h.astype(dt))

        n = h.shape[1]
        tile, n_tiles, n_pad = _tiling(n, cfg.row_tile)
        a_p = _pad_rows(a, n_pad)
        adj_p = _pad_rows(adj, n_pad)

        def body(_, i0):
            a_rows = jax.lax.dynamic_slice_in_dim(a_p, i0, tile, 1)
            e = edge_attr_fn(i0, tile).astype(dt)
            m = jax.nn.silu(a_rows[:, :, None, :] + b[:, None, :, :]
                            + _linear(w_edg, e))
            m = jax.nn.silu(_linear(w_l2, m))
            if w_att is not None:
                m = m * jax.nn.sigmoid(_linear(w_att, m))
            adj_rows = jax.lax.dynamic_slice_in_dim(adj_p, i0, tile, 1)
            agg = jnp.sum(m * adj_rows[..., None].astype(dt), axis=2)
            return None, agg

        _, aggs = jax.lax.scan(body, None,
                               jnp.arange(n_tiles, dtype=jnp.int32) * tile)
        agg = jnp.moveaxis(aggs, 0, 1).reshape(h.shape[0], n_pad, H)[:, :n]
        if cfg.aggregation_method == "sum":
            agg = agg / jnp.asarray(cfg.normalization_factor, dt)
        else:  # mean over actual neighbours
            deg = jnp.sum(adj, axis=2, keepdims=True)
            agg = agg / jnp.maximum(deg, 1.0).astype(dt)

        out = jax.nn.silu(_linear(
            w_n1, jnp.concatenate([h.astype(dt), agg], axis=-1)))
        h = h + _linear(w_n2, out).astype(h.dtype)
        return h * node_mask[..., None].astype(h.dtype)


class EquivariantUpdate(nn.Module):
    """Coordinate update with tanh-clamped radial weights and optional
    cross-product term (cf. egnn_new.py:69-132)."""
    cfg: EGNNConfig
    edge_nf: int
    coords_range: float

    def _dense(self, name, din, dout, bias=True, init=_default_init):
        p = {"kernel": self.param(f"{name}_kernel", init, (din, dout))}
        if bias:
            p["bias"] = self.param(f"{name}_bias", _zeros, (dout,))
        return p

    @nn.compact
    def __call__(self, h, x, edge_attr_fn, adj, node_mask,
                 update_coords_mask):
        cfg = self.cfg
        # per-sample joint centre of mass of the *current* coordinates for
        # the cross-product term (recomputed each block, egnn_new.py:305-310)
        mask_f = node_mask[..., None].astype(x.dtype)
        joint_center = (jnp.sum(x * mask_f, axis=1, keepdims=True)
                        / jnp.maximum(jnp.sum(mask_f, axis=1, keepdims=True),
                                      1e-12))
        H = cfg.hidden_nf
        dt = jnp.dtype(cfg.compute_dtype)
        # xavier_uniform with gain 1e-3 for the last layer (egnn_new.py:79)
        tiny = nn.initializers.variance_scaling(1e-6, "fan_avg", "uniform")

        w_src = self._dense("coord_src", H, H, bias=False)
        w_dst = self._dense("coord_dst", H, H, bias=True)
        w_edg = self._dense("coord_edge", self.edge_nf, H, bias=False)

        def mlp_params(name):
            return (self._dense(f"{name}_l2", H, H),
                    self._dense(f"{name}_out", H, 1, bias=False, init=tiny))

        coord_tail = mlp_params("coord")
        cross_tail = (None if cfg.reflection_equivariant
                      else mlp_params("cross"))
        w_csrc = w_cdst = w_cedg = None
        if cross_tail is not None:
            w_csrc = self._dense("cross_src", H, H, bias=False)
            w_cdst = self._dense("cross_dst", H, H, bias=True)
            w_cedg = self._dense("cross_edge", self.edge_nf, H, bias=False)

        a = _linear(w_src, h.astype(dt))
        b = _linear(w_dst, h.astype(dt))
        if cross_tail is not None:
            ac = _linear(w_csrc, h.astype(dt))
            bc = _linear(w_cdst, h.astype(dt))

        n = h.shape[1]
        tile, n_tiles, n_pad = _tiling(n, cfg.row_tile)
        a_p = _pad_rows(a, n_pad)
        x_p = _pad_rows(x, n_pad)
        adj_p = _pad_rows(adj, n_pad)
        ac_p = _pad_rows(ac, n_pad) if cross_tail is not None else None

        def tail(tail_params, z):
            z = jax.nn.silu(_linear(tail_params[0], z))
            return _linear(tail_params[1], z)

        def body(_, i0):
            x_rows = jax.lax.dynamic_slice_in_dim(x_p, i0, tile, 1)
            e = edge_attr_fn(i0, tile).astype(dt)
            a_rows = jax.lax.dynamic_slice_in_dim(a_p, i0, tile, 1)
            z = jax.nn.silu(a_rows[:, :, None, :] + b[:, None, :, :]
                            + _linear(w_edg, e))
            phi = tail(coord_tail, z)
            _, diff = coord_diff(x_rows.astype(dt), x.astype(dt),
                                 cfg.norm_constant)
            if cfg.tanh:
                trans = diff * jnp.tanh(phi) * self.coords_range
            else:
                trans = diff * phi
            if cross_tail is not None:
                ac_rows = jax.lax.dynamic_slice_in_dim(ac_p, i0, tile, 1)
                zc = jax.nn.silu(ac_rows[:, :, None, :] + bc[:, None, :, :]
                                 + _linear(w_cedg, e))
                phi_c = tail(cross_tail, zc)
                if cfg.tanh:
                    phi_c = jnp.tanh(phi_c) * self.coords_range
                cr = coord_cross(x_rows.astype(dt), x.astype(dt),
                                 joint_center.astype(dt), cfg.norm_constant)
                trans = trans + cr * phi_c
            adj_rows = jax.lax.dynamic_slice_in_dim(adj_p, i0, tile, 1)
            agg = jnp.sum(trans * adj_rows[..., None].astype(dt), axis=2)
            return None, agg

        _, aggs = jax.lax.scan(body, None,
                               jnp.arange(n_tiles, dtype=jnp.int32) * tile)
        agg = jnp.moveaxis(aggs, 0, 1).reshape(x.shape[0], n_pad, 3)[:, :n]
        if cfg.aggregation_method == "sum":
            agg = agg / jnp.asarray(cfg.normalization_factor, dt)
        else:
            deg = jnp.sum(adj, axis=2, keepdims=True)
            agg = agg / jnp.maximum(deg, 1.0).astype(dt)
        if update_coords_mask is not None:
            agg = agg * update_coords_mask.astype(dt)
        x = x + agg.astype(x.dtype)
        return x * node_mask[..., None].astype(x.dtype)


class EquivariantBlock(nn.Module):
    """inv_sublayers x GCL + one coordinate update
    (cf. egnn_new.py:135-184)."""
    cfg: EGNNConfig
    edge_nf: int
    coords_range: float

    @nn.compact
    def __call__(self, h, x, adj, node_mask, edge_attr0, update_coords_mask):
        cfg = self.cfg
        n = x.shape[1]
        tile0, _, n_pad = _tiling(n, cfg.row_tile)
        x_p = _pad_rows(x, n_pad)
        e0_p = _pad_rows(edge_attr0, n_pad)

        def edge_attr_fn(i0, tile):
            x_rows = jax.lax.dynamic_slice_in_dim(x_p, i0, tile, 1)
            radial, _ = coord_diff(x_rows, x, cfg.norm_constant)
            if cfg.sin_embedding:
                radial = sinusoid_embed(radial[..., 0])
            e0 = jax.lax.dynamic_slice_in_dim(e0_p, i0, tile, 1)
            return jnp.concatenate([radial, e0], axis=-1)

        for i in range(cfg.inv_sublayers):
            h = GCL(cfg, self.edge_nf, name=f"gcl_{i}")(
                h, edge_attr_fn, adj, node_mask)
        x = EquivariantUpdate(cfg, self.edge_nf, self.coords_range,
                              name="gcl_equiv")(
            h, x, edge_attr_fn, adj, node_mask, update_coords_mask)
        return h, x


class EGNN(nn.Module):
    """Full EGNN: embed -> n_layers equivariant blocks -> out-embed
    (cf. egnn_new.py:187-244)."""
    cfg: EGNNConfig
    in_node_nf: int
    out_node_nf: int
    in_edge_nf: int = 0

    @nn.compact
    def __call__(self, h, x, adj, node_mask, update_coords_mask=None,
                 edge_attr=None):
        """h: [B, N, in_node_nf]; x: [B, N, 3]; adj: [B, N, N];
        node_mask: [B, N]; edge_attr: optional [B, N, N, in_edge_nf].

        Returns (h_out [B, N, out_node_nf], x_out [B, N, 3]).
        """
        cfg = self.cfg
        coords_range_layer = float(cfg.coords_range) / cfg.n_layers
        dist_nf = sinusoid_dims() if cfg.sin_embedding else 1
        edge_nf = 2 * dist_nf + self.in_edge_nf

        # initial distances become a persistent edge feature
        radial0, _ = coord_diff(x, x, cfg.norm_constant)
        if cfg.sin_embedding:
            edge_attr0 = sinusoid_embed(radial0[..., 0])
        else:
            edge_attr0 = radial0
        if edge_attr is not None:
            edge_attr0 = jnp.concatenate([edge_attr0, edge_attr], axis=-1)

        h = nn.Dense(cfg.hidden_nf, name="embedding")(h)
        for i in range(cfg.n_layers):
            h, x = EquivariantBlock(cfg, edge_nf, coords_range_layer,
                                    name=f"e_block_{i}")(
                h, x, adj, node_mask, edge_attr0, update_coords_mask)
        h = nn.Dense(self.out_node_nf, name="embedding_out")(h)
        return h * node_mask[..., None].astype(h.dtype), x


class GNN(nn.Module):
    """Non-equivariant fallback operating on concatenated [x, h]
    (cf. egnn_new.py:247-279)."""
    cfg: EGNNConfig
    in_node_nf: int
    out_node_nf: int
    in_edge_nf: int = 0

    @nn.compact
    def __call__(self, xh, adj, node_mask, edge_attr=None):
        cfg = self.cfg
        n = xh.shape[1]
        tile0, _, n_pad = _tiling(n, cfg.row_tile)
        e_p = (None if edge_attr is None else _pad_rows(edge_attr, n_pad))

        def edge_attr_fn(i0, tile):
            if e_p is None:
                return jnp.zeros((xh.shape[0], tile, n, 0), xh.dtype)
            return jax.lax.dynamic_slice_in_dim(e_p, i0, tile, 1)

        h = nn.Dense(cfg.hidden_nf, name="embedding")(xh)
        for i in range(cfg.n_layers):
            h = GCL(cfg, self.in_edge_nf, name=f"gcl_{i}")(
                h, edge_attr_fn, adj, node_mask)
        h = nn.Dense(self.out_node_nf, name="embedding_out")(h)
        return h * node_mask[..., None].astype(h.dtype)
