"""Masked batch reductions.

The PyTorch reference batches variable-size point clouds as flat node arrays
with per-node integer segment ids and rides everything on
``torch_scatter.scatter_add/mean`` (reference egnn_new.py:319-335,
en_diffusion.py:924-951). On TPU we use padded dense batches ``[B, N, D]``
with boolean node masks ``[B, N]``: every "segment op" becomes a masked
reduction over the node axis, which XLA fuses into neighbouring element-wise
work for free — no scatters, no dynamic shapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_sum(x: jnp.ndarray, mask: jnp.ndarray, axis: int = 1,
               keepdims: bool = False) -> jnp.ndarray:
    """Sum of ``x`` over ``axis`` counting only entries where mask is set.

    x: [..., N, D]; mask: broadcastable to x's shape minus trailing dims
       (typically [B, N] against x [B, N, D]).
    """
    m = jnp.expand_dims(mask, -1) if mask.ndim == x.ndim - 1 else mask
    return jnp.sum(x * m.astype(x.dtype), axis=axis, keepdims=keepdims)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis: int = 1,
                keepdims: bool = False, eps: float = 1e-12) -> jnp.ndarray:
    """Masked mean over ``axis`` (replaces scatter_mean)."""
    m = jnp.expand_dims(mask, -1) if mask.ndim == x.ndim - 1 else mask
    m = m.astype(x.dtype)
    total = jnp.sum(x * m, axis=axis, keepdims=keepdims)
    count = jnp.sum(m, axis=axis, keepdims=keepdims)
    return total / jnp.maximum(count, eps)


def sum_except_batch(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Per-sample scalar: sum of all masked entries of x.

    Equivalent of reference ``sum_except_batch`` (en_diffusion.py:949-951):
    x [B, N, D], mask [B, N] -> [B].
    """
    return jnp.sum(x * mask[..., None].astype(x.dtype), axis=(-2, -1))


def remove_mean_ligand(x_lig: jnp.ndarray, x_pocket: jnp.ndarray,
                       lig_mask: jnp.ndarray, pocket_mask: jnp.ndarray):
    """Subtract the *ligand* centre of mass from both ligand and pocket
    coordinates (conditional-model convention,
    reference conditional_model.py:1793-1801).

    x_lig: [B, NL, 3], x_pocket: [B, NP, 3]; masks [B, NL] / [B, NP].
    """
    mean = masked_mean(x_lig, lig_mask, axis=1, keepdims=True)  # [B, 1, 3]
    x_lig = (x_lig - mean) * lig_mask[..., None].astype(x_lig.dtype)
    x_pocket = (x_pocket - mean) * pocket_mask[..., None].astype(x_pocket.dtype)
    return x_lig, x_pocket


def remove_mean_joint(x_lig: jnp.ndarray, x_pocket: jnp.ndarray,
                      lig_mask: jnp.ndarray, pocket_mask: jnp.ndarray):
    """Subtract the joint (ligand+pocket) centre of mass from both parts
    (joint-model convention, reference en_diffusion.py:924-928)."""
    ml = lig_mask[..., None].astype(x_lig.dtype)
    mp = pocket_mask[..., None].astype(x_pocket.dtype)
    total = jnp.sum(x_lig * ml, axis=1) + jnp.sum(x_pocket * mp, axis=1)
    count = jnp.sum(ml, axis=(1, 2)) + jnp.sum(mp, axis=(1, 2))
    mean = (total / jnp.maximum(count, 1e-12)[:, None])[:, None, :]
    return (x_lig - mean) * ml, (x_pocket - mean) * mp
