"""Core batch containers.

The reference passes ``{'x': [N,3], 'one_hot': [N,F], 'size': [B],
'mask': [N]}`` dicts of flat arrays (reference dataset.py:52-70,
lightning_modules.py:221-238). Here a batch is a pair of padded pytrees with
static shapes so the whole sampler jits once.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class NodeBatch(NamedTuple):
    """A padded batch of point clouds.

    x:    [B, N, 3]   coordinates (padded entries zero)
    h:    [B, N, F]   node features / one-hot types (padded entries zero)
    mask: [B, N]      1.0 for real nodes, 0.0 for padding
    """

    x: jnp.ndarray
    h: jnp.ndarray
    mask: jnp.ndarray

    @property
    def size(self) -> jnp.ndarray:
        """Number of real nodes per sample, [B]."""
        return jnp.sum(self.mask, axis=1)

    @property
    def xh(self) -> jnp.ndarray:
        return jnp.concatenate([self.x, self.h], axis=-1)

    def replace_xh(self, xh: jnp.ndarray) -> "NodeBatch":
        m = self.mask[..., None].astype(xh.dtype)
        return NodeBatch(x=xh[..., :3] * m, h=xh[..., 3:] * m, mask=self.mask)


def pad_to(n: int, multiple: int) -> int:
    """Round up to a padding bucket (lane-friendly multiples)."""
    return int(-(-n // multiple) * multiple)


def from_lists(coords_list, onehot_list, n_max: int | None = None,
               pad_multiple: int = 8, dtype=np.float32) -> NodeBatch:
    """Build a padded NodeBatch from per-sample numpy arrays."""
    sizes = [len(c) for c in coords_list]
    if n_max is None:
        n_max = pad_to(max(sizes), pad_multiple)
    b = len(coords_list)
    f = onehot_list[0].shape[1]
    x = np.zeros((b, n_max, 3), dtype=dtype)
    h = np.zeros((b, n_max, f), dtype=dtype)
    mask = np.zeros((b, n_max), dtype=dtype)
    for i, (c, o) in enumerate(zip(coords_list, onehot_list)):
        n = len(c)
        x[i, :n] = c
        h[i, :n] = o
        mask[i, :n] = 1.0
    return NodeBatch(x=jnp.asarray(x), h=jnp.asarray(h), mask=jnp.asarray(mask))


def to_lists(batch: NodeBatch):
    """Split a padded batch back into per-sample (coords, type_idx) numpy
    arrays — the host-side decode used before molecule building."""
    x = np.asarray(jax.device_get(batch.x))
    h = np.asarray(jax.device_get(batch.h))
    mask = np.asarray(jax.device_get(batch.mask)) > 0.5
    out = []
    for i in range(x.shape[0]):
        m = mask[i]
        out.append((x[i][m], h[i][m].argmax(axis=-1)))
    return out


def repeat_batch(batch: NodeBatch, k: int) -> NodeBatch:
    """Tile a batch k times along the sample axis ([B] -> [k*B])."""
    return jax.tree.map(lambda a: jnp.tile(a, (k,) + (1,) * (a.ndim - 1)),
                        batch)


def pad_nodes(batch: NodeBatch, n_target: int) -> NodeBatch:
    """Grow the node axis to n_target with zero padding."""
    n = batch.x.shape[1]
    if n >= n_target:
        return batch
    pad = [(0, 0), (0, n_target - n)]
    return NodeBatch(x=jnp.pad(batch.x, pad + [(0, 0)]),
                     h=jnp.pad(batch.h, pad + [(0, 0)]),
                     mask=jnp.pad(batch.mask, pad))


def concat_batches(batches) -> NodeBatch:
    """Concatenate NodeBatches along the sample axis, padding node counts
    to the largest bucket (multi-pocket device batching)."""
    n_max = max(b.x.shape[1] for b in batches)
    padded = [pad_nodes(b, n_max) for b in batches]
    return NodeBatch(x=jnp.concatenate([b.x for b in padded]),
                     h=jnp.concatenate([b.h for b in padded]),
                     mask=jnp.concatenate([b.mask for b in padded]))
