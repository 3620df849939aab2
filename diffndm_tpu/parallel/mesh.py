"""Device mesh + sharding helpers.

The reference's only parallelism is optional Lightning DDP over GPUs
(train.py:152-153).  The TPU-native equivalent is a ``jax.sharding.Mesh``
with a ``data`` axis: parameters replicated, batches sharded on the sample
axis, gradients all-reduced by XLA-inserted psums — no wrapper framework.
A ``model`` axis is kept in the mesh shape for future tensor sharding of
the EGNN hidden dimension (unused at this model scale, SURVEY §2).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    mesh_devices = np.asarray(devices[: n_data * n_model]).reshape(
        n_data, n_model)
    return Mesh(mesh_devices, ("data", "model"))


def batch_spec() -> P:
    """Shard the leading (sample) axis across the data axis."""
    return P("data")


def shard_batch(mesh: Mesh, tree):
    """Place a pytree of [B, ...] arrays with B sharded over 'data'."""
    def put(x):
        spec = P("data") if getattr(x, "ndim", 0) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (parameters, optimizer state)."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
