"""Virtual-node support.

Mirrors the reference's virtual-node machinery: the ``AppendVirtualNodes``
transform pads every ligand to a fixed size with atoms of a dedicated
'virtual' class placed around the ligand COM (utils.py:206-233), the loss
masks virtual atoms' coordinate error (handled via
DiffusionConfig.virtual_node_idx in diffusion/core.py and train/losses.py),
and decoded virtual atoms are stripped before molecule building
(lightning_modules.py:581-586).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from diffndm_tpu.data.dataset import LigandPocketPair
from diffndm_tpu.structs import NodeBatch


class AppendVirtualNodes:
    """Transform a LigandPocketPair so every ligand has exactly
    max_ligand_size atoms; extra atoms get the virtual one-hot class."""

    def __init__(self, max_ligand_size: int, atom_encoder: dict,
                 symbol: str = "others", seed: int = 0):
        self.max_ligand_size = max_ligand_size
        self.atom_encoder = atom_encoder
        self.vidx = atom_encoder[symbol]
        self.rng = np.random.default_rng(seed)

    def __call__(self, pair: LigandPocketPair) -> LigandPocketPair:
        n = len(pair.lig_coords)
        n_virt = self.max_ligand_size - n
        if n_virt <= 0:
            return pair
        mu = pair.lig_coords.mean(0, keepdims=True)
        sigma = float(pair.lig_coords.std(0).max())
        virt_coords = (self.rng.normal(size=(n_virt, 3)) * sigma
                       + mu).astype(pair.lig_coords.dtype)
        n_classes = len(self.atom_encoder)
        one_hot = pair.lig_one_hot
        if one_hot.shape[1] < n_classes:
            # insert the virtual class column
            one_hot = np.concatenate(
                [one_hot[:, :self.vidx],
                 np.zeros((n, 1), one_hot.dtype),
                 one_hot[:, self.vidx:]], axis=1)
        virt_one_hot = np.zeros((n_virt, n_classes), one_hot.dtype)
        virt_one_hot[:, self.vidx] = 1.0
        return LigandPocketPair(
            np.concatenate([pair.lig_coords, virt_coords]),
            np.concatenate([one_hot, virt_one_hot]),
            pair.pocket_coords, pair.pocket_one_hot, pair.name)


def strip_virtual_nodes(batch: NodeBatch, vidx: int) -> NodeBatch:
    """Zero out decoded virtual atoms so downstream molecule building
    ignores them (lightning_modules.py:581-586)."""
    import jax.numpy as jnp

    types = jnp.argmax(batch.h, axis=-1)
    keep = (types != vidx).astype(batch.mask.dtype) * batch.mask
    return NodeBatch(x=batch.x * keep[..., None],
                     h=batch.h * keep[..., None], mask=keep)
