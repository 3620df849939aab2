"""AdjustNet: the RL noise-adjustment policy.

A 2-layer MLP over per-node latents (reference conditional_model.py:29-41)
with its own Adam optimizer (lr 1e-3, :26-27), trained by REINFORCE after
each generation (:1463-1485).  Checkpoints use the reference's flat format:
``adjust_net.*`` weight keys plus ``optimizer_state_dict``
(save_checkpoint, :687-712) serialized as .npz.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from diffndm_tpu.config import RLConfig


class AdjustNet(nn.Module):
    input_dim: int = 13
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, zt: jnp.ndarray) -> jnp.ndarray:
        h = nn.relu(nn.Dense(self.hidden_dim, name="fc1")(zt))
        return nn.Dense(self.input_dim, name="fc2")(h)


class AdjustNetState:
    """Policy parameters + Adam state + update/checkpoint helpers."""

    def __init__(self, cfg: RLConfig, key: Optional[jax.Array] = None):
        self.cfg = cfg
        self.module = AdjustNet(cfg.input_dim, cfg.hidden_dim)
        key = key if key is not None else jax.random.PRNGKey(0)
        self.params = self.module.init(
            key, jnp.zeros((1, 1, cfg.input_dim)))
        self.tx = optax.adam(cfg.lr)
        self.opt_state = self.tx.init(self.params)

    def apply_fn(self):
        module, params = self.module, self.params

        def fn(z):
            return module.apply(params, z)
        return fn

    def reinforce_update(self, reward: float, avg_log_prob: float
                         ) -> float:
        """REINFORCE step: loss = reward * avg_log_prob * scale
        (conditional_model.py:1463-1478).  avg_log_prob must be recomputed
        differentiably; here the stored scalar is treated as the trajectory
        statistic and the gradient flows through a surrogate forward pass
        registered by the sampler (see sampler.rl_surrogate_loss)."""
        raise NotImplementedError(
            "use sampler.run_rl_update, which rebuilds the differentiable "
            "surrogate")

    # -- checkpoint (reference flat format, :687-721) ----------------------
    def save(self, path: str) -> None:
        flat = {}
        p = self.params["params"]
        flat["adjust_net.fc1.weight"] = np.asarray(p["fc1"]["kernel"]).T
        flat["adjust_net.fc1.bias"] = np.asarray(p["fc1"]["bias"])
        flat["adjust_net.fc2.weight"] = np.asarray(p["fc2"]["kernel"]).T
        flat["adjust_net.fc2.bias"] = np.asarray(p["fc2"]["bias"])
        leaves, _ = jax.tree.flatten(self.opt_state)
        for i, leaf in enumerate(leaves):
            flat[f"optimizer_state_dict.{i}"] = np.asarray(leaf)
        np.savez(path, **flat)

    def load(self, path: str) -> None:
        data = np.load(path, allow_pickle=False)
        p = {"fc1": {"kernel": jnp.asarray(data["adjust_net.fc1.weight"]).T,
                     "bias": jnp.asarray(data["adjust_net.fc1.bias"])},
             "fc2": {"kernel": jnp.asarray(data["adjust_net.fc2.weight"]).T,
                     "bias": jnp.asarray(data["adjust_net.fc2.bias"])}}
        self.params = {"params": p}
        opt_keys = sorted(
            (k for k in data.files if k.startswith("optimizer_state_dict.")),
            key=lambda k: int(k.split(".")[-1]))
        if opt_keys:
            leaves, treedef = jax.tree.flatten(self.tx.init(self.params))
            new_leaves = [jnp.asarray(data[k]) for k in opt_keys]
            if len(new_leaves) == len(leaves):
                self.opt_state = jax.tree.unflatten(treedef, new_leaves)

    @staticmethod
    def load_torch_state_dict(path: str, cfg: RLConfig) -> "AdjustNetState":
        """Load a reference .pth checkpoint (requires torch, cpu)."""
        import torch

        state = AdjustNetState(cfg)
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        p = {"fc1": {"kernel": jnp.asarray(
                         ckpt["adjust_net.fc1.weight"].numpy()).T,
                     "bias": jnp.asarray(
                         ckpt["adjust_net.fc1.bias"].numpy())},
             "fc2": {"kernel": jnp.asarray(
                         ckpt["adjust_net.fc2.weight"].numpy()).T,
                     "bias": jnp.asarray(
                         ckpt["adjust_net.fc2.bias"].numpy())}}
        state.params = {"params": p}
        return state
