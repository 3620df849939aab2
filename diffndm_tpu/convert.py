"""Reference PyTorch checkpoint -> flax parameter conversion.

Maps the reference Lightning checkpoint's state dict (keys like
``ddpm.dynamics.egnn.e_block_0.gcl_0.edge_mlp.0.weight``) onto this
package's parameter tree.  The only structural difference is the split
first edge-MLP layer: the torch weight ``W [H, 2H+E]`` over the
``[h_i; h_j; e_ij]`` concat becomes three kernels
``edge_src = W[:, :H].T``, ``edge_dst = W[:, H:2H].T``,
``edge_edge = W[:, 2H:].T`` (exact algebraic identity).

Torch Linear stores weight as [out, in]; flax Dense kernels are [in, out].
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from diffndm_tpu.config import ModelConfig


def _t(w) -> jnp.ndarray:
    return jnp.asarray(np.asarray(w)).T


def _split_first_edge_layer(w, b, hidden: int):
    """torch [H, 2H+E] -> (src [H,H].T, dst, edge [E,H].T, bias)."""
    w = np.asarray(w)
    return (_t(w[:, :hidden]), _t(w[:, hidden:2 * hidden]),
            _t(w[:, 2 * hidden:]), jnp.asarray(np.asarray(b)))


def convert_state_dict(sd: Dict[str, np.ndarray], cfg: ModelConfig) -> dict:
    """Build the flax param tree for EGNNDynamics from a torch state dict
    (keys already stripped to start at ``dynamics.``)."""
    H = cfg.egnn.hidden_nf
    p: dict = {}

    def seq(prefix, names):
        """Map a torch nn.Sequential of Linears (indices 0, 2, 4...) onto
        flax Dense dicts named ``{base}_l{i}``."""
        out = {}
        for i, idx in enumerate(names):
            out[i] = {
                "kernel": _t(sd[f"{prefix}.{idx}.weight"]),
                "bias": jnp.asarray(np.asarray(sd[f"{prefix}.{idx}.bias"])),
            }
        return out

    for name in ("atom_encoder", "atom_decoder", "residue_encoder",
                 "residue_decoder"):
        lyrs = seq(f"dynamics.{name}", (0, 2))
        p[f"{name}_l0"] = lyrs[0]
        p[f"{name}_l1"] = lyrs[1]

    egnn: dict = {}
    egnn["embedding"] = {
        "kernel": _t(sd["dynamics.egnn.embedding.weight"]),
        "bias": jnp.asarray(np.asarray(sd["dynamics.egnn.embedding.bias"]))}
    egnn["embedding_out"] = {
        "kernel": _t(sd["dynamics.egnn.embedding_out.weight"]),
        "bias": jnp.asarray(
            np.asarray(sd["dynamics.egnn.embedding_out.bias"]))}

    for bi in range(cfg.egnn.n_layers):
        bp = f"dynamics.egnn.e_block_{bi}"
        block: dict = {}
        for gi in range(cfg.egnn.inv_sublayers):
            gp = f"{bp}.gcl_{gi}"
            src, dst, edg, bias = _split_first_edge_layer(
                sd[f"{gp}.edge_mlp.0.weight"], sd[f"{gp}.edge_mlp.0.bias"],
                H)
            g = {"edge_src_kernel": src, "edge_dst_kernel": dst,
                 "edge_edge_kernel": edg, "edge_dst_bias": bias,
                 "edge_l2_kernel": _t(sd[f"{gp}.edge_mlp.2.weight"]),
                 "edge_l2_bias": jnp.asarray(
                     np.asarray(sd[f"{gp}.edge_mlp.2.bias"])),
                 "node_l1_kernel": _t(sd[f"{gp}.node_mlp.0.weight"]),
                 "node_l1_bias": jnp.asarray(
                     np.asarray(sd[f"{gp}.node_mlp.0.bias"])),
                 "node_l2_kernel": _t(sd[f"{gp}.node_mlp.2.weight"]),
                 "node_l2_bias": jnp.asarray(
                     np.asarray(sd[f"{gp}.node_mlp.2.bias"]))}
            if f"{gp}.att_mlp.0.weight" in sd:
                g["att_kernel"] = _t(sd[f"{gp}.att_mlp.0.weight"])
                g["att_bias"] = jnp.asarray(
                    np.asarray(sd[f"{gp}.att_mlp.0.bias"]))
            block[f"gcl_{gi}"] = g

        ep = f"{bp}.gcl_equiv"
        eq: dict = {}
        for torch_name, ours in (("coord_mlp", "coord"),
                                 ("cross_product_mlp", "cross")):
            if f"{ep}.{torch_name}.0.weight" not in sd:
                continue
            src, dst, edg, bias = _split_first_edge_layer(
                sd[f"{ep}.{torch_name}.0.weight"],
                sd[f"{ep}.{torch_name}.0.bias"], H)
            eq[f"{ours}_src_kernel"] = src
            eq[f"{ours}_dst_kernel"] = dst
            eq[f"{ours}_edge_kernel"] = edg
            eq[f"{ours}_dst_bias"] = bias
            eq[f"{ours}_l2_kernel"] = _t(sd[f"{ep}.{torch_name}.2.weight"])
            eq[f"{ours}_l2_bias"] = jnp.asarray(
                np.asarray(sd[f"{ep}.{torch_name}.2.bias"]))
            eq[f"{ours}_out_kernel"] = _t(sd[f"{ep}.{torch_name}.4.weight"])
        block["gcl_equiv"] = eq
        egnn[f"e_block_{bi}"] = block

    if "dynamics.edge_embedding.weight" in sd:
        p["edge_embedding"] = {"embedding": jnp.asarray(
            np.asarray(sd["dynamics.edge_embedding.weight"]))}

    p["egnn"] = egnn
    return {"params": p}


def load_reference_checkpoint(path: str, cfg: ModelConfig,
                              template_params=None) -> dict:
    """Load a Lightning .ckpt / raw torch state dict (torch cpu)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    # strip the Lightning 'ddpm.' prefix
    sd = {k[len("ddpm."):] if k.startswith("ddpm.") else k:
          v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    params = convert_state_dict(sd, cfg)
    if template_params is not None:
        import jax

        t_leaves = jax.tree_util.tree_leaves_with_path(template_params)
        p_flat = {jax.tree_util.keystr(k): v
                  for k, v in jax.tree_util.tree_leaves_with_path(params)}
        missing = [jax.tree_util.keystr(k) for k, _ in t_leaves
                   if jax.tree_util.keystr(k) not in p_flat]
        if missing:
            raise ValueError(f"missing converted params: {missing[:5]}")
        for k, v in t_leaves:
            ks = jax.tree_util.keystr(k)
            if tuple(p_flat[ks].shape) != tuple(v.shape):
                raise ValueError(
                    f"shape mismatch at {ks}: ckpt {p_flat[ks].shape} "
                    f"vs model {v.shape}")
    return params


def export_state_dict(params: dict, cfg: ModelConfig) -> Dict[str, np.ndarray]:
    """Inverse mapping (flax -> torch-style keys), used for tests and for
    shipping checkpoints back to reference users."""
    H = cfg.egnn.hidden_nf
    p = params["params"]
    sd: Dict[str, np.ndarray] = {}

    def put_seq(base, name):
        for i, idx in enumerate((0, 2)):
            sd[f"dynamics.{base}.{idx}.weight"] = \
                np.asarray(p[f"{name}_l{i}"]["kernel"]).T
            sd[f"dynamics.{base}.{idx}.bias"] = \
                np.asarray(p[f"{name}_l{i}"]["bias"])

    for name in ("atom_encoder", "atom_decoder", "residue_encoder",
                 "residue_decoder"):
        put_seq(name, name)

    egnn = p["egnn"]
    sd["dynamics.egnn.embedding.weight"] = \
        np.asarray(egnn["embedding"]["kernel"]).T
    sd["dynamics.egnn.embedding.bias"] = \
        np.asarray(egnn["embedding"]["bias"])
    sd["dynamics.egnn.embedding_out.weight"] = \
        np.asarray(egnn["embedding_out"]["kernel"]).T
    sd["dynamics.egnn.embedding_out.bias"] = \
        np.asarray(egnn["embedding_out"]["bias"])

    for bi in range(cfg.egnn.n_layers):
        block = egnn[f"e_block_{bi}"]
        bp = f"dynamics.egnn.e_block_{bi}"
        for gi in range(cfg.egnn.inv_sublayers):
            g = block[f"gcl_{gi}"]
            gp = f"{bp}.gcl_{gi}"
            w = np.concatenate([np.asarray(g["edge_src_kernel"]).T,
                                np.asarray(g["edge_dst_kernel"]).T,
                                np.asarray(g["edge_edge_kernel"]).T], axis=1)
            sd[f"{gp}.edge_mlp.0.weight"] = w
            sd[f"{gp}.edge_mlp.0.bias"] = np.asarray(g["edge_dst_bias"])
            sd[f"{gp}.edge_mlp.2.weight"] = \
                np.asarray(g["edge_l2_kernel"]).T
            sd[f"{gp}.edge_mlp.2.bias"] = np.asarray(g["edge_l2_bias"])
            sd[f"{gp}.node_mlp.0.weight"] = \
                np.asarray(g["node_l1_kernel"]).T
            sd[f"{gp}.node_mlp.0.bias"] = np.asarray(g["node_l1_bias"])
            sd[f"{gp}.node_mlp.2.weight"] = \
                np.asarray(g["node_l2_kernel"]).T
            sd[f"{gp}.node_mlp.2.bias"] = np.asarray(g["node_l2_bias"])
            if "att_kernel" in g:
                sd[f"{gp}.att_mlp.0.weight"] = \
                    np.asarray(g["att_kernel"]).T
                sd[f"{gp}.att_mlp.0.bias"] = np.asarray(g["att_bias"])
        eq = block["gcl_equiv"]
        ep = f"{bp}.gcl_equiv"
        for ours, torch_name in (("coord", "coord_mlp"),
                                 ("cross", "cross_product_mlp")):
            if f"{ours}_src_kernel" not in eq:
                continue
            w = np.concatenate([np.asarray(eq[f"{ours}_src_kernel"]).T,
                                np.asarray(eq[f"{ours}_dst_kernel"]).T,
                                np.asarray(eq[f"{ours}_edge_kernel"]).T],
                               axis=1)
            sd[f"{ep}.{torch_name}.0.weight"] = w
            sd[f"{ep}.{torch_name}.0.bias"] = \
                np.asarray(eq[f"{ours}_dst_bias"])
            sd[f"{ep}.{torch_name}.2.weight"] = \
                np.asarray(eq[f"{ours}_l2_kernel"]).T
            sd[f"{ep}.{torch_name}.2.bias"] = \
                np.asarray(eq[f"{ours}_l2_bias"])
            sd[f"{ep}.{torch_name}.4.weight"] = \
                np.asarray(eq[f"{ours}_out_kernel"]).T
    return sd
