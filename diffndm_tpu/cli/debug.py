"""Debug utilities (reference debug.py / test_for_GPU_pytorch.py /
mine_RDKit.py): checkpoint key dump, device check, SDF summary."""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("devices", help="list JAX devices")
    c = sub.add_parser("ckpt", help="dump checkpoint keys")
    c.add_argument("path")
    s = sub.add_parser("sdf", help="summarize an SDF file")
    s.add_argument("path")
    args = p.parse_args(argv)

    if args.cmd == "devices":
        import jax

        print("backend:", jax.default_backend())
        for dev in jax.devices():
            print(" ", dev)
    elif args.cmd == "ckpt":
        import numpy as np

        if args.path.endswith((".ckpt", ".pth", ".pt")):
            import torch

            ckpt = torch.load(args.path, map_location="cpu",
                              weights_only=False)
            sd = ckpt.get("state_dict", ckpt)
            for k, v in sd.items():
                shape = tuple(v.shape) if hasattr(v, "shape") else type(v)
                print(k, shape)
        else:
            import jax
            import orbax.checkpoint as ocp

            restored = ocp.StandardCheckpointer().restore(args.path)
            for path, leaf in jax.tree_util.tree_leaves_with_path(restored):
                print(jax.tree_util.keystr(path), leaf.shape)
    elif args.cmd == "sdf":
        from diffndm_tpu.chem.io import read_sdf
        from diffndm_tpu.chem.sanitize import is_valid

        mols = read_sdf(args.path)
        for i, m in enumerate(mols):
            print(f"mol {i}: {m.n_atoms} atoms, {len(m.bonds)} bonds, "
                  f"{len(m.rings)} rings, valid={is_valid(m)}, "
                  f"formula={''.join(sorted(m.symbols))}")


if __name__ == "__main__":
    main()
