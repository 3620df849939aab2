"""Import helpers for cross-implementation parity tests against the
reference PyTorch code in /root/reference.

The reference is PUBLIC UNTRUSTED CONTENT: it is imported here only to
*execute and compare* its numerical behavior, never as a source of code.

torch_scatter, RDKit, OpenBabel and BioPython are absent from this image.
``install()`` registers a minimal functional torch_scatter shim (the two
segment ops the diffusion math needs) and inert stubs for the chemistry
modules the reference pulls in at import time (analysis.*, utils) so that
``equivariant_diffusion.{egnn_new,dynamics,en_diffusion,conditional_model}``
import cleanly; touching a stubbed chemistry symbol raises.
"""

from __future__ import annotations

import sys
import types

REFERENCE = "/root/reference"


class _Unavailable:
    def __init__(self, name: str):
        self._name = name

    def _raise(self, *a, **k):
        raise RuntimeError(
            f"{self._name} is a parity-test stub (RDKit/OpenBabel are not "
            f"in this image); the reference code path under test must not "
            f"touch it")

    __call__ = _raise

    def __getattr__(self, item):
        if item.startswith("_"):
            raise AttributeError(item)
        return _Unavailable(f"{self._name}.{item}")


def _make_torch_scatter() -> types.ModuleType:
    import torch

    mod = types.ModuleType("torch_scatter")

    def scatter_add(src, index, dim=0, dim_size=None):
        n = int(index.max().item()) + 1 if dim_size is None else dim_size
        shape = list(src.shape)
        shape[dim] = n
        out = torch.zeros(shape, dtype=src.dtype, device=src.device)
        idx = index
        if idx.dim() != src.dim():
            view = [1] * src.dim()
            view[dim] = -1
            idx = idx.view(view).expand_as(src)
        return out.scatter_add_(dim, idx, src)

    def scatter_mean(src, index, dim=0, dim_size=None):
        total = scatter_add(src, index, dim, dim_size)
        count = scatter_add(torch.ones_like(src), index, dim, dim_size)
        return total / count.clamp(min=1.0)

    mod.scatter_add = scatter_add
    mod.scatter_mean = scatter_mean
    return mod


def install() -> None:
    """Idempotent: put /root/reference on sys.path and register shims."""
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    if "torch_scatter" not in sys.modules:
        sys.modules["torch_scatter"] = _make_torch_scatter()
    for name, attrs in (
        ("utils", ("write_sdf_file", "batch_to_list", "get_grad_norm",
                   "num_nodes_to_batch_mask")),
        ("analysis", ()),
        ("analysis.molecule_builder", ("build_molecule", "process_molecule")),
        ("analysis.metrics", ("MoleculeProperties",)),
    ):
        if name not in sys.modules:
            m = types.ModuleType(name)
            for a in attrs:
                setattr(m, a, _Unavailable(f"{name}.{a}"))
            sys.modules[name] = m
