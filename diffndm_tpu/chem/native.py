"""ctypes bindings for the native chemistry graph-builder
(native/chemgraph.cpp).  Falls back to the pure-Python implementations
when the shared library has not been built."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native",
        "libchemgraph.so")


def load(build_if_missing: bool = True) -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    src = os.path.join(os.path.dirname(path), "chemgraph.cpp")
    stale = (os.path.exists(path) and os.path.exists(src)
             and os.path.getmtime(src) > os.path.getmtime(path))
    if (not os.path.exists(path) or stale) and build_if_missing:
        script = os.path.join(os.path.dirname(path), "build.sh")
        try:
            subprocess.run(["sh", script], check=True, capture_output=True,
                           timeout=120)
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.cg_find_rings.restype = ctypes.c_int
    lib.cg_find_rings.argtypes = [
        ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int]
    lib.cg_connectivity.restype = None
    lib.cg_connectivity.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_float,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")]
    _LIB = lib
    return lib


def available() -> bool:
    return load() is not None


def find_rings_native(n: int, bonds: Sequence[Tuple[int, int]],
                      max_rings: int = 64, max_len: int = 32
                      ) -> Optional[List[List[int]]]:
    lib = load()
    if lib is None:
        return None
    m = len(bonds)
    edges = np.asarray(bonds, np.int32).reshape(m, 2) if m else \
        np.zeros((0, 2), np.int32)
    out_rings = np.full((max_rings, max_len), -1, np.int32)
    out_sizes = np.zeros((max_rings,), np.int32)
    k = lib.cg_find_rings(n, m, np.ascontiguousarray(edges.reshape(-1)),
                          out_rings.reshape(-1), out_sizes, max_rings,
                          max_len)
    return [out_rings[i, :out_sizes[i]].tolist() for i in range(k)]


def connectivity_native(coords: np.ndarray, types: np.ndarray,
                        mask: np.ndarray, bonds1: np.ndarray,
                        margin: float = 3.0) -> Optional[np.ndarray]:
    """Batched connectivity: coords [B,N,3] A, types [B,N], mask [B,N],
    bonds1 [T,T] pm -> conn [B,N,N] uint8 or None if lib unavailable."""
    lib = load()
    if lib is None:
        return None
    b, n = types.shape
    t = bonds1.shape[0]
    out = np.zeros((b, n, n), np.uint8)
    lib.cg_connectivity(
        np.ascontiguousarray(coords, np.float32).reshape(-1),
        np.ascontiguousarray(types, np.int32).reshape(-1),
        np.ascontiguousarray(mask, np.uint8).reshape(-1),
        b, n, t, np.ascontiguousarray(bonds1, np.float32).reshape(-1),
        np.float32(margin), out.reshape(-1))
    return out
