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
    srcs = [os.path.join(os.path.dirname(path), f)
            for f in ("chemgraph.cpp", "chemscore.cpp", "build.sh")]
    stale = os.path.exists(path) and any(
        os.path.exists(s) and os.path.getmtime(s) > os.path.getmtime(path)
        for s in srcs)
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
    if hasattr(lib, "cg_max_matching"):
        lib.cg_max_matching.restype = ctypes.c_int
        lib.cg_max_matching.argtypes = [
            ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")]
    if hasattr(lib, "cs_score_batch"):
        lib.cs_score_batch.restype = ctypes.c_int
        lib.cs_score_batch.argtypes = [
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")]
    _LIB = lib
    return lib


def max_matching_native(n: int, edges) -> Optional[np.ndarray]:
    """Deterministic maximum-cardinality matching (blossom) shared with the
    native scorer's kekulization; [n] match array (-1 unmatched) or None."""
    lib = load()
    if lib is None or not hasattr(lib, "cg_max_matching"):
        return None
    m = len(edges)
    e = (np.asarray(edges, np.int32).reshape(m, 2) if m
         else np.zeros((0, 2), np.int32))
    out = np.full((n,), -1, np.int32)
    lib.cg_max_matching(n, m, np.ascontiguousarray(e.reshape(-1)), out)
    return out


# element-code ABI shared with native/chemscore.cpp (enum Elem)
_ELEM_CODES = {"C": 0, "N": 1, "O": 2, "S": 3, "B": 4, "Br": 5, "Cl": 6,
               "P": 7, "I": 8, "F": 9}


class NativeScorer:
    """One-call-per-batch reward scoring (native/chemscore.cpp), the
    production path for guidance oracle populations.  Rows the native
    code cannot handle (>64 bonds) are flagged for the Python fallback."""

    def __init__(self, dataset_info: dict):
        from diffndm_tpu.chem.properties import _load_fpscores

        self.lib = load()
        if self.lib is None or not hasattr(self.lib, "cs_score_batch"):
            raise RuntimeError("native scorer unavailable")
        decoder = dataset_info["atom_decoder"]
        self.T = len(decoder)
        self.elem = np.array([_ELEM_CODES.get(s, 10) for s in decoder],
                             np.int32)
        # element types outside the 10-element ABI (H, Si, Hg, ... in a
        # future decoder) perceive with real OB radii on the Python path
        # but would collapse to the generic EL_OTHER entry natively —
        # route any row containing one through the Python fallback so
        # both paths stay equal for every decoder, not just crossdock
        self._non_abi = self.elem == 10
        self.b1 = np.ascontiguousarray(dataset_info["bonds1"], np.float64)
        self.b2 = np.ascontiguousarray(dataset_info["bonds2"], np.float64)
        self.b3 = np.ascontiguousarray(dataset_info["bonds3"], np.float64)
        bits, scores = _load_fpscores()
        self.fp_bits = np.ascontiguousarray(bits, np.uint32)
        self.fp_scores = np.ascontiguousarray(scores, np.float32)

    def score(self, coords: np.ndarray, types: np.ndarray,
              mask: np.ndarray, weights) -> tuple:
        """coords [B,N,3] A, types [B,N], mask [B,N] ->
        (rewards [B] f32, native [B] bool, terms [B,6] f64)."""
        B, N = types.shape
        coords = np.ascontiguousarray(coords, np.float32)
        types = np.ascontiguousarray(types, np.int32)
        mask = np.ascontiguousarray(mask, np.uint8)
        w = np.asarray(list(weights[:6]), np.float64)
        rewards = np.zeros((B,), np.float32)
        terms = np.zeros((B, 6), np.float64)
        native = np.zeros((B,), np.uint8)
        self.lib.cs_score_batch(
            coords.reshape(-1), types.reshape(-1), mask.reshape(-1),
            B, N, self.T, self.elem, self.b1.reshape(-1),
            self.b2.reshape(-1), self.b3.reshape(-1), self.fp_bits,
            self.fp_scores, len(self.fp_bits), w, rewards,
            terms.reshape(-1), native)
        native = native.astype(bool)
        if self._non_abi.any():
            native &= ~(self._non_abi[types] & (mask > 0)).any(axis=1)
        return rewards, native, terms


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
    """Batched EDM distance-table connectivity (generic parity utility,
    test-only): coords [B,N,3] A, types [B,N], mask [B,N], bonds1 [T,T]
    pm -> conn [B,N,N] uint8 or None if lib unavailable.  The production
    perception uses the OpenBabel ConnectTheDots rule instead
    (bonds.py::perceive_molecule / chemscore.cpp::perceive)."""
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
