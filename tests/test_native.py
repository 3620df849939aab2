"""Native C++ graph-builder: parity with the Python reference
implementations and oracle integration."""

import numpy as np
import pytest

from diffndm_tpu.chem import native
from diffndm_tpu.chem.rings import _find_rings_py, find_rings
from diffndm_tpu.constants import dataset_params

DP = dataset_params["crossdock_full"]

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


def graphs():
    yield 6, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0)]  # benzene
    yield 10, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0), (4, 6),
               (6, 7), (7, 8), (8, 9), (9, 5)]  # naphthalene
    yield 5, [(0, 1), (1, 2), (2, 3)]  # chain, no rings
    yield 7, [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (5, 6)]
    yield 4, []


def test_rings_parity():
    for n, bonds in graphs():
        py = sorted(sorted(r) for r in _find_rings_py(n, bonds))
        cc = sorted(sorted(r) for r in native.find_rings_native(n, bonds))
        assert py == cc, (n, bonds)


def test_rings_random_parity(rng):
    # molecule-like sparsity (mean degree <= ~2.6); on dense torture
    # graphs both SSSR approximations may legitimately pick different
    # (equally sized) basis sets
    for trial in range(25):
        n = int(rng.integers(4, 24))
        m = int(rng.integers(0, int(n * 1.3)))
        es = set()
        for _ in range(m):
            i, j = rng.integers(0, n, 2)
            if i != j:
                es.add((min(i, j), max(i, j)))
        bonds = sorted(es)
        py = _find_rings_py(n, bonds)
        cc = native.find_rings_native(n, bonds)
        # same ring count and same multiset of ring sizes
        assert sorted(len(r) for r in py) == sorted(len(r) for r in cc), \
            (n, bonds)


def test_connectivity_matches_numpy(rng):
    from diffndm_tpu.constants import MARGIN1

    B, N = 8, 16
    coords = np.cumsum(rng.normal(scale=0.9, size=(B, N, 3)),
                       axis=1).astype(np.float32)
    types = rng.integers(0, 4, (B, N)).astype(np.int32)
    mask = (rng.uniform(size=(B, N)) > 0.2).astype(np.uint8)
    conn = native.connectivity_native(coords, types, mask, DP["bonds1"])
    b1 = np.asarray(DP["bonds1"])
    for b in range(B):
        d = np.linalg.norm(coords[b][:, None] - coords[b][None], axis=-1)
        thr = b1[types[b][:, None], types[b][None, :]]
        want = (d * 100 < thr + MARGIN1) & (thr > 0)
        want &= mask[b][:, None].astype(bool) & mask[b][None, :].astype(bool)
        np.fill_diagonal(want, False)
        np.testing.assert_array_equal(conn[b].astype(bool), want)
