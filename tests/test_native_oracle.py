"""Native chemistry oracle (native/chemscore.cpp) vs the Python pipeline.

The native scorer is the production path for guidance reward populations
(one C call per batch); the Python chem stack is the reference
implementation.  These tests pin bitwise equality of the full reward
(bond perception -> sanitize -> QED/SA/LogP/Lipinski -> weighted sum)
on real drug-like molecules, noisy variants (the actual guidance
distribution: partially invalid), and pure-noise point clouds.
"""

import os

import numpy as np
import pytest

from diffndm_tpu.constants import dataset_params

DI = dataset_params["crossdock_full"]
ENC = DI["atom_encoder"]
REF_SDF = "/root/reference/example/3rfm_B_CFF.sdf"
WEIGHTS = (2.0, 3.0, 0.2, 1.0, -1.0, 4.0)  # exercises the sigmoid window


def _native_scorer():
    try:
        from diffndm_tpu.chem.native import NativeScorer

        return NativeScorer(DI)
    except Exception:
        pytest.skip("native scorer unavailable (no toolchain?)")


def _pad(items):
    n = max(len(t) for _, t in items)
    b = len(items)
    coords = np.zeros((b, n, 3), np.float32)
    types = np.zeros((b, n), np.int64)
    mask = np.zeros((b, n), np.float32)
    for i, (c, t) in enumerate(items):
        coords[i, : len(t)] = c
        types[i, : len(t)] = t
        mask[i, : len(t)] = 1
    return coords, types, mask


def _python_rewards(coords, types, mask, weights):
    from diffndm_tpu.guidance.oracle import RewardOracle

    oracle = RewardOracle(DI)
    oracle.native = None  # force the pure-Python pipeline
    onehot = np.eye(len(ENC), dtype=np.float32)[types]
    return oracle.score_batch_host(coords, onehot, mask, weights)


def _example_items():
    items = []
    if os.path.exists(REF_SDF):
        from diffndm_tpu.chem.io import read_sdf

        for m in read_sdf(REF_SDF):
            if all(s in ENC for s in m.symbols):
                items.append((np.asarray(m.coords, np.float32),
                              np.array([ENC[s] for s in m.symbols],
                                       np.int64)))
    # hand-built molecules: benzene ring + a small aliphatic chain
    theta = np.linspace(0, 2 * np.pi, 7)[:6]
    benz = np.stack([1.39 * np.cos(theta), 1.39 * np.sin(theta),
                     np.zeros(6)], -1).astype(np.float32)
    items.append((benz, np.zeros(6, np.int64)))  # C6 aromatic
    chain = np.stack([np.arange(5) * 1.52, np.zeros(5), np.zeros(5)],
                     -1).astype(np.float32)
    items.append((chain, np.array([0, 0, 2, 0, 1], np.int64)))  # C-C-O-C-N
    return items


def test_native_matches_python_on_molecules():
    ns = _native_scorer()
    items = _example_items()
    rng = np.random.default_rng(0)
    # noisy variants: the guidance-time distribution (partially invalid)
    items += [(c + rng.normal(size=c.shape).astype(np.float32) * s, t)
              for (c, t) in list(items) for s in (0.1, 0.4)]
    coords, types, mask = _pad(items)
    r_nat, nat_ok, terms = ns.score(coords, types, mask, WEIGHTS)
    r_py = _python_rewards(coords, types, mask, WEIGHTS)
    assert nat_ok.all()
    np.testing.assert_array_equal(r_nat, r_py.astype(np.float32))
    # at least the clean molecules must be valid and score > 0
    assert terms[0, 0] == 1.0
    assert r_nat[0] > 0


def test_native_matches_python_on_noise():
    ns = _native_scorer()
    rng = np.random.default_rng(1)
    items = [(rng.normal(size=(n, 3)).astype(np.float32) * 1.5,
              rng.integers(0, len(ENC), size=n).astype(np.int64))
             for n in (4, 9, 17, 26) for _ in range(8)]
    coords, types, mask = _pad(items)
    r_nat, nat_ok, _ = ns.score(coords, types, mask, WEIGHTS)
    r_py = _python_rewards(coords, types, mask, WEIGHTS)
    np.testing.assert_array_equal(r_nat[nat_ok],
                                  r_py.astype(np.float32)[nat_ok])


def test_oracle_uses_native_and_agrees():
    """RewardOracle's default path (native) must equal the forced-Python
    path through its public API."""
    _native_scorer()
    from diffndm_tpu.guidance.oracle import RewardOracle

    items = _example_items()
    coords, types, mask = _pad(items)
    onehot = np.eye(len(ENC), dtype=np.float32)[types]
    oracle = RewardOracle(DI)
    if oracle.native is None:
        pytest.skip("native scorer not active")
    r_nat = oracle.score_batch_host(coords, onehot, mask, WEIGHTS)
    oracle.native = None
    r_py = oracle.score_batch_host(coords, onehot, mask, WEIGHTS)
    np.testing.assert_array_equal(r_nat, r_py)


def test_matching_determinism_shared():
    """Kekulization ties must resolve identically on both paths: the
    Python perception uses the exported cg_max_matching when available
    (bonds.py), so rebuilt bond lists agree with the native scorer's."""
    from diffndm_tpu.chem.native import max_matching_native

    if max_matching_native(2, [(0, 1)]) is None:
        pytest.skip("native lib unavailable")
    # naphthalene-like fused aromatic: many maximum matchings exist
    m = max_matching_native(10, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5),
                                 (5, 0), (4, 6), (6, 7), (7, 8), (8, 9),
                                 (9, 5)])
    matched = [(i, int(m[i])) for i in range(10) if m[i] >= 0 and i < m[i]]
    assert len(matched) == 5  # perfect matching
    # repeated calls give the identical matching (determinism)
    m2 = max_matching_native(10, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5),
                                  (5, 0), (4, 6), (6, 7), (7, 8), (8, 9),
                                  (9, 5)])
    assert (m == m2).all()


def test_oversized_molecule_falls_back_to_python():
    """Molecules beyond the native scorer's bounds (n > 60) are flagged
    and routed through the Python pipeline by RewardOracle — the public
    reward is identical either way."""
    _native_scorer()
    from diffndm_tpu.guidance.oracle import RewardOracle

    n = 70
    coords = np.zeros((1, n, 3), np.float32)
    coords[0, :, 0] = np.arange(n) * 1.52  # long valid carbon chain
    types = np.zeros((1, n), np.int64)
    mask = np.ones((1, n), np.float32)
    onehot = np.eye(len(ENC), dtype=np.float32)[types]
    oracle = RewardOracle(DI)
    if oracle.native is None:
        pytest.skip("native scorer not active")
    _, nat_ok, _ = oracle.native.score(coords, types, mask, WEIGHTS)
    assert not nat_ok[0]
    r_mixed = oracle.score_batch_host(coords, onehot, mask, WEIGHTS)
    oracle.native = None
    r_py = oracle.score_batch_host(coords, onehot, mask, WEIGHTS)
    np.testing.assert_array_equal(r_mixed, r_py)


def test_connectivity_reward_term():
    """Opt-in w_connectivity (weights[7]) adds w * largest-fragment
    fraction and routes around the native scorer (which computes the
    reference's reward exactly and nothing more)."""
    from diffndm_tpu.chem.io import read_sdf
    from diffndm_tpu.chem.sanitize import connectivity_fraction
    from diffndm_tpu.guidance.oracle import RewardOracle

    mol = read_sdf(REF_SDF)[0]
    c1 = np.asarray(mol.coords, np.float32)
    t1 = np.asarray([ENC[s] for s in mol.symbols])
    # two copies of the same molecule 50 A apart: one valid molecule
    # whose largest fragment holds half the atoms
    c2 = np.concatenate([c1, c1 + 50.0])
    t2 = np.concatenate([t1, t1])
    coords, types, mask = _pad([(c1, t1), (c2, t2)])
    oracle = RewardOracle(DI)
    base = oracle.score_batch_types(coords, types, mask, WEIGHTS)
    w_conn = 0.7
    with_conn = oracle.score_batch_types(coords, types, mask,
                                         WEIGHTS + (0.0, w_conn))
    # connected molecule: bonus = w (fraction 1.0); the split molecule
    # (if it sanitizes) gets w * its largest-fragment fraction
    from diffndm_tpu.chem.bonds import build_molecule
    from diffndm_tpu.chem.sanitize import SanitizeError, sanitize

    for b, (cc, tt) in enumerate([(c1, t1), (c2, t2)]):
        try:
            m = build_molecule(cc, tt, DI)
            sanitize(m)
        except SanitizeError:
            assert with_conn[b] == base[b] == 0.0
            continue
        frac = connectivity_fraction(m)
        assert with_conn[b] == pytest.approx(base[b] + w_conn * frac,
                                             abs=1e-5)
    # sanity: at least the single-fragment row must be valid + full bonus
    assert with_conn[0] == pytest.approx(base[0] + w_conn, abs=1e-5)
