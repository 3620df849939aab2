"""RDKit-compatible Morgan fingerprints and the exact Ertl SA pipeline.

The fpscores database (vendored chem/data/fpscores.npz, same content as the
reference's analysis/SA_Score/fpscores.pkl.gz) only contains genuine RDKit
radius<=2 Morgan bit IDs for ~700k common fragments — a wrong hash variant
hits it at ~0% (32-bit space, 1.6e-4 density), the right one at ~100% for
common drug molecules.  That makes the table itself the bit-exactness
oracle (no RDKit exists in this image)."""

import math

import pytest

from diffndm_tpu.chem.morgan import (connectivity_invariants, hash_combine,
                                     hash_range, morgan_counts)
from diffndm_tpu.chem.properties import (_fragment_score, _load_fpscores,
                                         _num_spiro_and_bridge,
                                         num_potential_stereocenters,
                                         sa_score_raw)
from diffndm_tpu.chem.smiles import parse_smiles


def test_hash_combine_boost_semantics():
    # seed ^= v + 0x9e3779b9 + (seed<<6) + (seed>>2), all mod 2**32
    assert hash_combine(0, 0) == 0x9E3779B9
    assert hash_combine(0, 1) == 0x9E3779BA
    s = hash_combine(0, 6)
    expected = s ^ ((4 + 0x9E3779B9 + ((s << 6) & 0xFFFFFFFF) + (s >> 2))
                    & 0xFFFFFFFF)
    assert hash_combine(s, 4) == expected
    assert hash_range([6, 4, 1, 0, 0, 1]) == \
        hash_combine(hash_combine(hash_combine(hash_combine(hash_combine(
            hash_combine(0, 6), 4), 1), 0), 0), 1)
    # negative ints cast to uint32 two's complement
    assert hash_combine(0, -1) == hash_combine(0, 0xFFFFFFFF)


def test_benzene_fingerprint_structure():
    # benzene: 3 distinct environments (atom, r1, r2), each with count 6
    fp = morgan_counts(parse_smiles("c1ccccc1"), 2)
    assert len(fp) == 3
    assert sorted(fp.values()) == [6, 6, 6]


def test_environment_dedup_two_atom_molecule():
    # ethanol CCO: 3 atom bits (count 1 each); r1: three distinct bond-set
    # envs; r2: every atom's env grows to {b0,b1}, which the center already
    # claimed at r1 -> all deduplicated away (RDKit does the same)
    fp = morgan_counts(parse_smiles("CCO"), 2)
    assert sum(fp.values()) == 3 + 3 + 0


def test_invariants_hit_fpscores_table():
    bits, _ = _load_fpscores()
    import numpy as np

    probes = ["c1ccccc1", "CC(=O)Oc1ccccc1C(=O)O", "CCO", "CCCC",
              "CC(=O)NC", "c1ccc2ccccc2c1", "c1ccncc1",
              "CC(C)Cc1ccc(cc1)C(C)C(=O)O", "CC(=O)Nc1ccc(O)cc1"]
    total = hit = 0
    for smi in probes:
        fp = morgan_counts(parse_smiles(smi), 2)
        ids = np.fromiter(fp.keys(), dtype=np.uint32)
        idx = np.minimum(np.searchsorted(bits, ids), len(bits) - 1)
        hit += int((bits[idx] == ids).sum())
        total += len(ids)
    assert hit / total > 0.97, (hit, total)


def test_fragment_score_known_easy_vs_hard():
    # common fragments score well above the -4 unknown default
    easy, _ = _fragment_score(parse_smiles("CC(=O)Oc1ccccc1C(=O)O"))
    assert easy > 0.0
    # cubane-like strained cage: rare fragments
    hard, _ = _fragment_score(parse_smiles("C1(C2C3C14)C5C4C3C25"))
    assert hard < easy - 1.0


def test_stereocenters():
    assert num_potential_stereocenters(parse_smiles("FC(Cl)Br")) == 1
    assert num_potential_stereocenters(parse_smiles("CC(C)C")) == 0
    assert num_potential_stereocenters(parse_smiles("CCO")) == 0
    # alanine backbone carbon (N, C(=O)O, C, H all distinct)
    assert num_potential_stereocenters(parse_smiles("CC(N)C(=O)O")) == 1
    # symmetric quaternary carbon: not a center
    assert num_potential_stereocenters(parse_smiles("CC(C)(C)C")) == 0
    # ring-symmetric: 4-position of N-methylpiperidine is not a center
    assert num_potential_stereocenters(parse_smiles("CN1CCC(CC1)O")) == 0


def test_spiro_and_bridgehead_counts():
    # norbornane: two 5-rings sharing a 2-bond path -> 2 bridgeheads
    spiro, bridge = _num_spiro_and_bridge(parse_smiles("C1CC2CCC1C2"))
    assert (spiro, bridge) == (0, 2)
    # spiropentane: two rings sharing exactly one atom
    spiro, bridge = _num_spiro_and_bridge(parse_smiles("C1CC12CC2"))
    assert (spiro, bridge) == (1, 0)
    # naphthalene: fused (1 shared bond) -> neither
    spiro, bridge = _num_spiro_and_bridge(parse_smiles("c1ccc2ccccc2c1"))
    assert (spiro, bridge) == (0, 0)


def test_sa_raw_scale_and_ordering():
    # ethanol is trivially synthesizable; a bridged stereo-dense cage is not
    easy = sa_score_raw(parse_smiles("CCO"))
    hard = sa_score_raw(parse_smiles("C1(C2C3C14)C5C4C3C25"))
    assert 1.0 <= easy < 4.0
    assert hard > easy + 1.0
    # macrocycle penalty moves the score up (plain cycloalkanes clamp to
    # the 1.0 floor, so compare substituted rings)
    small = sa_score_raw(parse_smiles("OC1CCCCC1N"))
    macro = sa_score_raw(parse_smiles("OC1CCCCCCCCCC1N"))
    assert macro > small


def test_hypervalent_implicit_h_ladder():
    # neutral hypervalent P/S climb the valence ladder like RDKit
    m = parse_smiles("CP(C)=O")  # P explicit valence 4 -> PH (valence 5)
    p = m.symbols.index("P")
    assert m.implicit_h(p) == 1
    m = parse_smiles("CS(C)=O")  # DMSO sulfur: valence 4, no H
    s = m.symbols.index("S")
    assert m.implicit_h(s) == 0
    m = parse_smiles("CSC")
    assert m.implicit_h(m.symbols.index("S")) == 0
