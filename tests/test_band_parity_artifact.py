"""Pins the committed band-approximation parity artifact
(examples/band_parity.json, produced by scripts/band_parity_eval.py on
the TPU at flagship shapes).  bench.py's default guided band
(BENCH_GUIDED_BAND=128) is licensed by these claims — if the artifact is
regenerated and quality degraded, this fails and the default must revert
to exact."""

import json
import os

import pytest

ART = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples", "band_parity.json")


def test_band_parity_claims():
    if not os.path.exists(ART):
        pytest.skip("band_parity.json not generated yet")
    with open(ART) as f:
        d = json.load(f)
    assert d["model"] == "flagship"
    assert d["band_approx_window"] <= 128
    assert d["T"] >= 500
    # unguided full trajectory: no decoded-type flips, bounded coord RMS
    # (round-3 measured 0.18-0.20 A at W=128; the committed artifact
    # measures 0.064 A)
    assert d["unguided"]["type_flips"] == 0
    assert d["unguided"]["coord_rms_angstrom"] < 0.5
    # guided: ATP/hybrid selection is a discrete top-k, so exact-vs-
    # approx trajectories branch and pointwise RMS is meaningless (the
    # first committed artifact measured 63 A RMS between runs whose
    # decoded quality was equivalent); the license is DECODED QUALITY
    # parity with the trained checkpoint (same keys, T covering every
    # guidance event), added to the artifact by
    # scripts/band_parity_eval.py --guided_only once the TPU tunnel is
    # reachable (the round-4 regen lost the backend mid-run).
    g = d.get("guided_quality")
    if g is None:
        pytest.skip("guided_quality section pending regeneration "
                    "(band_parity_eval.py --guided_only)")
    # One-sided bounds: the license is that the approximation does not
    # DEGRADE decoded quality (delta = approx - exact, so degradation is
    # negative).  Approx scoring higher than exact is trajectory noise in
    # the favorable direction and needs no license.  Means are pooled
    # over >= 3 seeds per mode (single-seed SA spread measured ~0.09
    # because ATP top-k correlates the whole batch).
    assert g["exact"].get("seeds", 1) >= 3, g
    assert g["valid_delta"] >= -0.10, g
    assert g["qed_delta"] >= -0.05, g
    assert g["sa_delta"] >= -0.05, g
