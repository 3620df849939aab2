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
    # (round-3 measured 0.18-0.20 A at W=128)
    assert d["unguided"]["type_flips"] == 0
    assert d["unguided"]["coord_rms_angstrom"] < 0.5
    # guided short trajectory (all events included): same bar
    assert d["guided"]["type_flips"] == 0
    assert d["guided"]["coord_rms_angstrom"] < 0.5
