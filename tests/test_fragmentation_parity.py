"""Pin the round-5 fragmentation parity finding (VERDICT r4 weak #4).

The committed artifact examples/fragmentation_compare.json measures the
reference's OWN guided output sets with this repo's metrics stack.  The
reference saves largest fragments only (generate_ligands.py:101,
largest_frag defaults True), so its sets are trivially 100% connected —
but the size distribution shows its guidance shrinking molecules ~2x
(unguided mean 20.5 atoms -> SPSA+ATP mix 10.1).  Fragmentation under
SPSA/ATP guidance is therefore reference-parity behaviour, and the
largest-fragment eval protocol both codebases use is the reference's
own convention.
"""

import json
import os

import pytest

ART = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples", "fragmentation_compare.json")


@pytest.fixture(scope="module")
def artifact():
    if not os.path.exists(ART):
        pytest.skip("fragmentation_compare.json not generated")
    with open(ART) as f:
        return json.load(f)


def test_reference_sets_measured(artifact):
    s = artifact["sets"]
    for name in ("unguided_600_final", "spsa_100_30_2", "mix_100_50_10"):
        assert name in s
        if s[name].get("missing"):
            pytest.skip("reference zips not mounted when generated")
        assert s[name]["n_molecules"] >= 1000


def test_reference_guidance_shrinks_fragments(artifact):
    """The parity claim itself: guided sets are much smaller than the
    unguided set — the reference's guidance fragments molecules and its
    metrics are computed on the surviving largest fragments."""
    s = artifact["sets"]
    if s["unguided_600_final"].get("missing"):
        pytest.skip("reference zips not mounted when generated")
    ung = s["unguided_600_final"]["mean_atoms"]
    mix = s["mix_100_50_10"]["mean_atoms"]
    spsa = s["spsa_100_30_2"]["mean_atoms"]
    assert ung > spsa > mix
    assert mix < 0.6 * ung  # ~2x shrink at full SPSA+ATP strength
    # saved sets are largest-fragment only (write-path artifact)
    for name in ("unguided_600_final", "spsa_100_30_2", "mix_100_50_10"):
        assert s[name]["fully_connected_fraction"] == 1.0
