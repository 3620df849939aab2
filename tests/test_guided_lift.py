"""Trained-model guided-quality regression (VERDICT r2 #3).

Uses the committed virtual-pocket checkpoint
(examples/checkpoints/virtual_cond) to pin the reference's headline
behaviour end-to-end: SPSA+ATP guidance must not degrade mean QED
relative to unguided sampling from the same keys (reference direction:
QED 0.490 -> 0.578, SA 0.626 -> 0.771; BASELINE.md table 4-1).

Kept cheap for CI: one held-out pocket, 4 ligands, T=40 (all guidance
events live at s <= 30 for this config, so the guided tail is fully
exercised).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

RUN = os.path.join(os.path.dirname(__file__), "..", "examples",
                   "checkpoints", "virtual_cond")
DATA = os.path.join(os.path.dirname(__file__), "..", "data", "processed",
                    "virtual", "test.npz")


@pytest.mark.skipif(not os.path.isdir(RUN), reason="no committed ckpt")
@pytest.mark.skipif(not os.path.exists(DATA), reason="no virtual dataset")
def test_guided_qed_at_least_unguided(tmp_path):
    out = tmp_path / "lift.json"
    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "guided_lift_eval.py")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    subprocess.run(
        [sys.executable, script, "--run", RUN, "--ckpt", "last",
         "--data", DATA, "--n_pockets", "1", "--n_samples", "4",
         "--T", "40", "--json", str(out)],
        check=True, env=env, timeout=1500)
    res = json.loads(out.read_text())
    assert res["unguided"]["valid"] >= 0.5, res
    # guidance must not hurt QED (the reference direction is a lift)
    assert res["qed_lift"] >= -0.02, res
    assert np.isfinite(res["sa_lift"])
