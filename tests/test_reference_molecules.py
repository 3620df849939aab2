"""Metric parity on the reference's committed generated molecules.

The reference repo ships the DiffSBDD-baseline outputs
(my_example_origion/600_final.zip, 100 pockets x 20 molecules) together
with their RDKit-computed aggregates (thesis table 4-1: QED 0.490+-0.09,
SA 0.626+-0.06, LogP 1.054+-1.02, Lipinski 4.735+-0.25, validity 97.8%).
Running our from-scratch chemistry stack over the same molecules pins how
far our descriptors sit from RDKit and guards against regressions.
"""

import glob
import os
import subprocess
import tempfile

import numpy as np
import pytest

ZIP = "/root/reference/my_example_origion/600_final.zip"


@pytest.fixture(scope="module")
def ref_sdfs(tmp_path_factory):
    if not os.path.exists(ZIP):
        pytest.skip("reference example zip not mounted")
    out = tmp_path_factory.mktemp("refmols")
    subprocess.run(["unzip", "-q", ZIP, "-d", str(out)], check=True)
    files = sorted(glob.glob(str(out / "**" / "*.sdf"), recursive=True))
    assert len(files) >= 50
    return files


def test_descriptor_aggregates_near_rdkit(ref_sdfs):
    from diffndm_tpu.chem.io import read_sdf
    from diffndm_tpu.chem.metrics import MoleculeProperties
    from diffndm_tpu.chem.sanitize import SanitizeError, sanitize

    props = MoleculeProperties()
    rows, n_total = [], 0
    for path in ref_sdfs[:50]:  # 1000 molecules is plenty
        for mol in read_sdf(path):
            n_total += 1
            try:
                sanitize(mol)
                rows.append((props.calculate_qed(mol),
                             props.calculate_sa(mol),
                             props.calculate_logp(mol),
                             props.calculate_lipinski(mol)))
            except SanitizeError:
                continue
    arr = np.array(rows, float)
    validity = len(rows) / n_total
    qed, sa, logp, lip = arr.mean(0)

    # RDKit references (thesis 4-1).  SA is the exact Ertl pipeline with
    # the real fpscores database and RDKit-compatible Morgan hashing
    # (round-3): measured bias -0.0008 on this set, pinned at +-0.01.
    # QED uses distinct-alert-class semantics (round-3 measured bias
    # +0.013 here, max +-0.032 over all 7 committed sets); LogP carries
    # the known Crippen-typing residual (round-3 measured: LogP 0.617).
    assert abs(qed - 0.490) < 0.02
    assert abs(sa - 0.626) < 0.01
    assert abs(logp - 1.054) < 0.8
    assert abs(lip - 4.735) < 0.3
    assert validity > 0.90


# ALL seven committed reference sets (thesis tables 4-1/4-2), as
# (zip, SA_ref, QED_ref).  Round-4 measured biases (full sets,
# PARITY.md per-set table): QED within +-0.033, SA within +-0.020
# everywhere — the VERDICT r3 "inp_ATP 0.52" residual is closed.
SETS = {
    "origion": ("/root/reference/my_example_origion/600_final.zip",
                0.626, 0.490),
    "SPSA": ("/root/reference/my_example_SPSA/100_30_2_o.zip",
             0.675, 0.562),
    "ATP": ("/root/reference/my_example_ATP/60_15_100_o.zip",
            0.762, 0.556),
    "mix": ("/root/reference/my_example_mix/100_50_10_o.zip",
            0.771, 0.578),
    "inp_origion": (
        "/root/reference/my_example_inpaint/origion_50_new.zip",
        0.680, 0.516),
    "inp_SPSA": ("/root/reference/my_example_inpaint/SPSA_50_new.zip",
                 0.552, 0.483),
    "inp_ATP": ("/root/reference/my_example_inpaint/ATP_50_new.zip",
                0.613, 0.632),
}


def test_sa_and_qed_track_per_set_aggregates(tmp_path):
    """SA and QED must track the per-configuration RDKit aggregates
    (thesis 4-1/4-2), not just the global mean — both carry weight 2-3 in
    every guidance reward, so the *direction* of their discrimination
    matters.  Round-4 full-set biases: SA |bias| <= 0.020 (worst:
    inp_SPSA +0.0198, the P/B-rich acyclic outlier set); QED |bias| <=
    0.033 (worst: inp_origion +0.0320, inp_ATP -0.0270)."""
    from diffndm_tpu.chem.io import read_sdf
    from diffndm_tpu.chem.metrics import MoleculeProperties
    from diffndm_tpu.chem.sanitize import SanitizeError, sanitize

    props = MoleculeProperties()
    for name, (zp, sa_ref, qed_ref) in SETS.items():
        if not os.path.exists(zp):
            pytest.skip("reference example zips not mounted")
        out = tmp_path / name
        subprocess.run(["unzip", "-q", zp, "-d", str(out)], check=True)
        files = sorted(glob.glob(str(out / "**" / "*.sdf"),
                                 recursive=True))
        sas, qeds = [], []
        for path in files[:40]:
            for mol in read_sdf(path):
                try:
                    sanitize(mol)
                except SanitizeError:
                    continue
                sas.append(props.calculate_sa(mol))
                qeds.append(props.calculate_qed(mol))
        assert abs(np.mean(sas) - sa_ref) < 0.03, (name, np.mean(sas))
        assert abs(np.mean(qeds) - qed_ref) < 0.05, (name, np.mean(qeds))


def test_rebuilt_connectivity_matches_openbabel(ref_sdfs):
    """Bond-perception parity with the reference's default OpenBabel
    builder (molecule_builder.py:58-97): rebuilding the committed
    molecules from their raw coordinates must reconnect them.  Round-4
    measured on the full origion set: 0/43,649 reference bonds missed,
    100% full connectivity, 83% exact bond-set match (the residual is
    extra ring-closure bonds OB's angle refinements drop).  The old
    single-bond-table rule fragmented 89% of these molecules — the root
    cause of round-3's connectivity~0 samples."""
    from diffndm_tpu.chem.bonds import perceive_molecule
    from diffndm_tpu.chem.io import read_sdf
    from diffndm_tpu.chem.sanitize import connectivity_fraction
    from diffndm_tpu.constants import dataset_params

    di = dataset_params["crossdock_full"]
    enc = di["atom_encoder"]
    n_conn = n_tot = n_exact = missed = 0
    for path in ref_sdfs[:20]:
        for mol in read_sdf(path):
            if not all(s in enc for s in mol.symbols):
                continue
            t = np.array([enc[s] for s in mol.symbols])
            built = perceive_molecule(np.asarray(mol.coords, float), t, di)
            n_tot += 1
            if connectivity_fraction(built) >= 1.0:
                n_conn += 1
            ref_bonds = {(min(i, j), max(i, j)) for i, j, _ in mol.bonds}
            got_bonds = {(min(i, j), max(i, j)) for i, j, _ in built.bonds}
            missed += len(ref_bonds - got_bonds)
            if ref_bonds == got_bonds:
                n_exact += 1
    assert n_tot >= 300
    assert missed == 0, f"{missed} reference bonds missed"
    assert n_conn == n_tot, f"only {n_conn}/{n_tot} fully connected"
    assert n_exact / n_tot > 0.75
