"""Tests for auxiliary subsystems: backbone geometry, visualization,
docking gating, fragment extraction, simple-conditional variant."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffndm_tpu.utils.geometry import (get_bb_coords_from_transform,
                                        get_bb_transform,
                                        quaternion_to_rotation_matrix,
                                        rotation_matrix_to_quaternion)


def test_bb_transform_roundtrip(rng):
    """frame -> (q, t) -> frame must reproduce N/CA/C for ideal geometry."""
    from diffndm_tpu.utils.geometry import CANONICAL_BB

    n = 16
    # random rigid transforms applied to the canonical frame
    qs = rng.normal(size=(n, 4))
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    ts = rng.normal(size=(n, 3)) * 10
    R = quaternion_to_rotation_matrix(qs)
    bb = np.einsum("nij,kj->nki", R, CANONICAL_BB) + ts[:, None, :]
    n_xyz, ca_xyz, c_xyz = bb[:, 0], bb[:, 1], bb[:, 2]

    q2, t2 = get_bb_transform(n_xyz, ca_xyz, c_xyz)
    coords, types = get_bb_coords_from_transform(ca_xyz, q2)
    coords = coords.reshape(n, 3, 3)
    np.testing.assert_allclose(coords, bb, atol=1e-6)
    assert types[:3] == ["N", "C", "C"]


def test_quaternion_roundtrip(rng):
    q = rng.normal(size=(8, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q[q[:, 0] < 0] *= -1  # canonical hemisphere
    R = quaternion_to_rotation_matrix(q)
    q2 = rotation_matrix_to_quaternion(R)
    q2[q2[:, 0] < 0] *= -1
    np.testing.assert_allclose(np.abs(q), np.abs(q2), atol=1e-6)


def test_visualization(tmp_path):
    from diffndm_tpu.utils.visualization import (load_molecule_xyz,
                                                 plot_molecule_3d,
                                                 save_xyz_file)

    one_hot = np.zeros((2, 5, 10))
    one_hot[:, :3, 0] = 1.0
    pos = np.random.default_rng(0).normal(size=(2, 5, 3))
    files = save_xyz_file(str(tmp_path), one_hot, pos,
                          ["C", "N", "O", "S", "B", "Br", "Cl", "P", "I",
                           "F"])
    assert len(files) == 2
    p, oh = load_molecule_xyz(files[0], {"C": 0, "N": 1})
    assert p.shape == (3, 3)
    png = plot_molecule_3d(pos[0, :3], ["C", "C", "O"],
                           [(0, 1, 1)], save_path=str(tmp_path / "m.png"))
    assert os.path.exists(png)


def test_docking_gated():
    from diffndm_tpu.chem.docking import (DockingUnavailable,
                                          docking_available, smina_score)

    if not docking_available():
        with pytest.raises(DockingUnavailable):
            smina_score(["x.sdf"], "rec.pdb")


def test_fragment_extraction():
    from diffndm_tpu.chem.mol import Molecule
    from diffndm_tpu.cli.fix_ligand import extract_fragment

    mol = Molecule(["C"] * 12, [(i, i + 1, 1) for i in range(11)],
                   coords=np.arange(36, dtype=float).reshape(12, 3))
    frag = extract_fragment(mol, 0.25)
    assert frag.n_atoms == 3
    assert len(frag.fragments()) == 1  # connected


def test_simple_conditional_variant():
    """simple=True must skip COM projection and use the full subspace."""
    from diffndm_tpu.config import DiffusionConfig
    from diffndm_tpu.diffusion import schedules as S
    from diffndm_tpu.diffusion.core import CondDiffusion

    sched = S.make_schedule("polynomial_2", 10, 5e-4)
    simple = CondDiffusion(sched, DiffusionConfig(timesteps=10), 10, 10,
                           simple=True)
    full = CondDiffusion(sched, DiffusionConfig(timesteps=10), 10, 10)
    assert float(simple.subspace_dimensionality(jnp.asarray(5.0))) == 15
    assert float(full.subspace_dimensionality(jnp.asarray(5.0))) == 12
    key = jax.random.PRNGKey(0)
    mu = jax.random.normal(key, (2, 4, 13))
    xh_p = jax.random.normal(key, (2, 8, 13))
    lm, pm = jnp.ones((2, 4)), jnp.ones((2, 8))
    out_s, _ = simple.sample_normal_zero_com(key, mu, xh_p,
                                             jnp.ones((2,)), lm, pm,
                                             fix_noise=True)
    out_f, _ = full.sample_normal_zero_com(key, mu, xh_p, jnp.ones((2,)),
                                           lm, pm, fix_noise=True)
    # simple keeps the mean; full projects it out
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(mu),
                               atol=1e-6)
    assert np.abs(np.asarray(out_f[..., :3]).sum(1)).max() < 1e-4


def test_bindingmoad_label_parse(tmp_path):
    from diffndm_tpu.data.process_bindingmoad import (filter_and_split,
                                                      read_label_file)

    csv = tmp_path / "every.csv"
    csv.write_text(
        "1.1.1.1,,,,\n"
        ",,1abc,,\n"
        ",,,LIG:1,valid\n"
        ",,2def,,\n"
        ",,,BAD:1,invalid\n"
        "2.2.2.2,,,,\n"
        ",,3ghi,,\n"
        ",,,XYZ:1,valid\n")
    d = read_label_file(str(csv))
    assert "1abc" in d and "3ghi" in d
    valid, splits = filter_and_split(d)
    assert "1abc" in valid and "2def" not in valid
    assert sum(len(v) for v in splits.values()) == len(valid)


def test_profiler_trace_writes_files(tmp_path):
    import jax
    import jax.numpy as jnp

    from diffndm_tpu.utils.profiling import StepTimer, annotate, trace

    out = str(tmp_path / "trace")
    with trace(out):
        with annotate("matmul"):
            y = jax.jit(lambda x: x @ x)(jnp.ones((32, 32)))
            jax.block_until_ready(y)
    import os

    found = [f for _, _, fs in os.walk(out) for f in fs]
    assert found, "no trace files written"

    timer = StepTimer()
    for _ in range(5):
        with timer:
            pass
    s = timer.summary()
    assert s["steps"] == 5 and s["min_s"] >= 0


def test_trace_noop_without_dir(monkeypatch):
    from diffndm_tpu.utils.profiling import trace

    monkeypatch.delenv("DIFFNDM_TRACE_DIR", raising=False)
    with trace():
        pass
