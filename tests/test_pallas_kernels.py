"""Pallas kernel correctness vs a plain-jnp oracle (interpret mode on
CPU; the same tests run compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffndm_tpu.ops.pallas_egnn import edge_vector_reduce, gcl_messages

B, N, H = 2, 40, 32


@pytest.fixture(scope="module")
def data():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)
    a = jax.random.normal(ks[0], (B, N, H))
    b = jax.random.normal(ks[1], (B, N, H))
    x = jax.random.normal(ks[2], (B, N, 3)) * 2
    x0 = jax.random.normal(ks[3], (B, N, 3)) * 2
    adj = (jax.random.uniform(ks[4], (B, N, N)) > 0.3).astype(jnp.float32)
    we = jax.random.normal(ks[5], (2, H)) * 0.2
    w2 = jax.random.normal(ks[6], (H, H)) * 0.1
    b2 = jax.random.normal(ks[7], (H,)) * 0.1
    watt = jax.random.normal(ks[8], (H, 1)) * 0.1
    wout = jax.random.normal(ks[9], (H, 1)) * 0.1
    d2c = jnp.sum((x[:, :, None] - x[:, None, :]) ** 2, -1)
    d2i = jnp.sum((x0[:, :, None] - x0[:, None, :]) ** 2, -1)
    center = jnp.mean(x, axis=1, keepdims=True)
    return dict(a=a, b=b, x=x, adj=adj, we=we, w2=w2, b2=b2, watt=watt,
                wout=wout, d2c=d2c, d2i=d2i, center=center)


def oracle_gcl(d, attention=True, norm=100.0):
    z = (d["a"][:, :, None, :] + d["b"][:, None, :, :]
         + d["d2c"][..., None] * d["we"][0]
         + d["d2i"][..., None] * d["we"][1])
    z = jax.nn.silu(z)
    m = jax.nn.silu(z @ d["w2"] + d["b2"])
    if attention:
        m = m * jax.nn.sigmoid(m @ d["watt"])
    return jnp.sum(m * d["adj"][..., None], axis=2) / norm


def oracle_vec(d, cross=False, tanh=True, rng=2.5, nc=1.0, norm=100.0):
    z = (d["a"][:, :, None, :] + d["b"][:, None, :, :]
         + d["d2c"][..., None] * d["we"][0]
         + d["d2i"][..., None] * d["we"][1])
    z = jax.nn.silu(z)
    m = jax.nn.silu(z @ d["w2"] + d["b2"])
    phi = (m @ d["wout"])[..., 0]
    if tanh:
        phi = jnp.tanh(phi) * rng
    x = d["x"]
    if cross:
        va = x - d["center"]
        v = jnp.cross(va[:, :, None, :], va[:, None, :, :])
        v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + nc)
    else:
        diff = x[:, :, None] - x[:, None, :]
        radial = jnp.sum(diff ** 2, -1, keepdims=True)
        v = diff / (jnp.sqrt(radial + 1e-8) + nc)
    w = phi * d["adj"]
    return jnp.sum(w[..., None] * v, axis=2) / norm


def test_gcl_messages_matches(data):
    got = gcl_messages(data["a"], data["b"], data["d2c"], data["d2i"],
                       data["adj"], data["we"], data["w2"], data["b2"],
                       data["watt"], attention=True, row_tile=8,
                       col_tile=16, interpret=True)
    want = oracle_gcl(data)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-3)


def test_gcl_messages_no_attention(data):
    got = gcl_messages(data["a"], data["b"], data["d2c"], data["d2i"],
                       data["adj"], data["we"], data["w2"], data["b2"],
                       data["watt"], attention=False, row_tile=8,
                       col_tile=16, interpret=True)
    want = oracle_gcl(data, attention=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-3)


def test_vector_reduce_diff(data):
    got = edge_vector_reduce(
        data["a"], data["b"], data["d2c"], data["d2i"], data["adj"],
        data["x"], data["center"], data["we"], data["w2"], data["b2"],
        data["wout"], tanh=True, coords_range=2.5, cross=False,
        row_tile=8, col_tile=16, interpret=True)
    want = oracle_vec(data, cross=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-3)


def test_vector_reduce_cross(data):
    got = edge_vector_reduce(
        data["a"], data["b"], data["d2c"], data["d2i"], data["adj"],
        data["x"], data["center"], data["we"], data["w2"], data["b2"],
        data["wout"], tanh=True, coords_range=2.5, cross=True,
        row_tile=8, col_tile=16, interpret=True)
    want = oracle_vec(data, cross=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-3)


def test_non_divisible_shapes(data):
    """N not divisible by tiles: padding must not change results."""
    got = gcl_messages(data["a"], data["b"], data["d2c"], data["d2i"],
                       data["adj"], data["we"], data["w2"], data["b2"],
                       data["watt"], row_tile=16, col_tile=32,
                       interpret=True)
    want = oracle_gcl(data)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-3)


def test_wired_model_matches_xla_path():
    """EGNNDynamics with use_pallas (interpret mode, float32 MXU) must
    reproduce the XLA row-tiled path on identical params — the gate for
    running the fused kernels in production."""
    import dataclasses

    from diffndm_tpu.config import EGNNConfig
    from diffndm_tpu.models.dynamics import EGNNDynamics

    feat = 6
    b, nl, npk = 2, 6, 10
    base = EGNNConfig(hidden_nf=16, joint_nf=8, n_layers=2,
                      inv_sublayers=1, attention=True, tanh=True,
                      norm_constant=1.0, reflection_equivariant=False,
                      edge_cutoff_ligand=None, edge_cutoff_pocket=5.0,
                      edge_cutoff_interaction=5.0, row_tile=8)
    pall = dataclasses.replace(base, use_pallas=True, pallas_interpret=True,
                               pallas_row_tile=8, pallas_col_tile=8)
    m_ref = EGNNDynamics(base, atom_nf=feat, residue_nf=feat)
    m_pal = EGNNDynamics(pall, atom_nf=feat, residue_nf=feat)

    key = jax.random.PRNGKey(0)
    xh_lig = jax.random.normal(key, (b, nl, 3 + feat)) * 2
    xh_poc = jax.random.normal(jax.random.PRNGKey(1), (b, npk, 3 + feat)) * 3
    t = jnp.asarray([0.3, 0.8])
    lm = jnp.asarray((np.arange(nl)[None] < np.array([[4], [6]])),
                     jnp.float32)
    pm = jnp.asarray((np.arange(npk)[None] < np.array([[7], [10]])),
                     jnp.float32)
    params = m_ref.init(key, xh_lig, xh_poc, t, lm, pm)

    out_ref = m_ref.apply(params, xh_lig, xh_poc, t, lm, pm)
    out_pal = m_pal.apply(params, xh_lig, xh_poc, t, lm, pm)
    for r, p in zip(out_ref, out_pal):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)
