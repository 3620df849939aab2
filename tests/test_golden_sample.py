"""Golden-sample regression: a fixed-key, fixed-params tiny sampling run
must reproduce committed coordinates.  Guards against silent numerical
drift of the sampler/EGNN/schedule across refactors and rounds (the
reference checkpoint blob is stripped, so this pins OUR trajectory
instead; cross-implementation structure is pinned separately by
test_reference_parity.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from diffndm_tpu.config import DiffusionConfig, EGNNConfig, SampleConfig
from diffndm_tpu.constants import dataset_params
from diffndm_tpu.diffusion import schedules as S
from diffndm_tpu.diffusion.core import CondDiffusion
from diffndm_tpu.diffusion.sampler import ConditionalSampler
from diffndm_tpu.models.dynamics import EGNNDynamics
from diffndm_tpu.structs import NodeBatch

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "sample_v1.npz")
ATOM_NF, T, B, NL, NP = 10, 8, 2, 8, 16


def _run():
    cfg = EGNNConfig(hidden_nf=16, joint_nf=8, n_layers=1, row_tile=16,
                     attention=True, tanh=True,
                     reflection_equivariant=False)
    module = EGNNDynamics(cfg, atom_nf=ATOM_NF, residue_nf=ATOM_NF)
    key = jax.random.PRNGKey(42)
    params = module.init(key, jnp.zeros((1, NL, 13)),
                         jnp.zeros((1, NP, 13)), jnp.zeros((1,)),
                         jnp.ones((1, NL)), jnp.ones((1, NP)))
    core = CondDiffusion(S.make_schedule("polynomial_2", T, 5e-4),
                         DiffusionConfig(timesteps=T), ATOM_NF, ATOM_NF)
    pocket = NodeBatch(
        x=jax.random.normal(key, (B, NP, 3)) * 2 + 4,
        h=jax.nn.one_hot(jax.random.randint(key, (B, NP), 0, 4), ATOM_NF),
        mask=jnp.ones((B, NP)))
    sampler = ConditionalSampler(core, module, params, SampleConfig(),
                                 dataset_params["crossdock_full"])
    res = sampler.sample_given_pocket(jax.random.PRNGKey(7), pocket,
                                      np.array([5, 7]))
    return np.asarray(res.ligand.x), np.asarray(res.ligand.h)


def test_golden_sample():
    x, h = _run()
    if not os.path.exists(GOLDEN):  # first run: write the golden file
        np.savez(GOLDEN, x=x, h=h)
    g = np.load(GOLDEN)
    np.testing.assert_allclose(x, g["x"], atol=1e-4)
    np.testing.assert_array_equal(h, g["h"])


GOLDEN_GUIDED = os.path.join(os.path.dirname(__file__), "golden",
                             "sample_guided_v1.npz")


def test_golden_guided_sample():
    """Same pin for the GUIDED path: fixed-key SPSA+ATP trajectory with a
    deterministic synthetic oracle — guards the guidance event numerics
    (selection, probes, hybrid) across refactors."""
    from diffndm_tpu.config import ATPConfig, SPSAConfig

    cfg = EGNNConfig(hidden_nf=16, joint_nf=8, n_layers=1, row_tile=16,
                     attention=True, tanh=True,
                     reflection_equivariant=False)
    module = EGNNDynamics(cfg, atom_nf=ATOM_NF, residue_nf=ATOM_NF)
    key = jax.random.PRNGKey(42)
    params = module.init(key, jnp.zeros((1, NL, 13)),
                         jnp.zeros((1, NP, 13)), jnp.zeros((1,)),
                         jnp.ones((1, NL)), jnp.ones((1, NP)))
    core = CondDiffusion(S.make_schedule("polynomial_2", T, 5e-4),
                         DiffusionConfig(timesteps=T), ATOM_NF, ATOM_NF)
    pocket = NodeBatch(
        x=jax.random.normal(key, (B, NP, 3)) * 2 + 4,
        h=jax.nn.one_hot(jax.random.randint(key, (B, NP), 0, 4), ATOM_NF),
        mask=jnp.ones((B, NP)))

    class DetOracle:
        """Deterministic compactness reward (no chemistry host state)."""

        def _score(self, coords, h, mask):
            from jax.experimental import io_callback

            def host(c, hh, m):
                c = np.asarray(c)
                m = np.asarray(m)[..., None]
                com = (c * m).sum(-2, keepdims=True) / np.maximum(
                    m.sum(-2, keepdims=True), 1)
                d2 = (((c - com) ** 2).sum(-1) * m[..., 0]).sum(-1)
                return (-d2 / np.maximum(m[..., 0].sum(-1), 1)).astype(
                    np.float32)

            return io_callback(host,
                               jax.ShapeDtypeStruct((coords.shape[0],),
                                                    jnp.float32),
                               coords, h, mask, ordered=False)

        svdd_rewards = spsa_rewards = \
            lambda self, c, h, m, cfg: self._score(c, h, m)

    scfg = SampleConfig(
        spsa=SPSAConfig(enabled=True, num_probes=2, start_step=4, every=2),
        atp=ATPConfig(enabled=True, num_groups=3, start_step=6, every=3))
    sampler = ConditionalSampler(core, module, params, scfg,
                                 dataset_params["crossdock_full"],
                                 oracle=DetOracle())
    res = sampler.sample_given_pocket(jax.random.PRNGKey(7), pocket,
                                      np.array([5, 7]))
    x = np.asarray(res.ligand.x)
    if not os.path.exists(GOLDEN_GUIDED):
        np.savez(GOLDEN_GUIDED, x=x)
    g = np.load(GOLDEN_GUIDED)
    np.testing.assert_allclose(x, g["x"], atol=1e-4)
