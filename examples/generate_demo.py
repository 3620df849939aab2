"""End-to-end demo: synthetic pocket -> conditional sampling (SPSA+ATP) ->
molecule building -> metrics. Runs on CPU or TPU."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if __name__ == "__main__":
    import jax
    if os.environ.get("DEMO_CPU", "1") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from diffndm_tpu.config import (ATPConfig, DiffusionConfig, EGNNConfig,
                                    SampleConfig, SPSAConfig)
    from diffndm_tpu.constants import dataset_params
    from diffndm_tpu.diffusion import schedules as S
    from diffndm_tpu.diffusion.core import CondDiffusion
    from diffndm_tpu.diffusion.sampler import ConditionalSampler
    from diffndm_tpu.models.dynamics import EGNNDynamics
    from diffndm_tpu.structs import NodeBatch, to_lists
    from diffndm_tpu.chem.bonds import build_molecule
    from diffndm_tpu.chem.metrics import BasicMolecularMetrics, MoleculeProperties
    from diffndm_tpu.chem.io import write_sdf

    DP = dataset_params["crossdock_full"]
    ATOM_NF = 10
    T = int(os.environ.get("DEMO_T", 24))
    B, NL, NP = 4, 16, 32

    cfg = EGNNConfig(hidden_nf=32, joint_nf=16, n_layers=2, row_tile=16)
    module = EGNNDynamics(cfg, atom_nf=ATOM_NF, residue_nf=ATOM_NF)
    key = jax.random.PRNGKey(0)
    params = module.init(key, jnp.zeros((1, NL, 13)), jnp.zeros((1, NP, 13)),
                         jnp.zeros((1,)), jnp.ones((1, NL)), jnp.ones((1, NP)))
    core = CondDiffusion(S.make_schedule("polynomial_2", T, 5e-4),
                         DiffusionConfig(timesteps=T), ATOM_NF, ATOM_NF)
    pocket = NodeBatch(x=jax.random.normal(key, (B, NP, 3)) * 3 + 5,
                       h=jax.nn.one_hot(jax.random.randint(key, (B, NP), 0, 4), ATOM_NF),
                       mask=jnp.ones((B, NP)))
    sampler = ConditionalSampler(
        core, module, params,
        SampleConfig(spsa=SPSAConfig(enabled=True, num_probes=3, start_step=6),
                     atp=ATPConfig(enabled=True, num_groups=3, start_step=8, every=4)),
        DP)
    t0 = time.time()
    res = sampler.sample_given_pocket(jax.random.PRNGKey(1), pocket,
                                      np.array([9, 12, 10, 14]))
    jax.block_until_ready(res.ligand.x)
    print(f"sampled {B} ligands in {time.time()-t0:.1f}s (T={T}, SPSA+ATP on)")
    mols = [build_molecule(c, t, DP) for c, t in to_lists(res.ligand)]
    write_sdf("/tmp/demo_out.sdf", mols)
    (validity, connectivity, uniq, novelty), _ = \
        BasicMolecularMetrics(DP).evaluate_rdmols(mols)
    print(f"validity={validity:.2f} connectivity={connectivity:.2f} unique={uniq:.2f}")
    qeds, sas, logps, lips = MoleculeProperties().evaluate_new([mols])
    print("QED:", [round(q, 3) for q in qeds[0]])
    # native Vina-style affinity vs the synthetic pocket (chem/scoring.py)
    from diffndm_tpu.chem.scoring import VinaScorer

    scorer = VinaScorer(np.asarray(pocket.x[0]),
                        ["C"] * pocket.x.shape[1])
    affs = [round(scorer.score(m), 2) for m in mols if m is not None]
    print("Vina-style affinity:", affs)
    print("wrote /tmp/demo_out.sdf")
