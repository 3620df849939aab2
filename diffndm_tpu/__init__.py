"""DiffNDM-TPU: TPU-native diffusion-based structure-conditioned drug design
guided by non-differentiable metrics.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``caiyf03/Diffusion-model-based-drug-design-guided-by-non-differentiable-metrics``
(DiffSBDD extended with SPSA zero-order guidance, ATP/SVDD adaptive trajectory
pruning and an RL noise-adjustment network).

Key architectural differences from the PyTorch reference:

- Flat node arrays with integer batch masks are replaced by **padded,
  fixed-shape batches** ``[B, N_max, ...]`` with boolean masks, so every
  sampler step is a statically-shaped XLA program.
- ``torch_scatter`` segment ops become masked reductions (``ops.segment``).
- The reverse-diffusion loop is a single ``jax.lax.scan`` with explicit PRNG
  key threading; guidance fan-out (SPSA probes, ATP candidate branches) are
  extra **batch axes** handled by ``vmap`` instead of mask-offset bookkeeping.
- Non-differentiable chemistry rewards (QED/SA/LogP/Lipinski) run host-side
  through ``jax.experimental.io_callback`` on a batched decode of the latent
  state; bond perception / sanitization / descriptors are implemented from
  scratch in ``diffndm_tpu.chem`` (RDKit is used instead when available).
- Data parallelism is a ``jax.sharding.Mesh`` with XLA collectives instead of
  Lightning DDP.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: remote TPU compiles through the axon
# tunnel cost 1-3 min each; caching makes repeated CLI/bench invocations
# start in seconds. Only enabled under the axon runtime — cached CPU
# executables can carry stale host-callback pointers and mismatched
# machine-feature flags. Opt out with DIFFNDM_NO_COMPILE_CACHE=1.
if _os.environ.get("DIFFNDM_NO_COMPILE_CACHE") != "1" and \
        _os.environ.get("PALLAS_AXON_POOL_IPS"):
    try:
        import jax as _jax

        _cache_dir = _os.environ.get(
            "DIFFNDM_COMPILE_CACHE",
            _os.path.expanduser("~/.cache/diffndm_jax"))
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           1.0)
    except Exception:
        pass

from diffndm_tpu import constants  # noqa: F401
