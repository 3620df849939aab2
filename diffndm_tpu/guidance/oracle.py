"""Host-side reward oracle bridged into jitted samplers via io_callback.

This is the single device<->host choke point that replaces the reference's
per-molecule OpenBabel-tempfile + RDKit round trip inside the sampling loop
(conditional_model.py:845-882 ``handle_to_mol`` + ``my_reward_*``).  One
batched callback scores a whole candidate population at once; bond
perception is the in-memory valence-aware pass from ``chem.bonds``.

Reward profiles (weights cited from the reference):

- SPSA  (conditional_model.py:835-841): 2*QED + 3*SA + Lipinski/5
- SVDD  (conditional_model.py:644-650): 2*QED + 2*SA
        + sigmoid(k(logp-lo)) * sigmoid(-k(logp-hi)) + Lipinski/5
- RL    (conditional_model.py:614-619): mean over batch of
        6*QED + 2*SA + Lipinski/5  (scalar)

Invalid molecules score 0 in every term (metrics.evaluate_new:318-339).
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import io_callback

from diffndm_tpu.chem.bonds import build_molecule
from diffndm_tpu.chem.metrics import MoleculeProperties
from diffndm_tpu.chem.sanitize import SanitizeError, sanitize


def _sigmoid(z: float) -> float:
    return 1.0 / (1.0 + math.exp(-z))


class RewardOracle:
    """Builds molecules from (coords, type one-hot, mask) batches and
    scores them with a configurable weighted reward."""

    def __init__(self, dataset_info: dict,
                 num_workers: Optional[int] = None):
        self.dataset_info = dataset_info
        self.props = MoleculeProperties()
        if num_workers is None:
            # default from the environment; scoring is ~0.6 ms/molecule so
            # the pool only pays off for large guidance populations
            num_workers = int(os.environ.get("DIFFNDM_ORACLE_WORKERS", 0))
        self.num_workers = num_workers
        self._pool = None
        # native one-call-per-batch scorer (native/chemscore.cpp):
        # bitwise-identical to the Python pipeline (test_native_oracle),
        # ~20x faster.  DIFFNDM_NO_NATIVE_ORACLE=1 forces pure Python.
        self.native = None
        if os.environ.get("DIFFNDM_NO_NATIVE_ORACLE") != "1":
            try:
                from diffndm_tpu.chem.native import NativeScorer

                self.native = NativeScorer(dataset_info)
            except Exception:
                self.native = None
        # optional receptor for the affinity reward term (w_vina)
        self.scorer = None
        # set by ConditionalSampler when sampling under a device mesh:
        # io_callback results come back pinned to {maximal device=0},
        # and the SPMD partitioner then involuntarily rematerialises the
        # downstream (k, 2, B) reshape (observed in the 8-device dryrun).
        # Constraining the [B_flat] reward vector to an explicitly
        # REPLICATED sharding makes the device-0 -> all broadcast a
        # cheap, voluntary collective on a tiny tensor instead.
        self.result_mesh = None
        # invalid-molecule accounting: invalid latents are EXPECTED during
        # guidance (reward 0, metrics.evaluate_new:318-339) but any other
        # exception is a bug and must surface, not silently become 0.0
        self.n_scored = 0
        self.n_invalid = 0

    @property
    def invalid_rate(self) -> float:
        return self.n_invalid / max(self.n_scored, 1)

    def set_receptor(self, pdb_path_or_scorer) -> None:
        """Attach a receptor so rewards can include w_vina * (-affinity)
        (native Vina-style rescoring, chem/scoring.py) — an optional
        capability beyond the reference's QED/SA/LogP/Lipinski rewards."""
        from diffndm_tpu.chem.scoring import VinaScorer

        if isinstance(pdb_path_or_scorer, str):
            self.scorer = VinaScorer.from_pdb(pdb_path_or_scorer)
        else:
            self.scorer = pdb_path_or_scorer

    # -- host side ---------------------------------------------------------
    def _score_one(self, coords, types, w_qed, w_sa, w_lip, logp_k,
                   logp_lo, logp_hi, w_vina=0.0, w_conn=0.0) -> float:
        self.n_scored += 1
        try:
            mol = build_molecule(coords, types, self.dataset_info)
            sanitize(mol)
        except SanitizeError:  # SanitizeError subclasses ValueError
            self.n_invalid += 1
            return 0.0
        r = (w_qed * self.props.calculate_qed(mol)
             + w_sa * self.props.calculate_sa(mol)
             + w_lip * self.props.calculate_lipinski(mol))
        if logp_k > 0:
            lp = self.props.calculate_logp(mol)
            r += (_sigmoid(logp_k * (lp - logp_lo))
                  * _sigmoid(-logp_k * (lp - logp_hi)))
        if w_vina > 0 and self.scorer is not None:
            r += w_vina * (-self.scorer.score(mol))
        if w_conn > 0:
            from diffndm_tpu.chem.sanitize import connectivity_fraction

            r += w_conn * connectivity_fraction(mol)
        return float(r)

    def score_batch_host(self, coords: np.ndarray, h: np.ndarray,
                         mask: np.ndarray, weights: tuple) -> np.ndarray:
        """coords [B,N,3], h [B,N,F] (one-hot or logits), mask [B,N]
        -> rewards [B] float32."""
        return self.score_batch_types(coords, np.asarray(h).argmax(-1),
                                      mask, weights)

    def score_batch_types(self, coords: np.ndarray, types: np.ndarray,
                          mask: np.ndarray, weights: tuple) -> np.ndarray:
        """Same as score_batch_host but with atom-type indices instead of
        one-hot features — lets device code fetch int8 argmax types
        (4x fewer device->host bytes through the axon tunnel, identical
        rewards: the first scoring step is this argmax either way)."""
        w_qed, w_sa, w_lip, logp_k, logp_lo, logp_hi = weights[:6]
        w_vina = weights[6] if len(weights) > 6 else 0.0
        w_conn = weights[7] if len(weights) > 7 else 0.0
        coords = np.asarray(coords)
        types = np.asarray(types)
        mask = np.asarray(mask) > 0.5
        out = np.zeros(coords.shape[0], dtype=np.float32)
        if self.native is not None and w_vina == 0 and w_conn == 0:
            rewards, nat_ok, terms = self.native.score(
                coords, types, mask, weights[:6])
            self.n_scored += int(nat_ok.sum())
            self.n_invalid += int((nat_ok & (terms[:, 0] == 0)).sum())
            if nat_ok.all():
                return rewards
            # rows the native code flagged (>64-bond molecules) go through
            # the Python pipeline
            out[nat_ok] = rewards[nat_ok]
            for b in np.where(~nat_ok)[0]:
                out[b] = self._score_one(
                    coords[b][mask[b]], types[b][mask[b]], w_qed, w_sa,
                    w_lip, logp_k, logp_lo, logp_hi, w_vina)
            return out
        items = [(coords[b][mask[b]], types[b][mask[b]])
                 for b in range(coords.shape[0])]
        # w_vina needs the receptor scorer, which lives only in THIS
        # process (never shipped to pool workers) — force the serial path
        # so the affinity term cannot silently vanish under
        # DIFFNDM_ORACLE_WORKERS>1
        if self.num_workers > 1 and len(items) >= 8 and w_vina == 0:
            pool = self._get_pool()
            fn = partial(_score_star, self.dataset_info, weights)
            for b, r in enumerate(pool.map(fn, items, chunksize=4)):
                out[b] = r
        else:
            for b, (c, t) in enumerate(items):
                out[b] = self._score_one(c, t, w_qed, w_sa, w_lip,
                                         logp_k, logp_lo, logp_hi,
                                         w_vina, w_conn)
        return out

    def _get_pool(self):
        if self._pool is None:
            import multiprocessing as mp

            # spawn, not fork: the scoring process has a live jax/TPU
            # client with background threads — forking it can deadlock.
            # Workers import the chem stack once at startup and never
            # touch jax.
            self._pool = mp.get_context("spawn").Pool(self.num_workers)
        return self._pool

    # -- device side -------------------------------------------------------
    def callback(self, coords: jnp.ndarray, h: jnp.ndarray,
                 mask: jnp.ndarray, w_qed: float, w_sa: float,
                 w_lipinski: float, logp_k: float = 0.0,
                 logp_lo: float = 0.0, logp_hi: float = 0.0,
                 w_vina: float = 0.0, w_conn: float = 0.0) -> jnp.ndarray:
        """Jit-safe reward evaluation: [B] float32."""
        weights = (w_qed, w_sa, w_lipinski, logp_k, logp_lo, logp_hi,
                   w_vina, w_conn)
        host = partial(self.score_batch_host, weights=weights)
        b = coords.shape[0]
        r = io_callback(
            host, jax.ShapeDtypeStruct((b,), jnp.float32),
            coords, h, mask, ordered=False)
        if self.result_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            r = jax.lax.with_sharding_constraint(
                r, NamedSharding(self.result_mesh, PartitionSpec()))
        return r

    # convenience profiles
    def spsa_rewards(self, coords, h, mask, cfg) -> jnp.ndarray:
        return self.callback(coords, h, mask, cfg.w_qed, cfg.w_sa,
                             cfg.w_lipinski,
                             w_vina=getattr(cfg, "w_vina", 0.0),
                             w_conn=getattr(cfg, "w_connectivity", 0.0))

    def svdd_rewards(self, coords, h, mask, cfg) -> jnp.ndarray:
        return self.callback(coords, h, mask, cfg.w_qed, cfg.w_sa,
                             cfg.w_lipinski, cfg.logp_k, cfg.logp_lo,
                             cfg.logp_hi,
                             w_vina=getattr(cfg, "w_vina", 0.0),
                             w_conn=getattr(cfg, "w_connectivity", 0.0))

    def rl_reward_host(self, coords, h, mask, cfg) -> float:
        """Scalar mean reward for the REINFORCE update (host-side)."""
        r = self.score_batch_host(
            coords, h, mask,
            (cfg.w_qed, cfg.w_sa, cfg.w_lipinski, 0.0, 0.0, 0.0))
        return float(np.mean(r))


def _score_star(dataset_info, weights, item):
    """Top-level worker entry (picklable) for the process pool.  The
    affinity term is host-process-only (the scorer is not shipped to
    workers); callers needing w_vina>0 run with num_workers=0."""
    oracle = RewardOracle(dataset_info)
    c, t = item
    w_qed, w_sa, w_lip, logp_k, logp_lo, logp_hi = weights[:6]
    w_conn = weights[7] if len(weights) > 7 else 0.0
    return oracle._score_one(c, t, w_qed, w_sa, w_lip, logp_k, logp_lo,
                             logp_hi, w_conn=w_conn)
