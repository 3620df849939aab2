"""Joint node-count prior p(N_lig, N_pocket).

Replaces the reference ``DistributionNodes`` (en_diffusion.py:963-1033)
which keeps a list of per-column torch Categorical objects and samples them
one at a time in a Python loop.  Here the joint histogram is a single dense
array and conditional sampling over a whole batch is one vectorized gumbel
top-1 — trivially jittable and vmappable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class DistributionNodes:
    def __init__(self, histogram: np.ndarray):
        histogram = np.asarray(histogram, dtype=np.float64) + 1e-3
        self.prob = jnp.asarray(histogram / histogram.sum(),
                                dtype=jnp.float32)
        self.log_prob_table = jnp.log(self.prob)
        # conditionals, normalized along each axis
        p = np.asarray(self.prob)
        self._log_n1_given_n2 = jnp.asarray(
            np.log(p / p.sum(axis=0, keepdims=True)), dtype=jnp.float32)
        self._log_n2_given_n1 = jnp.asarray(
            np.log(p / p.sum(axis=1, keepdims=True)), dtype=jnp.float32)

    @property
    def entropy(self) -> float:
        p = self.prob.reshape(-1)
        return float(-jnp.sum(p * jnp.log(p + 1e-30)))

    def sample(self, key: jax.Array, n_samples: int = 1):
        """Sample (N_lig, N_pocket) pairs from the joint histogram."""
        flat = self.log_prob_table.reshape(-1)
        idx = jax.random.categorical(key, flat, shape=(n_samples,))
        n2 = self.prob.shape[1]
        return idx // n2, idx % n2

    def sample_conditional(self, key: jax.Array, n1=None, n2=None):
        """Sample one axis given the other, vectorized over the batch
        (cf. en_diffusion.py:998-1005)."""
        assert (n1 is None) ^ (n2 is None)
        if n2 is not None:
            n2 = jnp.asarray(n2)
            logits = self._log_n1_given_n2.T[n2]  # [B, max_n1]
        else:
            n1 = jnp.asarray(n1)
            logits = self._log_n2_given_n1[n1]  # [B, max_n2]
        return jax.random.categorical(key, logits, axis=-1)

    def log_prob(self, n1, n2):
        return self.log_prob_table[jnp.asarray(n1), jnp.asarray(n2)]

    def log_prob_n1_given_n2(self, n1, n2):
        return self._log_n1_given_n2[jnp.asarray(n1), jnp.asarray(n2)]

    def log_prob_n2_given_n1(self, n2, n1):
        return self._log_n2_given_n1[jnp.asarray(n1), jnp.asarray(n2)]


def smoothed_histogram(n_lig: np.ndarray, n_pocket: np.ndarray,
                       smooth_sigma: float = 1.0) -> np.ndarray:
    """Build the smoothed joint size histogram the ETL produces
    (cf. process_crossdock.py:144-170)."""
    from scipy.ndimage import gaussian_filter

    idx = np.stack([np.asarray(n_lig), np.asarray(n_pocket)], axis=1)
    hist = np.zeros((idx[:, 0].max() + 1, idx[:, 1].max() + 1))
    for i, j in idx:
        hist[i, j] += 1
    return gaussian_filter(hist, sigma=smooth_sigma)


def default_histogram(max_lig: int = 48, max_pocket: int = 600) -> np.ndarray:
    """A synthetic fallback joint histogram (used when no processed dataset
    is on disk — e.g. smoke tests): ligand sizes ~N(24, 8), pocket sizes
    ~N(350, 120), mildly correlated."""
    li = np.arange(max_lig + 1)[:, None]
    pi = np.arange(max_pocket + 1)[None, :]
    mu_l = 24.0 + 0.01 * (pi - 350.0)
    hist = np.exp(-0.5 * ((li - mu_l) / 8.0) ** 2
                  - 0.5 * ((pi - 350.0) / 120.0) ** 2)
    hist[:6, :] = 0  # no tiny ligands
    return hist
