"""Learned monotone noise schedule (VDM-style GammaNetwork).

Re-implements the reference ``PositiveLinear`` / ``GammaNetwork``
(en_diffusion.py:1036-1107): softplus-positive weights make gamma_tilde
monotone in t; the output is normalized to [0, 1] over the unit interval
and rescaled to the learned [gamma_0, gamma_1].  Only usable with the VLB
objective (en_diffusion.py:30-32).

The predefined-schedule path keeps using the precomputed table in
schedules.GammaSchedule; this module provides a drop-in ``LearnedGamma``
whose ``__call__(t_norm)`` matches that interface so the diffusion cores
can consume either.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class PositiveLinear(nn.Module):
    """Linear layer with softplus-positive weights
    (en_diffusion.py:1036-1066); weight_init_offset shifts the raw kernel
    so initial effective weights are small."""

    features: int
    weight_init_offset: float = -2.0

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            lambda key, shape: (nn.initializers.kaiming_uniform()(
                key, shape) + self.weight_init_offset),
            (x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x @ jax.nn.softplus(kernel) + bias


class GammaNetwork(nn.Module):
    """Monotone gamma(t): l1 + l3(sigmoid(l2(l1(t)))), normalized over
    [0, 1] and rescaled to learnable [gamma_0, gamma_1]
    (en_diffusion.py:1069-1107)."""

    hidden: int = 1024

    @nn.compact
    def __call__(self, t):
        """t: [...] normalized times -> gamma same shape."""
        shape = t.shape
        t = t.reshape(-1, 1)
        l1 = PositiveLinear(1, name="l1")
        l2 = PositiveLinear(self.hidden, name="l2")
        l3 = PositiveLinear(1, name="l3")
        gamma_0 = self.param("gamma_0",
                             lambda k, s: jnp.full(s, -5.0), (1,))
        gamma_1 = self.param("gamma_1",
                             lambda k, s: jnp.full(s, 10.0), (1,))

        def gamma_tilde(tt):
            l1_t = l1(tt)
            return l1_t + l3(jax.nn.sigmoid(l2(l1_t)))

        zeros = jnp.zeros_like(t)
        ones = jnp.ones_like(t)
        g0, g1, gt = gamma_tilde(zeros), gamma_tilde(ones), gamma_tilde(t)
        normalized = (gt - g0) / (g1 - g0)
        gamma = gamma_0 + (gamma_1 - gamma_0) * normalized
        return gamma.reshape(shape)


class LearnedGamma(NamedTuple):
    """GammaSchedule-compatible wrapper around GammaNetwork params."""

    module: GammaNetwork
    params: dict
    timesteps: int

    def __call__(self, t_norm):
        return self.module.apply(self.params, jnp.asarray(t_norm))

    def at_step(self, step):
        return self(jnp.asarray(step, jnp.float32) / self.timesteps)

    @property
    def table(self):
        return self(jnp.arange(self.timesteps + 1) / self.timesteps)


def make_learned_gamma(timesteps: int, key=None) -> LearnedGamma:
    key = key if key is not None else jax.random.PRNGKey(0)
    module = GammaNetwork()
    params = module.init(key, jnp.zeros((2,)))
    return LearnedGamma(module, params, timesteps)
