"""Noise schedules and the alpha/sigma algebra of the variational DDPM.

Replaces the reference ``PredefinedNoiseSchedule`` / ``GammaNetwork`` and the
per-call sigmoid algebra (en_diffusion.py:83-108, :870-883, :1110-1195).
Schedules are precomputed gamma lookup tables; gamma(t) indexes the table by
``round(t * T)`` exactly as the reference does (en_diffusion.py:1193-1195),
so integer step indices can be used directly inside ``lax.scan``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def clip_noise_schedule(alphas2: np.ndarray, clip_value: float = 0.001
                        ) -> np.ndarray:
    """Clip the per-step alpha ratio for sampling stability
    (cf. en_diffusion.py:1130-1143)."""
    alphas2 = np.concatenate([np.ones(1), alphas2], axis=0)
    steps = np.clip(alphas2[1:] / alphas2[:-1], a_min=clip_value, a_max=1.0)
    return np.cumprod(steps, axis=0)


def polynomial_alphas2(timesteps: int, s: float = 1e-4, power: float = 3.0
                       ) -> np.ndarray:
    """alpha_t^2 = (1 - (t/T)^power)^2, clipped and precision-scaled
    (cf. en_diffusion.py:1146-1160)."""
    steps = timesteps + 1
    x = np.linspace(0, steps, steps)
    alphas2 = (1 - np.power(x / steps, power)) ** 2
    alphas2 = clip_noise_schedule(alphas2, clip_value=0.001)
    precision = 1 - 2 * s
    return precision * alphas2 + s


def cosine_alphas2(timesteps: int, s: float = 0.008,
                   raise_to_power: float = 1.0) -> np.ndarray:
    """Nichol & Dhariwal cosine schedule (cf. en_diffusion.py:1110-1127)."""
    steps = timesteps + 2
    x = np.linspace(0, steps, steps)
    alphas_cumprod = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = np.clip(1 - (alphas_cumprod[1:] / alphas_cumprod[:-1]), 0, 0.999)
    out = np.cumprod(1.0 - betas, axis=0)
    if raise_to_power != 1:
        out = np.power(out, raise_to_power)
    return out


class GammaSchedule(NamedTuple):
    """gamma = log(sigma^2 / alpha^2) lookup table of length T+1."""

    table: jnp.ndarray  # [T+1] float32
    timesteps: int

    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        """gamma at normalized time t in [0, 1]; any shape."""
        idx = jnp.round(t * self.timesteps).astype(jnp.int32)
        return self.table[jnp.clip(idx, 0, self.timesteps)]

    def at_step(self, step: jnp.ndarray) -> jnp.ndarray:
        """gamma at integer step index (0..T)."""
        return self.table[jnp.clip(step, 0, self.timesteps)]


def make_schedule(name: str, timesteps: int, precision: float = 1e-4
                  ) -> GammaSchedule:
    if name == "cosine":
        alphas2 = cosine_alphas2(timesteps)
    elif "polynomial" in name:
        power = float(name.split("_")[1])
        alphas2 = polynomial_alphas2(timesteps, s=precision, power=power)
    else:
        raise ValueError(f"unknown noise schedule {name!r}")
    sigmas2 = 1.0 - alphas2
    gamma = -(np.log(alphas2) - np.log(sigmas2))
    return GammaSchedule(table=jnp.asarray(gamma, dtype=jnp.float32),
                         timesteps=timesteps)


# ---------------------------------------------------------------------------
# alpha / sigma algebra (en_diffusion.py:83-108, :870-883)
# ---------------------------------------------------------------------------

def alpha(gamma: jnp.ndarray) -> jnp.ndarray:
    """alpha = sqrt(sigmoid(-gamma))."""
    return jnp.sqrt(jax.nn.sigmoid(-gamma))


def sigma(gamma: jnp.ndarray) -> jnp.ndarray:
    """sigma = sqrt(sigmoid(gamma))."""
    return jnp.sqrt(jax.nn.sigmoid(gamma))


def snr(gamma: jnp.ndarray) -> jnp.ndarray:
    """Signal-to-noise ratio alpha^2/sigma^2 = exp(-gamma)."""
    return jnp.exp(-gamma)


def sigma_and_alpha_t_given_s(gamma_t: jnp.ndarray, gamma_s: jnp.ndarray):
    """Transition coefficients between two noise levels
    (cf. en_diffusion.py:83-108).

    Returns (sigma2_t|s, sigma_t|s, alpha_t|s), same shape as inputs.
    """
    sigma2_t_given_s = -jnp.expm1(jax.nn.softplus(gamma_s)
                                  - jax.nn.softplus(gamma_t))
    log_alpha2_t = jax.nn.log_sigmoid(-gamma_t)
    log_alpha2_s = jax.nn.log_sigmoid(-gamma_s)
    alpha_t_given_s = jnp.exp(0.5 * (log_alpha2_t - log_alpha2_s))
    return sigma2_t_given_s, jnp.sqrt(sigma2_t_given_s), alpha_t_given_s


def check_norm_values(schedule: GammaSchedule, norm_value: float,
                      num_stdevs: int = 8) -> None:
    """Sanity check that sigma_0 is small relative to the categorical
    normalization (cf. en_diffusion.py:68-81)."""
    sigma_0 = float(sigma(schedule.at_step(jnp.zeros((), jnp.int32))))
    if sigma_0 * num_stdevs > 1.0 / norm_value:
        raise ValueError(
            f"normalization value {norm_value} too large for sigma_0="
            f"{sigma_0:.5f} (1/norm_value={1.0 / norm_value})")
