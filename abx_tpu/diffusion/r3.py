"""VP-SDE diffusion for backbone translations in R^3 (TPU-native).

Closed-form marginals/score of the variance-preserving SDE with a linear
beta(t) schedule, matching /root/reference/diffuser/r3_diffuser.py.

Parity note (SURVEY.md §2.10): the reference's Euler–Maruyama reverse step
uses `g_t * dt * z` for the noise term (r3_diffuser.py:137) instead of the
mathematically standard `g_t * sqrt(dt) * z`.  Released checkpoints were
sampled with that behaviour, so it is reproduced when
`parity_dt_noise=True` (default); set False for the corrected discretisation.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class R3Config:
    min_b: float = 0.1
    max_b: float = 20.0
    coordinate_scaling: float = 0.1
    parity_dt_noise: bool = True


class R3Diffuser:
    def __init__(self, config: R3Config = R3Config()):
        self.config = config

    # -- scaling ------------------------------------------------------------
    def scale(self, x):
        return x * self.config.coordinate_scaling

    def unscale(self, x):
        return x / self.config.coordinate_scaling

    # -- schedule -----------------------------------------------------------
    def b_t(self, t):
        c = self.config
        return c.min_b + t * (c.max_b - c.min_b)

    def marginal_b_t(self, t):
        c = self.config
        return t * c.min_b + 0.5 * t**2 * (c.max_b - c.min_b)

    def diffusion_coef(self, t):
        return jnp.sqrt(self.b_t(t))[:, None, None]

    def drift_coef(self, x, t):
        return -0.5 * self.b_t(t)[:, None, None] * x

    def conditional_var(self, t):
        return 1.0 - jnp.exp(-self.marginal_b_t(t))

    def score_scaling(self, t):
        return 1.0 / jnp.sqrt(self.conditional_var(t))

    # -- closed forms -------------------------------------------------------
    def score(self, x_t, x_0, t, scale: bool = False):
        """Score of p(x_t | x_0); inputs (B, L, 3), t (B,)."""
        if scale:
            x_t, x_0 = self.scale(x_t), self.scale(x_0)
        t = t[:, None, None]
        return -(x_t - jnp.exp(-0.5 * self.marginal_b_t(t)) * x_0) \
            / self.conditional_var(t)

    def calc_trans_0(self, score_t, x_t, t):
        """Invert the score relation to recover x_0 (scaled units)."""
        beta_t = self.marginal_b_t(t)[..., None, None]
        cond_var = 1.0 - jnp.exp(-beta_t)
        return (score_t * cond_var + x_t) / jnp.exp(-0.5 * beta_t)

    def forward_marginal(self, key, x_0, t) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Sample p(x_t | x_0); x_0 in Angstroms, returns (x_t_A, score)."""
        x_0s = self.scale(x_0)
        log_mean_coeff = -0.5 * self.marginal_b_t(t)
        shape = (t.shape[0],) + (1,) * (x_0.ndim - 1)
        log_mean_coeff = log_mean_coeff.reshape(shape)
        mean = jnp.exp(log_mean_coeff) * x_0s
        std = jnp.sqrt(1.0 - jnp.exp(2.0 * log_mean_coeff))
        x_t = mean + std * jax.random.normal(key, x_0.shape)
        score_t = self.score(x_t, x_0s, t)
        return self.unscale(x_t), score_t

    def sample_ref(self, key, shape):
        return jax.random.normal(key, tuple(shape) + (3,))

    def reverse(self, key, x_t, score_t, t, dt,
                mask: Optional[jnp.ndarray] = None, center: bool = True,
                noise_scale: float = 1.0, z: Optional[jnp.ndarray] = None):
        """One Euler–Maruyama reverse step; x_t in Angstroms.

        `z` optionally injects the standard-normal draw (shared-noise parity
        harness); when None it is drawn from `key`.
        """
        x_s = self.scale(x_t)
        g_t = self.diffusion_coef(t)
        f_t = self.drift_coef(x_s, t)
        if z is None:
            z = jax.random.normal(key, score_t.shape)
        z = noise_scale * z
        noise_dt = dt if self.config.parity_dt_noise else jnp.sqrt(dt)
        perturb = (f_t - g_t**2 * score_t) * dt + g_t * noise_dt * z

        if mask is not None:
            perturb = perturb * mask[..., None]
        else:
            mask = jnp.ones(x_t.shape[:-1])
        x_t_1 = x_s - perturb
        if center:
            com = jnp.sum(x_t_1, axis=-2) / jnp.sum(mask, axis=-1,
                                                    keepdims=True)
            x_t_1 = x_t_1 - com[..., None, :]
        return self.unscale(x_t_1)
