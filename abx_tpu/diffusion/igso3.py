"""IGSO(3) score-based diffusion on rotations (TPU-native).

Implements the same mathematical surface as the reference SO3 diffuser
(/root/reference/diffuser/so3_diffuser.py): a truncated power-series IGSO(3)
density with a logarithmic sigma(t) schedule, inverse-CDF sampling of the
rotation angle, cached score-norm lookup, and a geodesic-random-walk reverse
step.

TPU-first design decisions:
  * The pdf/cdf/score-norm tables are built ONCE on the host (vectorised
    numpy, float64) and then live as device constants; every per-step
    operation inside the sampler is a pure gather/`searchsorted`, so the whole
    reverse loop stays inside one `lax.scan`.
  * Sampling and scoring are shape-polymorphic over (B, L) and keyed by
    explicit JAX PRNG keys, giving deterministic per-sample reproducibility
    (the failure-recovery story SURVEY.md §5 asks for).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from abx_tpu.geometry import quat as quat_ops
from abx_tpu.geometry.quat import safe_norm


@dataclasses.dataclass(frozen=True)
class SO3Config:
    num_omega: int = 1000
    num_sigma: int = 1000
    min_sigma: float = 0.1
    max_sigma: float = 1.5
    schedule: str = 'logarithmic'
    cache_dir: str = '.cache'
    use_cached_score: bool = True
    expansion_levels: int = 1000  # L truncation of the power series.


def _igso3_expansion(omega: np.ndarray, eps: np.ndarray,
                     levels: int) -> np.ndarray:
    """Truncated IGSO(3) series; omega (O,), eps scalar -> (O,)."""
    ls = np.arange(levels, dtype=np.float64)[None, :]
    omega = omega[:, None]
    p = ((2 * ls + 1) * np.exp(-ls * (ls + 1) * eps**2 / 2.0)
         * np.sin(omega * (ls + 0.5)) / np.sin(omega / 2.0))
    return p.sum(axis=-1)


def _igso3_score_series(expansion: np.ndarray, omega: np.ndarray,
                        eps: np.ndarray, levels: int) -> np.ndarray:
    """d/d omega log f(omega) via quotient rule (reference :72-112)."""
    ls = np.arange(levels, dtype=np.float64)[None, :]
    omega = omega[:, None]
    hi = np.sin(omega * (ls + 0.5))
    dhi = (ls + 0.5) * np.cos(omega * (ls + 0.5))
    lo = np.sin(omega / 2.0)
    dlo = 0.5 * np.cos(omega / 2.0)
    d_sigma = ((2 * ls + 1) * np.exp(-ls * (ls + 1) * eps**2 / 2.0)
               * (lo * dhi - hi * dlo) / lo**2).sum(axis=-1)
    return d_sigma / (expansion + 1e-4)


class SO3Diffuser:
    """Stateless-per-step IGSO(3) diffuser with device-resident tables."""

    def __init__(self, config: SO3Config = SO3Config()):
        self.config = config
        c = config
        if c.schedule != 'logarithmic':
            raise ValueError(f'Unknown schedule {c.schedule}')

        # Host-side grids.
        self._np_omega = np.linspace(0, np.pi, c.num_omega + 1)[1:]
        ts = np.linspace(0.0, 1.0, c.num_sigma)
        self._np_sigma_grid = np.log(
            ts * np.exp(c.max_sigma) + (1 - ts) * np.exp(c.min_sigma))

        pdf, cdf, score_norms = self._build_or_load_tables()

        scaling = np.sqrt(np.abs(
            np.sum(score_norms**2 * pdf, axis=-1)
            / np.sum(pdf, axis=-1))) / np.sqrt(3.0)

        # Device constants.
        self.discrete_omega = jnp.asarray(self._np_omega, dtype=jnp.float32)
        self.discrete_sigma = jnp.asarray(self._np_sigma_grid,
                                          dtype=jnp.float32)
        self._pdf = jnp.asarray(pdf, dtype=jnp.float32)
        self._cdf = jnp.asarray(cdf, dtype=jnp.float32)
        self._score_norms = jnp.asarray(score_norms, dtype=jnp.float32)
        self._score_scaling = jnp.asarray(scaling, dtype=jnp.float32)

    # -- table construction -------------------------------------------------
    def _cache_path(self) -> str:
        c = self.config
        tag = (f'igso3_s{c.num_sigma}_o{c.num_omega}'
               f'_{c.min_sigma}_{c.max_sigma}_{c.schedule}'
               f'_L{c.expansion_levels}').replace('.', '_')
        return os.path.join(c.cache_dir, tag + '.npz')

    def _build_or_load_tables(self):
        path = self._cache_path()
        if os.path.exists(path):
            with np.load(path) as z:
                return z['pdf'], z['cdf'], z['score_norms']
        c = self.config
        num_o = c.num_omega
        pdf = np.zeros((c.num_sigma, num_o))
        score_norms = np.zeros((c.num_sigma, num_o))
        for i, sigma in enumerate(self._np_sigma_grid):
            exp_vals = _igso3_expansion(self._np_omega, sigma,
                                        c.expansion_levels)
            pdf[i] = exp_vals * (1 - np.cos(self._np_omega)) / np.pi
            score_norms[i] = _igso3_score_series(
                exp_vals, self._np_omega, sigma, c.expansion_levels)
        cdf = np.cumsum(pdf, axis=-1) / num_o * np.pi
        try:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            np.savez(path, pdf=pdf, cdf=cdf, score_norms=score_norms)
        except OSError:
            pass
        return pdf, cdf, score_norms

    # -- schedule -----------------------------------------------------------
    def sigma(self, t):
        c = self.config
        return jnp.log(t * jnp.exp(c.max_sigma) + (1 - t) * jnp.exp(c.min_sigma))

    def diffusion_coef(self, t):
        c = self.config
        sigma_t = self.sigma(t)
        return jnp.sqrt(
            2 * (jnp.exp(c.max_sigma) - jnp.exp(c.min_sigma))
            * sigma_t / jnp.exp(sigma_t))

    def t_to_idx(self, t):
        """Continuous t -> index into the sigma grid (traced-safe)."""
        sigma = self.sigma(t)
        return jnp.sum(
            (self.discrete_sigma[None, ...] <= sigma[..., None] + 1e-5)
            .astype(jnp.int32), axis=-1) - 1

    # -- sampling -----------------------------------------------------------
    def sample_igso3(self, key, t, shape) -> jnp.ndarray:
        """Inverse-CDF sample of rotation angles; t (B,), shape (B, ...)."""
        x = jax.random.uniform(key, shape)
        cdf_rows = self._cdf[self.t_to_idx(t)]  # (B, num_omega)

        def interp_row(xs, cdf_row):
            return jnp.interp(xs, cdf_row, self.discrete_omega)

        flat_x = x.reshape(x.shape[0], -1)
        omega = jax.vmap(interp_row)(flat_x, cdf_rows)
        return omega.reshape(shape)

    def sample(self, key, t, shape) -> jnp.ndarray:
        """IGSO(3) rotation-vector samples of shape (*shape, 3)."""
        k_axis, k_angle = jax.random.split(key)
        axis = jax.random.normal(k_axis, tuple(shape) + (3,))
        axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
        return axis * self.sample_igso3(k_angle, t, tuple(shape))[..., None]

    def sample_ref(self, key, shape) -> jnp.ndarray:
        t = jnp.ones((shape[0],))
        return self.sample(key, t, shape)

    # -- scoring ------------------------------------------------------------
    def score(self, vec, t, eps: float = 1e-6) -> jnp.ndarray:
        """Score of the IGSO(3) density at rotation vectors `vec` (B, L, 3)."""
        omega = safe_norm(vec, keepdims=False) + eps
        score_norms_t = self._score_norms[self.t_to_idx(t)]  # (B, num_omega)
        omega_idx = jnp.searchsorted(
            self.discrete_omega[:-1], omega, side='left')  # (B, L)
        omega_scores = jnp.take_along_axis(score_norms_t, omega_idx, axis=-1)
        return omega_scores[..., None] * vec / (omega[..., None] + eps)

    def score_scaling(self, t):
        return self._score_scaling[self.t_to_idx(t)]

    # -- forward / reverse --------------------------------------------------
    def forward_marginal(self, key, rot_0, t) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Noise rotations to time t; rot_0 (B, L, 3) rotation vectors."""
        shape = rot_0.shape[:-1]
        sampled = self.sample(key, t, shape)
        rot_score = self.score(sampled, t)
        quat_0 = quat_ops.rotvec_to_quat(rot_0)
        quat_t = quat_ops.quat_multiply(quat_0, quat_ops.rotvec_to_quat(sampled))
        return quat_ops.quat_to_rotvec(quat_t), rot_score

    def reverse(self, key, rot_t, score_t, t, dt,
                mask: Optional[jnp.ndarray] = None,
                noise_scale: float = 1.0,
                z: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """One geodesic-random-walk reverse step (reference :328-361).

        `z` optionally injects the standard-normal draw (shared-noise parity
        harness); when None it is drawn from `key`.
        """
        g_t = self.diffusion_coef(t)[:, None, None]
        if z is None:
            z = jax.random.normal(key, score_t.shape)
        z = noise_scale * z
        perturb = (g_t**2) * score_t * dt + g_t * jnp.sqrt(dt) * z
        if mask is not None:
            perturb = perturb * mask[..., None]
        quat_t1 = quat_ops.quat_multiply(
            quat_ops.rotvec_to_quat(rot_t), quat_ops.rotvec_to_quat(perturb))
        return quat_ops.quat_to_rotvec(quat_t1)
