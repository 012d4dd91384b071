"""Continuous-time uniform-rate discrete diffusion over amino-acid types.

Same process as /root/reference/diffuser/discrete_diffuser.py: a CTMC with
uniform off-diagonal rate `c` over S=20 states, tau-leaping reverse jumps
driven by model logits, plus the auxiliary single-site corruption used by the
training ELBO.

TPU-first design: the reference diagonalises the rate matrix numerically; the
uniform-rate CTMC has a closed-form transition kernel
    exp(tR)_ij = 1/S + (delta_ij - 1/S) * exp(-c*S*t)
which we use directly — exact, cheap, and trace-friendly.  All sampling is
vectorised `jax.random` (categorical / poisson) keyed explicitly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from abx_tpu.common import residue_constants as rc


def poisson_counts_from_uniform(lam, u, max_k: int = 16):
    """Poisson counts by inverse CDF from shared uniforms `u`.

    k = #{j < max_k : CDF(j) < u}, the smallest k with CDF(k) >= u.  Used by
    the shared-noise parity harness: the torch reference side draws with the
    SAME formula from the SAME uniforms, so identical rates give identical
    jump counts.  The cumulative sum uses the forward pmf recurrence
    term_{j} = term_{j-1} * lam / j so both sides share the op order; the
    tail above max_k is truncated (lam = rate*dt << 1 in practice).
    """
    term = jnp.exp(-lam)
    cdf = term
    counts = (u > cdf).astype(jnp.int32)
    for j in range(1, max_k):
        term = term * lam / j
        cdf = cdf + term
        counts = counts + (u > cdf).astype(jnp.int32)
    return counts


@dataclasses.dataclass(frozen=True)
class DiscreteConfig:
    rate_const: float = 0.3
    num_states: int = rc.restype_num  # 20


class DiscreteDiffuser:
    def __init__(self, config: DiscreteConfig = DiscreteConfig()):
        self.config = config
        c, s = config.rate_const, config.num_states
        rate = c * (jnp.ones((s, s)) - jnp.eye(s))
        rate = rate - jnp.diag(jnp.sum(rate, axis=1))
        self.rate_matrix = rate  # (S, S)

    @property
    def num_states(self):
        return self.config.num_states

    def rate(self, t):
        """(B, S, S) rate matrix (time-independent)."""
        return jnp.broadcast_to(
            self.rate_matrix, (t.shape[0],) + self.rate_matrix.shape)

    def transition(self, t):
        """exp(t * R) in closed form, with tiny values snapped to 0 to match
        the reference's post-eig cleanup (discrete_diffuser.py:65)."""
        s = self.num_states
        decay = jnp.exp(-self.config.rate_const * s * t)  # (B,)
        uniform = jnp.full((s, s), 1.0 / s)
        delta = jnp.eye(s) - uniform
        q = uniform[None] + decay[:, None, None] * delta[None]
        return jnp.where(q < 1e-8, 0.0, q)

    def sample_ref(self, key, shape):
        return jax.random.randint(key, shape, 0, self.num_states,
                                  dtype=jnp.int32)

    def forward_marginal(self, key, x_0, t, return_xt: bool = False):
        """Sample x_t ~ q(x_t|x_0) plus one auxiliary corrupted site.

        Returns (x_tilde, q_t0, rate_t); the extra site feeds the CTMC ELBO
        (reference :72-127).  With `return_xt`, also returns the pre-
        corruption x_t as a 4th element — the exact tau-leaping ELBO
        (Campbell et al.) needs the (x_t, x_tilde) jump pair.
        """
        batch, length = x_0.shape
        qt0 = self.transition(t)          # (B, S, S)
        rate = self.rate(t)               # (B, S, S)
        x_0 = jnp.clip(x_0, 0, self.num_states - 1)

        k_xt, k_site, k_val = jax.random.split(key, 3)

        # qt0[b, x_0[b, d], :] -> per-example row gather.
        rows = jax.vmap(lambda q, idx: q[idx])(qt0, x_0.astype(jnp.int32))
        x_t = jax.random.categorical(k_xt, jnp.log(rows + 1e-35), axis=-1)
        x_t = x_t.astype(jnp.int32)

        # Rate rows at the sampled state, diagonal zeroed.
        rate_rows = jax.vmap(lambda r, idx: r[idx])(rate, x_t)  # (B, D, S)
        onehot_xt = jax.nn.one_hot(x_t, self.num_states)
        rate_rows = rate_rows * (1.0 - onehot_xt)
        rate_rows = jnp.maximum(rate_rows, 0.0)

        # Choose one site per example proportional to total outgoing rate,
        # then a new value proportional to that site's rates.
        site_weights = jnp.sum(rate_rows, axis=-1)  # (B, D)
        site = jax.random.categorical(k_site, jnp.log(site_weights + 1e-35),
                                      axis=-1)  # (B,)
        site_rates = jax.vmap(lambda r, s: r[s])(rate_rows, site)  # (B, S)
        new_val = jax.random.categorical(
            k_val, jnp.log(site_rates + 1e-35), axis=-1).astype(jnp.int32)
        x_tilde = jax.vmap(
            lambda x, s, v: x.at[s].set(v))(x_t, site, new_val)
        if return_xt:
            return x_tilde, qt0, rate, x_t
        return x_tilde, qt0, rate

    def reverse_rates(self, x_t, logits_t, t, eps_ratio: float = 1e-9):
        """Model-implied reverse jump rates R̂_t(x_t -> s), (B, D, S).

        R̂_t(x, s) = R(s, x) * sum_{x0} p(x0 | x_t) q_{t|0}(s | x0) /
        q_{t|0}(x | x0) — the tauLDR rate the tau-leaping `reverse` step
        leaps with (reference discrete_diffuser.py:130-190).  Diagonal
        zeroed."""
        batch, length = x_t.shape
        s = self.num_states
        t_vec = jnp.broadcast_to(jnp.asarray(t), (batch,)).astype(jnp.float32)
        x_t = jnp.clip(x_t, 0, s - 1).astype(jnp.int32)

        p0t = jax.nn.softmax(logits_t, axis=-1)          # (B, D, S)
        qt0 = self.transition(t_vec)                      # (B, S, S)
        rate = self.rate(t_vec)                           # (B, S, S)

        # qt0_denom[b, d, s] = qt0[b, s, x_t[b, d]]
        qt0_cols = jnp.take_along_axis(
            qt0, x_t[:, None, :], axis=2)                 # (B, S, D)
        qt0_denom = jnp.swapaxes(qt0_cols, 1, 2) + eps_ratio  # (B, D, S)
        # forward_rates[b, d, s] = rate[b, s, x_t[b, d]]
        rate_cols = jnp.take_along_axis(rate, x_t[:, None, :], axis=2)
        forward_rates = jnp.swapaxes(rate_cols, 1, 2)     # (B, D, S)

        inner = jnp.einsum('bds,bsk->bdk', p0t / qt0_denom, qt0)
        reverse_rates = forward_rates * inner             # (B, D, S)
        onehot_xt = jax.nn.one_hot(x_t, s)
        return reverse_rates * (1.0 - onehot_xt)

    def corrector_rates(self, x_t, logits_t, t, eps_ratio: float = 1e-9):
        """Gibbs-corrector jump rates at FIXED time t: forward + reverse.

        The CTMC with generator R_t + R̂_t is stationary w.r.t. the noising
        marginal q_t when the model posterior is exact (Campbell et al.
        2022, predictor-corrector for discrete diffusion; tested as a
        left-nullvector identity in TestGibbsCorrector).  Extra corrector
        jumps at fixed t therefore pull the sampled marginal back toward
        q_t, repairing tau-leaping discretisation error — the role the
        Langevin corrector plays for the continuous tracks.  The uniform
        rate matrix is symmetric, so the forward rates FROM x_t equal the
        `reverse_rates` prefactor rows; kept as an explicit gather so a
        non-uniform rate matrix would stay correct."""
        rev = self.reverse_rates(x_t, logits_t, t, eps_ratio=eps_ratio)
        batch, length = x_t.shape
        s = self.num_states
        t_vec = jnp.broadcast_to(jnp.asarray(t), (batch,)).astype(jnp.float32)
        rate = self.rate(t_vec)                           # (B, S, S)
        x_i = jnp.clip(x_t, 0, s - 1).astype(jnp.int32)
        # fwd[b, d, s] = rate[b, x_t[b, d], s] (rates OUT of x_t).
        fwd = jax.vmap(lambda r, idx: r[idx])(rate, x_i)  # (B, D, S)
        fwd = fwd * (1.0 - jax.nn.one_hot(x_i, s))
        return jnp.maximum(rev + fwd, 0.0)

    def corrector(self, key, x_t, logits_t, t, dt, eps_ratio: float = 1e-9,
                  u: Optional[jnp.ndarray] = None):
        """One tau-leaping Gibbs-corrector step at fixed time t.

        Same leap mechanics as `reverse` (Poisson jump counts, net
        displacement, clip) but over `corrector_rates`, so repeated
        applications equilibrate toward q_t instead of advancing time.
        `dt` is the corrector leap size (the sampler scales the predictor
        dt by `corrector_scale`)."""
        s = self.num_states
        x_i = jnp.clip(x_t, 0, s - 1).astype(jnp.int32)
        rates = self.corrector_rates(x_i, logits_t, t, eps_ratio=eps_ratio)
        diffs = jnp.arange(s)[None, None, :] - x_i[:, :, None]
        if u is None:
            jump_nums = jax.random.poisson(key, rates * dt)
        else:
            jump_nums = poisson_counts_from_uniform(rates * dt, u)
        overall_jump = jnp.sum(jump_nums * diffs, axis=-1)
        return jnp.clip(x_i + overall_jump, 0, s - 1).astype(jnp.int32)

    def reverse(self, key, x_t, logits_t, t, dt, eps_ratio: float = 1e-9,
                u: Optional[jnp.ndarray] = None):
        """Tau-leaping reverse jump step (reference :130-190).

        Args:
            x_t: (B, D) int states.
            logits_t: (B, D, S) model logits for x_0.
            t: scalar or (B,) time.
            dt: scalar step.
            u: optional (B, D, S) uniforms: Poisson jump counts are then
                drawn by inverse CDF from `u` instead of from `key`
                (shared-noise parity harness).
        """
        s = self.num_states
        x_t = jnp.clip(x_t, 0, s - 1).astype(jnp.int32)
        reverse_rates = self.reverse_rates(x_t, logits_t, t,
                                           eps_ratio=eps_ratio)
        diffs = jnp.arange(s)[None, None, :] - x_t[:, :, None]
        if u is None:
            jump_nums = jax.random.poisson(key, reverse_rates * dt)
        else:
            jump_nums = poisson_counts_from_uniform(reverse_rates * dt, u)
        overall_jump = jnp.sum(jump_nums * diffs, axis=-1)
        return jnp.clip(x_t + overall_jump, 0, s - 1).astype(jnp.int32)
