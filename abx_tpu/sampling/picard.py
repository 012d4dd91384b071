"""Parallel-in-time (Picard) sampling: the reverse trajectory as a fixpoint.

With every primitive noise draw pre-generated (the same injection mechanism
the shared-noise parity harness uses — `JointDiffuser.reverse(noise=...)`,
diffusion/joint.py), the per-step transition becomes a deterministic map F,
and the sequential trajectory s_{i+1} = F(s_i, x_i) is the unique fixed
point of the parallel sweep

    S'[0]   = s_0
    S'[i+1] = F(S[i], x_i)        for ALL i at once (one batched model call)

iterated from the trivial initial guess S[i] = s_0.  Sweep k fixes the
prefix of length k exactly (position i's input is final once positions < i
are), so the iteration reaches the BITWISE sequential result in at most
num_steps sweeps — and in practice far fewer, because late-trajectory steps
are near-contractions.  This is the Picard / parallel-shooting scheme of
ParaDiGMS (Shih et al., 2023; PAPERS.md) specialised to this sampler's
joint SE(3) x sequence state.

TPU mapping: one sweep evaluates the score network at every grid position
simultaneously — a (num_steps, ...) leading axis that shards over the mesh
(`parallel/mesh.py`), so a single design's 100-step latency scales with
chips instead of being serial in num_t.  The sequential reference loop
(/root/reference/inference.py:180-273) has no analogue.

Cost model — one sweep costs num_steps step-evaluations, so total work is
sweeps_used x the sequential work and wall-clock speedup on D chips is
~ D/sweeps_used.  **MEASURED ON-CHIP (round 5, runs/picard_probe +
BASELINE.md): sweeps_used = num_t at the flagship shape** — the per-sweep
delta falls one grid position per sweep because a single diverged
tau-leap jump site keeps all downstream positions diverged until the
exact prefix reaches them (the ParaDiGMS near-contraction assumption
fails on the discrete track of the joint SE(3) x CTMC state).  Projected
v5e-8 latency is 7-8x WORSE than the sequential scan, and the num_t=100
whole-grid program exceeds single-chip compile/memory limits.  This
module is therefore a correctness-validated deterministic-replay
capability and a measured negative result, NOT a latency lever; use
batch/data parallelism for latency and throughput.  Memory: the state at
every grid position is alive at once (dominated by prev_pair,
num_steps x B x L x L x C_pair), sharded over the mesh's time axis.

Exactness: run to `tol=0.0` (bitwise sweep-to-sweep fixpoint) and the
output IS the sequential sampler's output for the same injected noise, up
to compiler re-association between the scan-body and vmap-body compilations
(tested at 1e-4; sequence trajectories match exactly).  `tol > 0` stops at
an approximate fixpoint (standard Picard stopping; the converged prefix of
length sweeps_used is always exact regardless of tol).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def draw_noise(key, grid_len: int, batch: int, length: int,
               num_states: int = 20) -> Dict[str, jnp.ndarray]:
    """Pre-draw the production-equivalent primitive noise for a whole grid.

    Matches the draws `JointDiffuser.reverse` makes internally: per step,
    'rot_z'/'trans_z' ~ N(0,1) of (B, L, 3) and 'seq_u' ~ U[0,1) of
    (B, L, S) (Poisson jump counts are drawn from the uniforms by inverse
    CDF — exact, diffusion/discrete.py:159-162).  `grid_len` must be the
    FULL step-grid length: num_t + 1 when the self-conditioning prime step
    is on (`Sampler._step_grids`); the prime slot's draws are consumed by a
    discarded reverse, as in the sequential path.
    """
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        'rot_z': jax.random.normal(k1, (grid_len, batch, length, 3)),
        'trans_z': jax.random.normal(k2, (grid_len, batch, length, 3)),
        'seq_u': jax.random.uniform(k3, (grid_len, batch, length,
                                         num_states)),
    }


def _max_abs_delta(a, b) -> jnp.ndarray:
    """Max |a - b| over every leaf of two identically-shaped pytrees
    (ints included), as one f32 scalar — 0.0 iff bitwise-identical."""
    leaves = jax.tree.leaves(
        jax.tree.map(lambda x, y: jnp.max(jnp.abs(
            x.astype(jnp.float32) - y.astype(jnp.float32))), a, b))
    return functools.reduce(jnp.maximum, leaves)


def picard_sample(sampler, params, feats, key,
                  noise: Optional[Dict[str, jnp.ndarray]] = None,
                  max_sweeps: Optional[int] = None, tol: float = 0.0,
                  mesh=None, axis_name: str = 'data'
                  ) -> Dict[str, Any]:
    """Run `sampler`'s full reverse process by parallel Picard iteration.

    Args:
        sampler: a `sampling.sampler.Sampler` (any mode; its jitted chunk
            step is reused, so numerics are the production step's).
        noise: pre-drawn primitive draws (see `draw_noise`); drawn from
            `key`'s scan split when omitted — either way every step's
            randomness is injected, which is what makes F deterministic.
        max_sweeps: sweep budget; defaults to the grid length (the bound
            at which convergence is guaranteed).
        tol: sweep-to-sweep max-abs state change to stop at.  0.0 = run to
            the bitwise fixpoint (exactly the sequential trajectory).
        mesh: optional `jax.sharding.Mesh`; the TIME axis (grid positions)
            is sharded over `axis_name`, padding the grid to a multiple of
            the mesh size with discarded replicas of the last step.

    Returns: the `Sampler.sample` result dict, plus
        result['picard'] = {'sweeps': int, 'deltas': [per-sweep float]}.
    """
    c = sampler.config
    state0, static, static_acts, diffuse_mask, k_scan = sampler._init(
        params, feats, key)
    state0 = sampler._add_esm_cache(params, sampler.esm_params, state0,
                                    static)
    ts, ts_model, is_prime, refresh = sampler._step_grids()
    n = int(ts.shape[0])
    b, l = static['seq'].shape
    if noise is None:
        s = int(sampler.diffuser.seq.num_states) \
            if hasattr(sampler.diffuser, 'seq') else 20
        noise = draw_noise(k_scan, n, b, l, num_states=s)
    for k_, v in noise.items():
        assert v.shape[0] == n, (
            f'noise[{k_!r}] leading dim {v.shape[0]} != grid length {n} '
            '(num_t + 1 with the self-conditioning prime step)')

    # Pad the time axis so it shards evenly; padded positions recompute the
    # last step on whatever state sits there and are discarded.
    n_pad = n
    if mesh is not None:
        d = int(mesh.devices.size)
        n_pad = n + ((-n) % d)
    pad_t = n_pad - n

    def pad_time(x):
        if pad_t == 0:
            return x
        return jnp.concatenate(
            [x] + [x[-1:]] * pad_t, axis=0)

    xs_all = jax.tree.map(pad_time, (ts, ts_model, is_prime, refresh, noise))

    # Initial guess: every position's input state is s_0.
    states_in = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (n_pad,) + x.shape), state0)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        time_sharded = NamedSharding(mesh, P(axis_name))
        rep = NamedSharding(mesh, P())
        states_in = jax.tree.map(
            lambda x: jax.device_put(x, time_sharded), states_in)
        xs_all = jax.tree.map(
            lambda x: jax.device_put(x, time_sharded), xs_all)
        state0 = jax.tree.map(lambda x: jax.device_put(x, rep), state0)

    dummy_key = jax.random.PRNGKey(0)  # split in-step, never consumed:
    # every reverse-step draw is injected via `noise`.

    def step_one(state, t, t_model, prime, refr, noise_i):
        xs = (t[None], t_model[None], prime[None], refr[None],
              jax.tree.map(lambda a: a[None], noise_i))
        st, _, out = sampler._run_chunk(
            params, sampler.esm_params, static, static_acts, diffuse_mask,
            state, dummy_key, xs)
        return st, jax.tree.map(lambda a: a[0], out)

    @jax.jit
    def sweep(states):
        states_out, outs = jax.vmap(step_one)(states, *xs_all[:4],
                                              xs_all[4])
        # Next guess: position 0 keeps s_0; position i+1 gets step i's
        # output.  Only the REAL n positions feed the shift/convergence.
        shifted = jax.tree.map(
            lambda s0, so: jnp.concatenate(
                [s0[None], so[:n - 1],
                 so[n - 1:n_pad - 1] if pad_t else so[:0]], axis=0),
            state0, states_out)
        delta = _max_abs_delta(
            jax.tree.map(lambda x: x[:n], shifted),
            jax.tree.map(lambda x: x[:n], states))
        return shifted, states_out, outs, delta

    budget = max_sweeps if max_sweeps is not None else n + 1
    deltas = []
    states_out = outs = None
    for _ in range(budget):
        states_in, states_out, outs, delta = sweep(states_in)
        deltas.append(float(delta))
        if deltas[-1] <= tol:
            break

    steps_out = jax.tree.map(lambda x: x[:n], outs)
    final_state = jax.tree.map(lambda x: x[n - 1], states_out)
    if c.self_conditioning and sampler.reverse_steps.shape[0] > 0:
        steps_out = jax.tree.map(lambda x: x[1:], steps_out)
    last = jax.tree.map(lambda x: x[-1], steps_out)
    result = {
        'rigids': final_state['rigids_t'],
        'seq': last['seq'],
        'atom14': last['atom14'],
        'plddt': last['plddt'],
        'diffuse_mask': diffuse_mask,
        'gt_atom14': static['atom14_gt_positions'],
        'picard': {'sweeps': len(deltas), 'deltas': deltas},
    }
    if c.collect_trajectory:
        result['trajectory'] = steps_out
    return result
