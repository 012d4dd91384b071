"""Shared flax building blocks with AF2 initialization schemes.

Parity surface: /root/reference/abx/model/common_modules.py — the five Linear
init schemes (gate/final/attn/relu/linear), LayerNorm, and shared-broadcast
dropout.  Implemented as flax.linen modules; compute dtype is configurable so
the trunk can run bf16 on the MXU while parameters stay f32.
"""

from __future__ import annotations

import contextlib
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import random

TRUNC_NORMAL_STD_FACTOR = 0.87962566103423978  # E[|trunc N(0,1)|^2]^-1/2


def af2_initializer(init: str):
    """Weight initializer named after the AF2 scheme."""
    if init in ('gate', 'final'):
        return nn.initializers.zeros
    if init == 'attn':
        return nn.initializers.glorot_uniform()
    if init in ('relu', 'linear'):
        scale = 2.0 if init == 'relu' else 1.0

        def trunc_init(key, shape, dtype=jnp.float32):
            fan_in = shape[0]
            std = np.sqrt(scale / fan_in) / TRUNC_NORMAL_STD_FACTOR
            # truncated at 2 std like torch.nn.init.trunc_normal_.
            return std * random.truncated_normal(key, -2.0, 2.0, shape, dtype)

        return trunc_init
    raise ValueError(f'unknown init {init}')


class Linear(nn.Module):
    """Dense layer with AF2 init semantics (weights stored (in, out))."""
    features: int
    init: str = 'linear'
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param('kernel', af2_initializer(self.init),
                            (x.shape[-1], self.features))
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias_init = (nn.initializers.ones if self.init == 'gate'
                         else nn.initializers.zeros)
            bias = self.param('bias', bias_init, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class LinearParams(nn.Module):
    """Declares Linear-compatible params without running the matmul.

    Used by `fused_dense`: several projections that read the same input are
    declared individually (so the param tree — and therefore checkpoint
    conversion — is identical to separate `Linear` modules) but executed as
    ONE column-concatenated matmul.  Column concatenation is numerically
    identical to the separate matmuls (each output column is an independent
    dot product) while giving the MXU one large N instead of several small
    ones — the round-1 profile attributed ~54 ms/step to small dot_generals
    at ~5% MXU utilisation (ROADMAP.md).
    """
    features: int
    in_features: int
    init: str = 'linear'
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param('kernel', af2_initializer(self.init),
                            (self.in_features, self.features))
        bias = None
        if self.use_bias:
            bias_init = (nn.initializers.ones if self.init == 'gate'
                         else nn.initializers.zeros)
            bias = self.param('bias', bias_init, (self.features,))
        return kernel, bias


def fused_dense(x, branches, dtype):
    """One matmul over several Linear branches reading the same input.

    Args:
        x: (..., C_in) input shared by all branches.
        branches: list of (kernel (C_in, Ni), bias (Ni,) or None).
        dtype: compute dtype.
    Returns:
        list of per-branch outputs (..., Ni), equal to the separate matmuls.
    The weight concatenation is loop-invariant under `lax.scan`/jit — XLA
    hoists it out of the sampling loop, so steady-state cost is one dot.
    """
    kernel = jnp.concatenate([k.astype(dtype) for k, _ in branches], axis=-1)
    y = jnp.dot(x.astype(dtype), kernel)
    if any(b is not None for _, b in branches):
        bias = jnp.concatenate(
            [b.astype(dtype) if b is not None
             else jnp.zeros((k.shape[-1],), dtype) for k, b in branches])
        y = y + bias
    sizes = np.cumsum([k.shape[-1] for k, _ in branches])[:-1].tolist()
    return jnp.split(y, sizes, axis=-1)


_LN_TWO_PASS = False


@contextlib.contextmanager
def two_pass_layer_norm():
    """Trace-scoped guard: inside this context every `layer_norm` uses the
    classic two-pass variance E[(x-mean)^2] instead of the fused one-pass
    E[x^2]-E[x]^2.

    The one-pass form reads x once (the right trade for the inference-hot
    pair track) but suffers catastrophic cancellation when |mean| >> std —
    a regime long training runs can enter (ADVICE r2).  The trainer wraps
    its loss trace in this context, so training numerics use the robust
    form while inference keeps the single-read fusion.
    """
    global _LN_TWO_PASS
    prev = _LN_TWO_PASS
    _LN_TWO_PASS = True
    try:
        yield
    finally:
        _LN_TWO_PASS = prev


def layer_norm(x, scale, bias, eps: float = 1e-5, dtype=jnp.float32):
    """Functional LayerNorm in f32 with one-pass moments.

    One-pass (E[x^2] - E[x]^2) so XLA fuses both reductions into a single
    read of x — the two-pass form costs an extra full traversal of the
    O(L^2 C) pair track per LayerNorm (profiled ~5 ms/step); f32
    accumulation keeps the cancellation benign at trunk magnitudes.
    Training traces opt into the two-pass form via `two_pass_layer_norm`.
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    if _LN_TWO_PASS:
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    else:
        meansq = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (out * scale + bias).astype(dtype)


class LayerNormParams(nn.Module):
    """Declares LayerNorm params without computing (for fused kernels);
    param tree identical to `LayerNorm` when given the same name."""
    dim: int

    @nn.compact
    def __call__(self):
        return (self.param('scale', nn.initializers.ones, (self.dim,)),
                self.param('bias', nn.initializers.zeros, (self.dim,)))


class LayerNorm(nn.Module):
    """LayerNorm computed in f32 regardless of compute dtype.

    Owns `scale`/`bias` directly (flat param tree -> direct torch mapping).
    """
    dtype: Any = jnp.float32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (dim,))
        bias = self.param('bias', nn.initializers.zeros, (dim,))
        return layer_norm(x, scale, bias, eps=self.epsilon, dtype=self.dtype)


class MLP(nn.Module):
    """Stack of Linear+ReLU; mirrors the reference's nn.Sequential patterns."""
    features: tuple
    inits: tuple
    final_activation: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = len(self.features)
        for i, (f, init) in enumerate(zip(self.features, self.inits)):
            x = Linear(f, init=init, dtype=self.dtype)(x)
            if i < n - 1 or self.final_activation:
                x = nn.relu(x)
        return x


def shared_dropout(x, rate: float, deterministic: bool, rng,
                   broadcast_dim: Optional[int] = None):
    """Dropout with an optionally broadcast (shared) axis.

    Matches reference `apply_dropout` (common_modules.py:47-60): when
    `broadcast_dim` is given, the keep mask is shared along that axis (AF2
    row/column dropout).
    """
    if deterministic or rate == 0.0:
        return x
    shape = list(x.shape)
    if broadcast_dim is not None:
        shape[broadcast_dim] = 1
    keep = random.bernoulli(rng, 1.0 - rate, tuple(shape))
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def get_timestep_embedding(timesteps, embedding_dim: int,
                           max_positions: int = 10000):
    """Sinusoidal time embedding (reference seqformer.py:49-65)."""
    timesteps = timesteps * max_positions
    half_dim = embedding_dim // 2
    emb = np.log(max_positions) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb
