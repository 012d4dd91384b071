"""Pallas TPU kernel: fused per-row (triangle) attention.

Profiling the full sampler on a v5e chip showed triangle attention to be the
single hottest block: XLA materialises the row-batched logits tensor
f32[B, L, H, L, L] (~380 MB at B=4, L=288) and streams it through four
separate ops (qk dot, reduce_max, exp/sum, attend) — ~12.5 ms per
TriangleAttention call, ~2/3 of the pair-track cost.

This kernel computes the whole attention for a block of rows entirely in
VMEM: logits never touch HBM.  Per grid step (b, h, row-block): load q/k/v
(RB, L, D) and the row-shared bias (L, L), compute logits + bias + key mask,
softmax in f32, attend — one HBM write of the output.

Layout notes: head dim D is small (48), so the contraction underutilises the
MXU lanes; even so the op becomes compute-bound instead of
bandwidth-catastrophic.  `mask` enters as an additive f32 row (0 / -1e9).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

BIG_NEG = -1e9


def _kernel(q_ref, k_ref, v_ref, bias_ref, maskbias_ref, out_ref, *,
            scale: float):
    q = q_ref[0, :, 0].astype(jnp.float32)      # (RB, L, D)
    k = k_ref[0, :, 0].astype(jnp.float32)
    v = v_ref[0, :, 0].astype(jnp.float32)
    bias = bias_ref[0, 0]                        # (L, L) f32
    maskbias = maskbias_ref[0]                   # (1, L) additive

    logits = jax.lax.dot_general(
        q * scale, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)      # (RB, L, L)
    logits = logits + bias[None, :, :] + maskbias[None, :, :]

    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    probs = e / denom

    out = jax.lax.dot_general(
        probs, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)      # (RB, L, D)
    out_ref[0, :, 0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=('row_block', 'interpret'))
def triangle_attention_fused(q, k, v, bias, mask, row_block: int = 8,
                             interpret: bool = False):
    """Fused row-batched attention.

    Args:
        q, k, v: (B, R, H, L, D) — rows R attend over length L per head.
        bias: (B, H, L, L) shared across rows.
        mask: (B, L) key mask (1 = valid).
    Returns: (B, R, H, L, D), same dtype as q.
    """
    b, r, h, l, d = q.shape
    scale = d ** -0.5
    # Pad rows to the block size.
    rpad = (-r) % row_block
    if rpad:
        pad = [(0, 0), (0, rpad), (0, 0), (0, 0), (0, 0)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
    rp = q.shape[1]
    n_rb = rp // row_block

    maskbias = ((1.0 - mask.astype(jnp.float32)) * BIG_NEG)[:, None, :]

    grid = (b, h, n_rb)
    qkv_spec = pl.BlockSpec((1, row_block, 1, l, d),
                            lambda bb, hh, rr: (bb, rr, hh, 0, 0))
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=grid,
        in_specs=[
            qkv_spec, qkv_spec, qkv_spec,
            pl.BlockSpec((1, 1, l, l), lambda bb, hh, rr: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, l), lambda bb, hh, rr: (bb, 0, 0)),
        ],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((b, rp, h, l, d), q.dtype),
        interpret=interpret,
    )(q, k, v, bias.astype(jnp.float32), maskbias)
    return out[:, :r]


def triangle_attention_reference(q, k, v, bias, mask):
    """Plain-XLA semantics twin of the fused kernel (for tests/fallback)."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum('brhqd,brhkd->brhqk',
                        (q * scale).astype(jnp.float32),
                        k.astype(jnp.float32))
    logits = logits + bias[:, None].astype(jnp.float32)
    maskbias = (1.0 - mask.astype(jnp.float32)) * BIG_NEG
    logits = logits + maskbias[:, None, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum('brhqk,brhkd->brhqd', probs,
                      v.astype(jnp.float32)).astype(q.dtype)
