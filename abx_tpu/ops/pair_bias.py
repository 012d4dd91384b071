"""Pallas TPU kernel: fused pair-bias projection (LN -> heads).

SeqAttentionWithPairBias consumes the pair track ONLY through
`proj_pair(LayerNorm(pair))` (reference seqformer.py:314-356): under XLA
the LayerNorm materialises a second full (B, L, L, C) tensor (profiled
~3.2 ms/step at B=4, L=288) that exists just to feed a C->H matmul.  This
kernel emits the (B, L, L, H) bias in ONE read of the pair track — the
LN'd tensor never touches HBM.

Inference-only (no VJP); the module keeps the functional path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _ln(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, -1, keepdims=True)
                      - mean * mean, 0.0)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _kernel(x_ref, s_ref, b_ref, w_ref, out_ref, *, eps: float):
    x = x_ref[0]                                     # (RB, L, C)
    ln = _ln(x, s_ref[0], b_ref[0], eps).astype(x.dtype)
    y = jax.lax.dot_general(ln, w_ref[...], (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('row_block', 'eps',
                                             'interpret'))
def pair_bias_proj(pair, scale, bias, w, row_block=None, eps: float = 1e-5,
                   interpret: bool = False):
    """LayerNorm(pair) @ w in one VMEM pass.

    Args:
        pair: (B, L, L, C) pair activations.
        scale, bias: (C,) LayerNorm params.
        w: (C, H) head-projection kernel (no bias).
    Returns: (B, L, L, H) in pair.dtype.
    """
    b, r, l, c = pair.shape
    h = w.shape[-1]
    dt = pair.dtype
    if row_block is None:
        row_block = 8 if dt == jnp.bfloat16 else 4
    rpad = (-r) % row_block
    if rpad:
        pair = jnp.pad(pair, [(0, 0), (0, rpad), (0, 0), (0, 0)])
    rp = pair.shape[1]
    row = lambda v: v.reshape(1, -1).astype(jnp.float32)
    const = lambda shape: pl.BlockSpec(shape, lambda bb, rr: (0,) * len(shape))
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=(b, rp // row_block),
        in_specs=[
            pl.BlockSpec((1, row_block, l, c), lambda bb, rr: (bb, rr, 0, 0)),
            const((1, c)), const((1, c)), const((c, h)),
        ],
        out_specs=pl.BlockSpec((1, row_block, l, h),
                               lambda bb, rr: (bb, rr, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, rp, l, h), dt),
        interpret=interpret,
    )(pair, row(scale), row(bias), w.astype(dt))
    return out[:, :r]


def pair_bias_proj_reference(pair, scale, bias, w, eps: float = 1e-5):
    """Plain-XLA semantics twin."""
    ln = _ln(pair, scale, bias, eps).astype(pair.dtype)
    return jnp.dot(ln, w.astype(pair.dtype)).astype(pair.dtype)
