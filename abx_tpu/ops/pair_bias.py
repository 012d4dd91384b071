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


def _kernel(x_ref, s_ref, b_ref, w_ref, out_ref, *, eps: float,
            transpose_out: bool):
    x = x_ref[0]                                     # (RB, L, C)
    ln = _ln(x, s_ref[0], b_ref[0], eps).astype(x.dtype)
    y = jax.lax.dot_general(ln, w_ref[...], (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if transpose_out:
        out_ref[0] = jnp.transpose(y, (2, 0, 1)).astype(out_ref.dtype)
    else:
        out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('row_block', 'eps',
                                             'transpose_out', 'interpret'))
def pair_bias_proj(pair, scale, bias, w, row_block=None, eps: float = 1e-5,
                   transpose_out: bool = False, interpret: bool = False):
    """LayerNorm(pair) @ w in one VMEM pass.

    Args:
        pair: (B, L, L, C) pair activations.
        scale, bias: (C,) LayerNorm params.
        w: (C, H) head-projection kernel (no bias).
        transpose_out: emit (B, H, L, L) — the attention-bias layout —
            directly (the (RB, L, H) -> (H, RB, L) transpose happens on
            the VMEM block, so the consumer needs no HBM moveaxis of the
            (B, L, L, H) tensor).
    Returns: (B, L, L, H) in pair.dtype ((B, H, L, L) when
        transpose_out).
    """
    b, r, l, c = pair.shape
    h = w.shape[-1]
    dt = pair.dtype
    if row_block is None:
        # transpose_out's (1, H, RB, L) block puts RB in the sublane-checked
        # position: Mosaic requires it divisible by 8, so the f32 path may
        # not drop to RB=4 there (working set at RB=8 f32 is ~2 MB — fine).
        row_block = 8 if (dt == jnp.bfloat16 or transpose_out) else 4
    rpad = (-r) % row_block
    if rpad:
        pair = jnp.pad(pair, [(0, 0), (0, rpad), (0, 0), (0, 0)])
    rp = pair.shape[1]
    row = lambda v: v.reshape(1, -1).astype(jnp.float32)
    const = lambda shape: pl.BlockSpec(shape, lambda bb, rr: (0,) * len(shape))
    if transpose_out:
        out_spec = pl.BlockSpec((1, h, row_block, l),
                                lambda bb, rr: (bb, 0, rr, 0))
        out_shape = jax.ShapeDtypeStruct((b, h, rp, l), dt)
    else:
        out_spec = pl.BlockSpec((1, row_block, l, h),
                                lambda bb, rr: (bb, rr, 0, 0))
        out_shape = jax.ShapeDtypeStruct((b, rp, l, h), dt)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, transpose_out=transpose_out),
        grid=(b, rp // row_block),
        in_specs=[
            pl.BlockSpec((1, row_block, l, c), lambda bb, rr: (bb, rr, 0, 0)),
            const((1, c)), const((1, c)), const((c, h)),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(pair, row(scale), row(bias), w.astype(dt))
    return out[:, :, :r] if transpose_out else out[:, :r]


def pair_bias_proj_reference(pair, scale, bias, w, eps: float = 1e-5):
    """Plain-XLA semantics twin."""
    ln = _ln(pair, scale, bias, eps).astype(pair.dtype)
    return jnp.dot(ln, w.astype(pair.dtype)).astype(pair.dtype)
