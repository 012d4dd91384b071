"""Pallas TPU kernel: fused pair-track transition block.

The pair transition (reference seqformer.py:552-606 `Transition` applied to
the (B, L, L, C) pair track) is HBM-bound under XLA: LayerNorm reads+writes
the pair tensor, the C -> 4C projection writes a 4x tensor, the 4C -> C
projection reads it back, and the residual add makes another pass — five
full traversals of O(L^2 C) memory for ~2 matmuls of work.

This kernel keeps everything for a block of rows in VMEM: one read of the
input, one write of the residual-added output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *,
            eps: float, residual: bool):
    x = x_ref[0]                                   # (RB, L, C)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    meansq = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    var = jnp.maximum(meansq - mean * mean, 0.0)
    ln = (x32 - mean) * jax.lax.rsqrt(var + eps)
    ln = ln * s_ref[0] + b_ref[0]

    dt = x.dtype
    dims = (((2,), (0,)), ((), ()))                # (RB, L, C) @ (C, N)
    h = jax.lax.dot_general(ln.astype(dt), w1_ref[...], dims,
                            preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1_ref[0], 0.0)
    y = jax.lax.dot_general(h.astype(dt), w2_ref[...], dims,
                            preferred_element_type=jnp.float32)
    y = y + b2_ref[0]
    if residual:
        y = y + x32
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('row_block', 'residual',
                                             'eps', 'interpret'))
def fused_transition(x, scale, bias, w1, b1, w2, b2, row_block=None,
                     residual: bool = True, eps: float = 1e-5,
                     interpret: bool = False):
    """LayerNorm -> Linear(C, N) -> relu -> Linear(N, C) [-> + x].

    Args:
        x: (B, R, L, C).
        scale, bias: (C,) LayerNorm params.
        w1: (C, N), b1: (N,), w2: (N, C), b2: (C,).
    Returns: (B, R, L, C), dtype of x.
    """
    b, r, l, c = x.shape
    n = w1.shape[-1]
    if row_block is None:
        # Keep the f32 working set (x + LN + 4C intermediate + out) inside
        # the ~16 MB scoped-VMEM budget.
        row_block = 8 if x.dtype == jnp.bfloat16 else 4
    rpad = (-r) % row_block
    if rpad:
        x = jnp.pad(x, [(0, 0), (0, rpad), (0, 0), (0, 0)])
    rp = x.shape[1]

    dt = x.dtype
    row = lambda v: v.reshape(1, -1).astype(jnp.float32)
    grid = (b, rp // row_block)
    x_spec = pl.BlockSpec((1, row_block, l, c), lambda bb, rr: (bb, rr, 0, 0))
    const = lambda shape: pl.BlockSpec(shape, lambda bb, rr: (0,) * len(shape))
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, residual=residual),
        grid=grid,
        in_specs=[x_spec, const((1, c)), const((1, c)), const((c, n)),
                  const((1, n)), const((n, c)), const((1, c))],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((b, rp, l, c), dt),
        interpret=interpret,
    )(x, row(scale), row(bias), w1.astype(dt), row(b1), w2.astype(dt),
      row(b2))
    return out[:, :r]


def fused_transition_reference(x, scale, bias, w1, b1, w2, b2,
                               residual: bool = True, eps: float = 1e-5):
    """Plain-XLA semantics twin (tests / non-TPU fallback)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, -1, keepdims=True)
                      - mean * mean, 0.0)
    ln = (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    dt = x.dtype
    h = jnp.maximum(jnp.dot(ln.astype(dt), w1.astype(dt))
                    .astype(jnp.float32) + b1, 0.0)
    y = jnp.dot(h.astype(dt), w2.astype(dt)).astype(jnp.float32) + b2
    if residual:
        y = y + x32
    return y.astype(x.dtype)
