"""Pallas TPU kernel: attention epilogue (gate -> output proj -> +residual).

TriangleAttention's tail under XLA makes three passes over the pair track:
sigmoid(gate) * attn_out, the H*D -> C output projection, and the residual
add (~4 ms/step at B=4, L=288).  One VMEM pass instead.

Note the gating ORDER differs from the triangle-multiplication post block
(ops/tri_mult.py): here the gate multiplies BEFORE the projection
(reference seqformer.py:300-311), there sigmoid(final_gate) scales the
projected output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(y_ref, g_ref, w_ref, wb_ref, res_ref, out_ref):
    y = y_ref[0]                                   # (RB, L, HD)
    g = jax.nn.sigmoid(g_ref[0].astype(jnp.float32))
    z = (y.astype(jnp.float32) * g).astype(y.dtype)
    o = jax.lax.dot_general(
        z, w_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # (RB, L, C)
    o = o + wb_ref[0] + res_ref[0].astype(jnp.float32)
    out_ref[0] = o.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('row_block', 'interpret'))
def gate_proj_residual(y, gate_pre, w, wb, res, row_block=None,
                       interpret: bool = False):
    """(sigmoid(gate_pre) * y) @ w + wb + res in one VMEM pass.

    Args:
        y: (B, R, L, HD) attention output.
        gate_pre: (B, R, L, HD) pre-sigmoid gate activations.
        w: (HD, C), wb: (C,).  res: (B, R, L, C) residual input.
    Returns: (B, R, L, C), dtype of res.
    """
    b, r, l, hd = y.shape
    c = w.shape[-1]
    if row_block is None:
        row_block = 8 if y.dtype == jnp.bfloat16 else 4
    rpad = (-r) % row_block
    if rpad:
        pad4 = [(0, 0), (0, rpad), (0, 0), (0, 0)]
        y, gate_pre, res = (jnp.pad(t, pad4) for t in (y, gate_pre, res))
    rp = y.shape[1]
    row = lambda v: v.reshape(1, -1).astype(jnp.float32)

    grid = (b, rp // row_block)
    spec = lambda ch: pl.BlockSpec((1, row_block, l, ch),
                                   lambda bb, rr: (bb, rr, 0, 0))
    const = lambda shape: pl.BlockSpec(shape, lambda bb, rr: (0,) * len(shape))
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[spec(hd), spec(hd), const((hd, c)), const((1, c)),
                  spec(c)],
        out_specs=spec(c),
        out_shape=jax.ShapeDtypeStruct((b, rp, l, c), res.dtype),
        interpret=interpret,
    )(y, gate_pre, w.astype(y.dtype), row(wb), res)
    return out[:, :r]


def gate_proj_residual_reference(y, gate_pre, w, wb, res):
    """Plain-XLA semantics twin."""
    g = jax.nn.sigmoid(gate_pre.astype(jnp.float32))
    z = (y.astype(jnp.float32) * g).astype(y.dtype)
    o = jnp.dot(z, w.astype(y.dtype)).astype(jnp.float32) + wb
    return (o + res.astype(jnp.float32)).astype(res.dtype)
