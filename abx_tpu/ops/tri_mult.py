"""Pallas TPU kernels: fused triangle-multiplication pre/post blocks.

TriangleMultiplication (reference seqformer.py:413-504) brackets its
O(L^3 C) contraction with two HBM-bound stretches on the (B, L, L, C) pair
track:

  pre:  LayerNorm -> five same-input projections (left/right + their gates
        + the final gate) -> sigmoid-gating + pair-mask multiplies
  post: LayerNorm -> C_int -> C projection -> * sigmoid(final gate)
        -> + residual

Under XLA each stretch makes 4-5 full traversals of the pair track.  These
kernels do each in ONE VMEM pass.  The projections slice the fused weight
matrix at 128-aligned column offsets (left|right|left_gate|right_gate|
final_gate), so every in-kernel slice is lane-tile aligned.

Inference-only (no custom VJP); the module keeps a differentiable
functional path.
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


def _pre_kernel(x_ref, s_ref, b_ref, w_ref, wb_ref, mrow_ref, mcol_ref,
                left_ref, right_ref, *rest, eps: float, nc: int,
                c_major: bool, emit_fgate: bool):
    x = x_ref[0]                                   # (RB, L, C)
    ln = _ln(x, s_ref[0], b_ref[0], eps).astype(x.dtype)
    dims = (((2,), (0,)), ((), ()))
    y = jax.lax.dot_general(ln, w_ref[...], dims,
                            preferred_element_type=jnp.float32)
    y = y + wb_ref[0]                              # (RB, L, 4*nc [+ C])
    # mrow holds ALL rows (full-dim block keeps Mosaic legal for any
    # row_block, incl. RB=4 in f32); ref-level dynamic slice picks this
    # program's rows.
    rb = x.shape[0]
    rows = mrow_ref[0, pl.ds(pl.program_id(1) * rb, rb), :]  # (RB, 1)
    pm = (rows * mcol_ref[0])[..., None]           # (RB, L, 1)
    left = y[..., :nc] * jax.nn.sigmoid(y[..., 2 * nc:3 * nc]) * pm
    right = y[..., nc:2 * nc] * jax.nn.sigmoid(y[..., 3 * nc:4 * nc]) * pm
    if c_major:
        # Emit (nc, RB, L): the layout the C-batched contraction GEMM
        # consumes directly — one in-VMEM transpose per element here
        # replaces XLA's two-hop HBM transpose copies (~7 ms/step).
        left_ref[0] = jnp.transpose(left, (2, 0, 1)).astype(left_ref.dtype)
        right_ref[0] = jnp.transpose(right, (2, 0, 1)).astype(
            right_ref.dtype)
    else:
        left_ref[0] = left.astype(left_ref.dtype)
        right_ref[0] = right.astype(right_ref.dtype)
    if emit_fgate:
        rest[0][0] = y[..., 4 * nc:].astype(rest[0].dtype)


@functools.partial(jax.jit, static_argnames=('row_block', 'eps',
                                             'c_major', 'emit_fgate',
                                             'interpret'))
def tri_mult_pre(x, scale, bias, w, wb, mask, row_block=None,
                 eps: float = 1e-5, c_major: bool = False,
                 emit_fgate: bool = True,
                 interpret: bool = False):
    """LN -> fused [left|right|lgate|rgate|fgate] projection -> gating/mask.

    Args:
        x: (B, R, L, C) pair activations (R == L).
        scale, bias: (C,) LayerNorm params.
        w: (C, 4*nc + C) fused kernel, wb: matching bias — or (C, 4*nc)
            when `emit_fgate=False` (the gate-fold path recomputes the
            final gate inside tri_mult_post_gatefold, so the (B, R, L, C)
            fgate tensor never crosses HBM).
        mask: (B, L) sequence mask.
        c_major: emit left/right as (B, nc, R, L) — the exact operand
            layout of the C-batched triangle-contraction GEMM, so XLA
            emits no transpose copies around the contraction.
    Returns: (left, right) each (B, R, L, nc) gated+masked — or
        (B, nc, R, L) when `c_major` — and, when `emit_fgate`, fg
        (B, R, L, C) PRE-sigmoid final-gate activations.
    """
    b, r, l, c = x.shape
    nc = ((w.shape[-1] - c) // 4) if emit_fgate else (w.shape[-1] // 4)
    if row_block is None:
        row_block = 8 if x.dtype == jnp.bfloat16 else 4
    rpad = (-r) % row_block
    if rpad:
        x = jnp.pad(x, [(0, 0), (0, rpad), (0, 0), (0, 0)])
        # padded rows are masked out by mrow below
    rp = x.shape[1]
    dt = x.dtype
    row = lambda v: v.reshape(1, -1).astype(jnp.float32)
    # Masks as 3-D so the tiled (last two) dims satisfy Mosaic block rules:
    # rows (B, R, 1) blocked (row_block, 1); cols (B, 1, L) full.
    mrow = jnp.pad(mask, [(0, 0), (0, rpad)]).astype(jnp.float32)[..., None]
    mcol = mask.astype(jnp.float32)[:, None, :]

    grid = (b, rp // row_block)
    x_spec = pl.BlockSpec((1, row_block, l, c), lambda bb, rr: (bb, rr, 0, 0))
    const = lambda shape: pl.BlockSpec(shape, lambda bb, rr: (0,) * len(shape))
    if c_major:
        lr_spec = pl.BlockSpec((1, nc, row_block, l),
                               lambda bb, rr: (bb, 0, rr, 0))
        lr_shape = jax.ShapeDtypeStruct((b, nc, rp, l), dt)
    else:
        lr_spec = pl.BlockSpec((1, row_block, l, nc),
                               lambda bb, rr: (bb, rr, 0, 0))
        lr_shape = jax.ShapeDtypeStruct((b, rp, l, nc), dt)
    out_specs = [lr_spec, lr_spec]
    out_shape = [lr_shape, lr_shape]
    if emit_fgate:
        out_specs.append(pl.BlockSpec((1, row_block, l, c),
                                      lambda bb, rr: (bb, rr, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((b, rp, l, c), dt))
    out = pl.pallas_call(
        functools.partial(_pre_kernel, eps=eps, nc=nc, c_major=c_major,
                          emit_fgate=emit_fgate),
        grid=grid,
        in_specs=[
            x_spec, const((1, c)), const((1, c)),
            const((c, w.shape[-1])), const((1, w.shape[-1])),
            pl.BlockSpec((1, rp, 1), lambda bb, rr: (bb, 0, 0)),
            pl.BlockSpec((1, 1, l), lambda bb, rr: (bb, 0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(x, row(scale), row(bias), w.astype(dt), row(wb), mrow, mcol)
    if emit_fgate:
        left, right, fg = out
        if c_major:
            return left[:, :, :r], right[:, :, :r], fg[:, :r]
        return left[:, :r], right[:, :r], fg[:, :r]
    left, right = out
    if c_major:
        return left[:, :, :r], right[:, :, :r]
    return left[:, :r], right[:, :r]


def _post_kernel(y_ref, s_ref, b_ref, w_ref, wb_ref, fg_ref, res_ref,
                 out_ref, *, eps: float, y_c_major: bool):
    if y_c_major:
        y = jnp.transpose(y_ref[0], (1, 2, 0))     # (nc, RB, L)->(RB, L, nc)
    else:
        y = y_ref[0]                               # (RB, L, nc)
    ln = _ln(y, s_ref[0], b_ref[0], eps).astype(y.dtype)
    dims = (((2,), (0,)), ((), ()))
    o = jax.lax.dot_general(ln, w_ref[...], dims,
                            preferred_element_type=jnp.float32)
    o = o + wb_ref[0]
    o = o * jax.nn.sigmoid(fg_ref[0].astype(jnp.float32))
    out_ref[0] = (o + res_ref[0].astype(jnp.float32)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('row_block', 'eps',
                                             'y_c_major', 'interpret'))
def tri_mult_post(y, scale, bias, w, wb, fg, res, row_block=None,
                  eps: float = 1e-5, y_c_major: bool = False,
                  interpret: bool = False):
    """LN -> Linear(nc, C) -> * sigmoid(fg) -> + res, one VMEM pass.

    Args:
        y: (B, R, L, nc) triangle contraction output — or (B, nc, R, L)
            when `y_c_major` (the contraction GEMM's native output layout;
            transposed back in-VMEM, so XLA emits no copy).
        w: (nc, C), wb: (C,).
        fg: (B, R, L, C) pre-sigmoid final gate.  res: (B, R, L, C).
    Returns: (B, R, L, C), dtype of res.
    """
    if y_c_major:
        b, nc, r, l = y.shape
    else:
        b, r, l, nc = y.shape
    c = w.shape[-1]
    if row_block is None:
        row_block = 8 if y.dtype == jnp.bfloat16 else 4
    rpad = (-r) % row_block
    if rpad:
        pad4 = [(0, 0), (0, rpad), (0, 0), (0, 0)]
        if y_c_major:
            y = jnp.pad(y, [(0, 0), (0, 0), (0, rpad), (0, 0)])
        else:
            y = jnp.pad(y, pad4)
        fg, res = (jnp.pad(t, pad4) for t in (fg, res))
    rp = r + rpad
    row = lambda v: v.reshape(1, -1).astype(jnp.float32)

    grid = (b, rp // row_block)
    spec = lambda ch: pl.BlockSpec((1, row_block, l, ch),
                                   lambda bb, rr: (bb, rr, 0, 0))
    if y_c_major:
        y_spec = pl.BlockSpec((1, nc, row_block, l),
                              lambda bb, rr: (bb, 0, rr, 0))
    else:
        y_spec = spec(nc)
    const = lambda shape: pl.BlockSpec(shape, lambda bb, rr: (0,) * len(shape))
    out = pl.pallas_call(
        functools.partial(_post_kernel, eps=eps, y_c_major=y_c_major),
        grid=grid,
        in_specs=[y_spec, const((1, nc)), const((1, nc)),
                  const((nc, c)), const((1, c)), spec(c), spec(c)],
        out_specs=spec(c),
        out_shape=jax.ShapeDtypeStruct((b, rp, l, c), res.dtype),
        interpret=interpret,
    )(y, row(scale), row(bias), w.astype(y.dtype), row(wb), fg, res)
    return out[:, :r]


def _post_gatefold_kernel(y_ref, s_ref, b_ref, w_ref, wb_ref, sx_ref,
                          bx_ref, wg_ref, wgb_ref, res_ref, out_ref, *,
                          eps: float):
    y = y_ref[0]                                   # (RB, L, nc)
    res = res_ref[0]                               # (RB, L, C)
    ln = _ln(y, s_ref[0], b_ref[0], eps).astype(y.dtype)
    dims = (((2,), (0,)), ((), ()))
    o = jax.lax.dot_general(ln, w_ref[...], dims,
                            preferred_element_type=jnp.float32)
    o = o + wb_ref[0]
    # Final gate recomputed from the residual (== the pre kernel's input):
    # LN with the PRE LayerNorm params, then the fgate projection — the
    # (B, R, L, C) pre-sigmoid gate tensor never crosses HBM.  (The gate
    # stays f32 here; the emitted-fgate path rounds it through the pair
    # dtype in HBM — a strictly-less-precise variant of the same value.)
    lnx = _ln(res, sx_ref[0], bx_ref[0], eps).astype(res.dtype)
    fg = jax.lax.dot_general(lnx, wg_ref[...], dims,
                             preferred_element_type=jnp.float32)
    fg = fg + wgb_ref[0]
    o = o * jax.nn.sigmoid(fg)
    out_ref[0] = (o + res.astype(jnp.float32)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('row_block', 'eps',
                                             'interpret'))
def tri_mult_post_gatefold(y, scale, bias, w, wb, x_scale, x_bias, wg, wgb,
                           res, row_block=None, eps: float = 1e-5,
                           interpret: bool = False):
    """tri_mult_post with the final gate recomputed in-kernel from `res`.

    Saves one full write (pre) + read (post) of the (B, R, L, C) fgate
    tensor per instance at the cost of an in-VMEM LN + (C, C) projection
    of the residual block (which is already resident for the +res
    epilogue).  `x_scale`/`x_bias` are the PRE kernel's LayerNorm params;
    `wg`/`wgb` the final-gate projection.
    """
    b, r, l, nc = y.shape
    c = w.shape[-1]
    if row_block is None:
        row_block = 8 if y.dtype == jnp.bfloat16 else 4
    rpad = (-r) % row_block
    if rpad:
        pad4 = [(0, 0), (0, rpad), (0, 0), (0, 0)]
        y = jnp.pad(y, pad4)
        res = jnp.pad(res, pad4)
    rp = r + rpad
    row = lambda v: v.reshape(1, -1).astype(jnp.float32)

    grid = (b, rp // row_block)
    spec = lambda ch: pl.BlockSpec((1, row_block, l, ch),
                                   lambda bb, rr: (bb, rr, 0, 0))
    const = lambda shape: pl.BlockSpec(shape, lambda bb, rr: (0,) * len(shape))
    out = pl.pallas_call(
        functools.partial(_post_gatefold_kernel, eps=eps),
        grid=grid,
        in_specs=[spec(nc), const((1, nc)), const((1, nc)),
                  const((nc, c)), const((1, c)),
                  const((1, c)), const((1, c)),
                  const((c, c)), const((1, c)), spec(c)],
        out_specs=spec(c),
        out_shape=jax.ShapeDtypeStruct((b, rp, l, c), res.dtype),
        interpret=interpret,
    )(y, row(scale), row(bias), w.astype(y.dtype), row(wb),
      row(x_scale), row(x_bias), wg.astype(res.dtype), row(wgb), res)
    return out[:, :r]


def tri_mult_post_gatefold_reference(y, scale, bias, w, wb, x_scale,
                                     x_bias, wg, wgb, res,
                                     eps: float = 1e-5):
    """Plain-XLA semantics twin of tri_mult_post_gatefold."""
    ln = _ln(y, scale, bias, eps).astype(y.dtype)
    o = jnp.dot(ln, w.astype(y.dtype)).astype(jnp.float32) + wb
    lnx = _ln(res, x_scale, x_bias, eps).astype(res.dtype)
    fg = jnp.dot(lnx, wg.astype(res.dtype)).astype(jnp.float32) + wgb
    o = o * jax.nn.sigmoid(fg)
    return (o + res.astype(jnp.float32)).astype(res.dtype)


def tri_mult_pre_reference(x, scale, bias, w, wb, mask, eps: float = 1e-5):
    """Plain-XLA semantics twin of tri_mult_pre."""
    c = x.shape[-1]
    nc = (w.shape[-1] - c) // 4
    ln = _ln(x, scale, bias, eps).astype(x.dtype)
    y = (jnp.dot(ln, w.astype(x.dtype)).astype(jnp.float32) + wb)
    pm = (mask[:, :, None] * mask[:, None, :])[..., None]
    left = y[..., :nc] * jax.nn.sigmoid(y[..., 2 * nc:3 * nc]) * pm
    right = y[..., nc:2 * nc] * jax.nn.sigmoid(y[..., 3 * nc:4 * nc]) * pm
    return (left.astype(x.dtype), right.astype(x.dtype),
            y[..., 4 * nc:].astype(x.dtype))


def tri_mult_post_reference(y, scale, bias, w, wb, fg, res,
                            eps: float = 1e-5):
    """Plain-XLA semantics twin of tri_mult_post."""
    ln = _ln(y, scale, bias, eps).astype(y.dtype)
    o = jnp.dot(ln, w.astype(y.dtype)).astype(jnp.float32) + wb
    o = o * jax.nn.sigmoid(fg.astype(jnp.float32))
    return (o + res.astype(jnp.float32)).astype(res.dtype)
