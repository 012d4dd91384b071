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
    """Grid (B, nI, nJ, nC, nK); accumulate over the k axis in f32 scratch.

    Channel blocking (the 4th grid dim) keeps the per-program footprint
    inside the 16 MB scoped-VMEM budget at production shape — the
    unblocked variant overflowed (19.5M/16M) inside the full sampler.
    """
    k_idx = pl.program_id(4)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    lk = left_ref[0]    # per_row: (TI, TK, CB); per_col: (TK, TI, CB)
    rk = right_ref[0]   # per_row: (TJ, TK, CB); per_col: (TK, TJ, CB)
    # Mosaic requires matmul batch dims at position 0: move channels first.
    if per_row:
        lc = jnp.transpose(lk, (2, 0, 1))   # (CB, TI, TK)
        rc = jnp.transpose(rk, (2, 0, 1))   # (CB, TJ, TK)
    else:
        lc = jnp.transpose(lk, (2, 1, 0))   # (CB, TI, TK)
        rc = jnp.transpose(rk, (2, 1, 0))   # (CB, TJ, TK)
    dn = (((2,), (2,)), ((0,), (0,)))       # contract k, batch c
    prod = jax.lax.dot_general(lc, rc, dimension_numbers=dn,
                               preferred_element_type=jnp.float32)
    acc_ref[...] += prod  # (CB, TI, TJ)

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


@functools.partial(jax.jit, static_argnames=('per_row', 'tile', 'c_block',
                                             'interpret'))
def triangle_multiply_pallas(left, right, per_row: bool = True,
                             tile: int = 96, c_block: int = 128,
                             interpret: bool = False):
    """Pallas path; left/right (B, L, L, C) -> (B, L, L, C).

    Layout-native: consumes and produces the {3,2,1,0} (B, L, L, C) layout
    the surrounding kernels use, so XLA emits NO transpose copies around
    the contraction (profiled ~6-7 ms/step of copies on the einsum path at
    B=4, L=288).  tile=96 divides 288 exactly; channels are grid-blocked.
    """
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
    cb = min(c_block, c)
    n_c = -(-c // cb)
    if c % cb:
        pad = [(0, 0)] * 3 + [(0, n_c * cb - c)]
        lp, rp = jnp.pad(lp, pad), jnp.pad(rp, pad)

    if per_row:
        # left tiles over (i, k), right tiles over (j, k).
        left_spec = pl.BlockSpec((1, tile, tile, cb),
                                 lambda bb, i, j, cc, k: (bb, i, k, cc))
        right_spec = pl.BlockSpec((1, tile, tile, cb),
                                  lambda bb, i, j, cc, k: (bb, j, k, cc))
    else:
        left_spec = pl.BlockSpec((1, tile, tile, cb),
                                 lambda bb, i, j, cc, k: (bb, k, i, cc))
        right_spec = pl.BlockSpec((1, tile, tile, cb),
                                  lambda bb, i, j, cc, k: (bb, k, j, cc))

    kernel = functools.partial(_kernel, n_k=n_t, per_row=per_row)
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        # tile=96, full-C blocks need ~20 MB scoped VMEM — above the 16 MB
        # default, comfortably below the chip's 128 MB (the channel grid
        # dim is for C > 128; blocks narrower than the 128-lane C are
        # illegal in this layout).
        kwargs['compiler_params'] = pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'parallel',
                                 'parallel', 'arbitrary'),
            vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_t, n_t, n_c, n_t),
        in_specs=[left_spec, right_spec],
        out_specs=pl.BlockSpec((1, tile, tile, cb),
                               lambda bb, i, j, cc, k: (bb, i, j, cc)),
        out_shape=jax.ShapeDtypeStruct((b, lpad, lpad, n_c * cb), dtype),
        scratch_shapes=[pltpu.VMEM((cb, tile, tile), jnp.float32)],
        interpret=interpret,
        **kwargs,
    )(lp, rp)
    return out[:, :l, :l, :c]


def triangle_multiply_einsum(left, right, per_row: bool = True):
    if per_row:
        return jnp.einsum('bikc,bjkc->bijc', left, right)
    return jnp.einsum('bkic,bkjc->bijc', left, right)


def triangle_multiply_c_major(left, right, per_row: bool = True):
    """Channel-major contraction: operands/result carry C at axis 1.

    With (B, C, R, L) operands — the layout `tri_mult_pre(c_major=True)`
    emits — the C-batched GEMM is already in XLA's native batched-matmul
    form, so no transpose copies are inserted (the row-major einsum above
    costs ~7 ms/step of two-hop HBM layout copies at B=4, L=288, round-4
    profile).  Output (B, C, I, J) feeds `tri_mult_post(y_c_major=True)`.
    """
    if per_row:
        # rows are i/j, cols k: out[c,i,j] = sum_k L[c,i,k] R[c,j,k]
        return jnp.einsum('bcik,bcjk->bcij', left, right)
    # rows are k, cols i/j: out[c,i,j] = sum_k L[c,k,i] R[c,k,j]
    return jnp.einsum('bcki,bckj->bcij', left, right)


def triangle_multiply(left, right, per_row: bool = True,
                      use_pallas: bool = False, interpret: bool = False):
    """Dispatch: pallas kernel on TPU when enabled, einsum otherwise."""
    if use_pallas and _HAS_PLTPU:
        import os
        tile = int(os.environ.get('ABX_TRIANGLE_TILE', 96))
        cb = int(os.environ.get('ABX_TRIANGLE_CBLOCK', 128))
        return triangle_multiply_pallas(left, right, per_row=per_row,
                                        tile=tile, c_block=cb,
                                        interpret=interpret)
    return triangle_multiply_einsum(left, right, per_row=per_row)
