"""Pallas TPU kernel: fused pair-track recycling embedding.

Per trunk pass the pair track is assembled as (seqformer.py:608-616):

    pair = concat(static_pair, tile(t_embed))        # 128 ‖ 64 channels
    pair += LayerNorm(prev_pair)                     # (B, L, L, 192)
    pair += dgram_table[prev_pos_bins]               # (B, L, L) gather

Under XLA this region costs ~10 ms/step at B=4, L=288 (profiled round 3:
3.0 ms table gather + ~3.2 ms LN moment reductions + ~4 ms of adds/concat
traffic — each a separate full traversal of the 127 MB pair tensor).  This
kernel produces the assembled tensor in ONE pass: read static_pair +
prev_pair + bins, write pair.  The bin embedding is a one-hot x table
matmul in VMEM (15-row table), the t vector is a per-batch broadcast on
the high 64 lanes.

Inference-only (no VJP); EmbeddingAndSeqformer keeps the functional path
for training/CPU, and the interpret-mode test compares both.
Reference surface: abx/model/seqformer.py:216-223 (recycling adds),
abx.py:17-26 (get_prev dgram bins).
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


def _kernel(sp_ref, tv_ref, pp_ref, s_ref, b_ref, tab_ref, bins_ref,
            out_ref, *, eps: float, c0: int):
    pp = pp_ref[0]                                   # (RB, L, C)
    ln = _ln(pp, s_ref[0], b_ref[0], eps)            # f32
    bins = bins_ref[0, :, :, 0]                      # (RB, L) int32
    n_bins = tab_ref.shape[0]
    oh = jax.nn.one_hot(bins, n_bins, dtype=jnp.float32)
    emb = jax.lax.dot_general(
        oh, tab_ref[...].astype(jnp.float32),
        (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (RB, L, C)
    rb, l, c = pp.shape
    base_lo = sp_ref[0].astype(jnp.float32)          # (RB, L, c0)
    base_hi = jnp.broadcast_to(
        tv_ref[0, 0].astype(jnp.float32)[None, None, :], (rb, l, c - c0))
    base = jnp.concatenate([base_lo, base_hi], axis=-1)
    out_ref[0] = (base + ln + emb).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('row_block', 'eps',
                                             'interpret'))
def recycle_embed(static_pair, t_vec, prev_pair, ln_scale, ln_bias,
                  table, bins, row_block=None, eps: float = 1e-5,
                  interpret: bool = False):
    """concat(static‖t) + LN(prev_pair) + table[bins], one VMEM pass.

    Args:
        static_pair: (B, L, L, C0) trajectory-static pair embedding.
        t_vec: (B, C1) per-batch timestep embedding (pair channels C0..C).
        prev_pair: (B, L, L, C) recycling carry, C = C0 + C1.
        ln_scale, ln_bias: (C,) prev_pair LayerNorm params.
        table: (num_bins, C) dgram embedding table.
        bins: (B, L, L) int32 distogram bin of prev positions.
    Returns: (B, L, L, C) in prev_pair.dtype.
    """
    b, l, _, c0 = static_pair.shape
    c = prev_pair.shape[-1]
    dt = prev_pair.dtype
    if row_block is None:
        row_block = 8 if dt == jnp.bfloat16 else 4
    rpad = (-l) % row_block
    if rpad:
        pad = [(0, 0), (0, rpad), (0, 0), (0, 0)]
        static_pair = jnp.pad(static_pair, pad)
        prev_pair = jnp.pad(prev_pair, pad)
        bins = jnp.pad(bins, [(0, 0), (0, rpad), (0, 0)])
    rp = static_pair.shape[1]
    row = lambda v: v.reshape(1, -1).astype(jnp.float32)

    grid = (b, rp // row_block)
    const = lambda shape: pl.BlockSpec(shape, lambda bb, rr: (0,) * len(shape))
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, c0=c0),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, row_block, l, c0), lambda bb, rr: (bb, rr, 0, 0)),
            pl.BlockSpec((1, 1, c - c0), lambda bb, rr: (bb, 0, 0)),
            pl.BlockSpec((1, row_block, l, c), lambda bb, rr: (bb, rr, 0, 0)),
            const((1, c)), const((1, c)),
            const(tuple(table.shape)),
            # bins ride as (B, R, L, 1): a 3-D (1, RB, L) block is illegal
            # under Mosaic when RB < 8 (f32 path, RB=4) — the last two
            # block dims must be divisible by (8, 128) or match the array;
            # with the trailing singleton the checked dims are (L, 1),
            # both full.
            pl.BlockSpec((1, row_block, l, 1), lambda bb, rr: (bb, rr, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, row_block, l, c),
                               lambda bb, rr: (bb, rr, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, rp, l, c), dt),
        interpret=interpret,
    )(static_pair, t_vec.astype(jnp.float32)[:, None, :], prev_pair,
      row(ln_scale),
      row(ln_bias), table.astype(jnp.float32),
      bins.astype(jnp.int32)[..., None])
    return out[:, :l]


def recycle_embed_reference(static_pair, t_vec, prev_pair, ln_scale,
                            ln_bias, table, bins, eps: float = 1e-5):
    """Plain-XLA semantics twin of `recycle_embed`."""
    b, l = static_pair.shape[:2]
    c0 = static_pair.shape[-1]
    c = prev_pair.shape[-1]
    ln = _ln(prev_pair, ln_scale, ln_bias, eps)
    emb = jnp.take(table.astype(jnp.float32), bins, axis=0)
    base_hi = jnp.broadcast_to(
        t_vec.astype(jnp.float32)[:, None, None, :], (b, l, l, c - c0))
    base = jnp.concatenate([static_pair.astype(jnp.float32), base_hi], -1)
    return (base + ln + emb).astype(prev_pair.dtype)
