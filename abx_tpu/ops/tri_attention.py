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


def _packed_kernel(x_ref, wq_ref, wk_ref, wv_ref, wall_ref, bias_ref,
                   maskbias_ref, out_ref, *, scale: float,
                   bf16_softmax: bool = False,
                   fused_proj: bool = False):
    """Projection + attention for one (batch, row-block) program.

    x_ref: (1, RB, L, C) post-LN pair activations, NATURAL layout.
    w*_ref: (H, C, D) per-head projection weights (leading-dim indexed).
    bias_ref: (1, H, L, L) input dtype (upcast in-kernel; halves the
    per-program bias HBM traffic).  maskbias_ref: (1, 1, L) additive f32.
    out_ref: (1, RB, L, H*D) — heads concatenated on lanes, so the
    consumer's head merge is a free bitcast (no layout copies anywhere).
    """
    x = x_ref[0]                                  # (RB, L, C) bf16
    maskb = maskbias_ref[0]                       # (1, L)
    h = wq_ref.shape[0]
    d = wq_ref.shape[-1]
    in_dt = x.dtype
    proj_dims = (((2,), (0,)), ((), ()))          # (RB, L, C) @ (C, D)
    del scale  # folded into wq by the caller

    if fused_proj:
        # One full-lane projection dot (N = 3*H*D) followed by per-head
        # VMEM lane slices; trades MXU lane util (48/128 per-head) for a
        # possible relayout cost on the slices — A/B via env.
        y_all = jax.lax.dot_general(x, wall_ref[...], proj_dims,
                                    preferred_element_type=jnp.float32)

    outs = []
    for hh in range(h):
        # MXU dots run on the input dtype (bf16 at full rate; f32 would run
        # ~8x slower) with f32 accumulation; softmax stays f32.
        if fused_proj:
            q = jax.lax.slice_in_dim(y_all, hh * d, (hh + 1) * d, axis=2)
            k = jax.lax.slice_in_dim(y_all, (h + hh) * d, (h + hh + 1) * d,
                                     axis=2)
            v = jax.lax.slice_in_dim(y_all, (2 * h + hh) * d,
                                     (2 * h + hh + 1) * d, axis=2)
        else:
            q = jax.lax.dot_general(x, wq_ref[hh], proj_dims,
                                    preferred_element_type=jnp.float32)
            k = jax.lax.dot_general(x, wk_ref[hh], proj_dims,
                                    preferred_element_type=jnp.float32)
            v = jax.lax.dot_general(x, wv_ref[hh], proj_dims,
                                    preferred_element_type=jnp.float32)
        logits = jax.lax.dot_general(
            q.astype(in_dt), k.astype(in_dt),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)   # (RB, L, L)
        logits = (logits + bias_ref[0, hh][None].astype(jnp.float32)
                  + maskb[None])
        m = jnp.max(logits, axis=-1, keepdims=True)
        if bf16_softmax:
            # exp on bf16 vectors (2x VPU packing); the shifted argument
            # logits - m is exact in f32 first, sum/normalise in f32.
            e = jnp.exp((logits - m).astype(jnp.bfloat16)).astype(
                jnp.float32)
        else:
            e = jnp.exp(logits - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)
        # (An unnormalised-attend variant — divide the (RB, L, D) output
        # instead of the probabilities — exceeded the 16 MB VMEM budget:
        # e stays live in f32 through the attend dot alongside its bf16
        # copy.)
        outs.append(jax.lax.dot_general(
            probs.astype(in_dt), v.astype(in_dt),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))  # (RB, L, D)
    out_ref[0] = jnp.concatenate(outs, axis=-1).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=('row_block', 'interpret'))
def triangle_attention_packed(x, wq, wk, wv, bias, mask, row_block=None,
                              interpret: bool = False):
    """Layout-native fused triangle attention: projection + attention.

    The head-major variant above needs three (B, R, L, H, D) transposes in
    and one out — measured ~19 ms/step at B=4, L=288, MORE than the kernel
    itself.  This variant consumes the post-LN pair activations directly
    and performs the per-head q/k/v projections INSIDE the kernel, keeping
    every HBM tensor in its natural (B, R, L, C) layout.

    Args:
        x: (B, R, L, C) post-LN pair activations (rows attend per row).
        wq, wk, wv: (C, H*D) projection weights (column-major head blocks,
            i.e. the plain Linear kernel layout).
        bias: (B, H, L, L) attention bias, shared across rows.
        mask: (B, L) key mask (1 = valid).
    Returns: (B, R, L, H*D), dtype of x.
    """
    b, r, l, c = x.shape
    h = bias.shape[1]
    d = wq.shape[-1] // h
    scale = d ** -0.5
    if row_block is None:
        # Scoped VMEM is ~16 MB on v5e; the f32 working set at RB=8
        # (x + per-head q/k/v/logits/probs + out accumulator) exceeds it.
        import os
        env = os.environ.get('ABX_TRI_ATTN_RB')
        fused_default = (x.dtype == jnp.bfloat16 and os.environ.get(
            'ABX_TRI_ATTN_FUSED_PROJ', '1') == '1')
        row_block = (int(env) if env
                     else (4 if fused_default or x.dtype != jnp.bfloat16
                           else 8))
    rpad = (-r) % row_block
    if rpad:
        x = jnp.pad(x, [(0, 0), (0, rpad), (0, 0), (0, 0)])
    rp = x.shape[1]
    n_rb = rp // row_block

    # (C, H*D) -> (H, C, D): head becomes a leading (untiled) axis the
    # kernel indexes statically; done once per call on tiny tensors.
    # The 1/sqrt(D) softmax scale folds into wq here (free).
    def per_head(w, s=1.0):
        return (jnp.moveaxis(w.reshape(c, h, d), 1, 0) * s).astype(x.dtype)

    maskbias = ((1.0 - mask.astype(jnp.float32)) * BIG_NEG)[:, None, :]

    grid = (b, n_rb)
    x_spec = pl.BlockSpec((1, row_block, l, c), lambda bb, rr: (bb, rr, 0, 0))
    w_spec = pl.BlockSpec((h, c, d), lambda bb, rr: (0, 0, 0))
    # bf16 exp measured +4% end-to-end (37.5 -> 39.0 steps/s at
    # num_t=20); the argument is computed exactly in f32 and the attend
    # dot already rounds probabilities to bf16, so the added softmax noise
    # is of the same order as the existing bf16-attend rounding.  Disable
    # via ABX_TRI_ATTN_BF16_EXP=0 for strict-f32-softmax evaluation.
    import os as _os
    bf16_softmax = (x.dtype == jnp.bfloat16 and
                    _os.environ.get('ABX_TRI_ATTN_BF16_EXP', '1') == '1')
    # Full-lane fused projection (one N=3*H*D dot + per-head VMEM slices):
    # measured +1 steps/s over per-head N=48 dots; needs RB=4 to fit VMEM
    # (the f32 working set grows by the (RB, L, 3HD) y_all).  bf16 only.
    fused_proj = (x.dtype == jnp.bfloat16 and
                  _os.environ.get('ABX_TRI_ATTN_FUSED_PROJ', '1') == '1')
    # (C, H*D) mats are already per-head column blocks, so the fused
    # projection weight is a plain column concat [q|k|v].
    w_all = jnp.concatenate(
        [(wq * scale).astype(x.dtype), wk.astype(x.dtype),
         wv.astype(x.dtype)], axis=-1)
    out = pl.pallas_call(
        functools.partial(_packed_kernel, scale=scale,
                          bf16_softmax=bf16_softmax,
                          fused_proj=fused_proj),
        grid=grid,
        in_specs=[
            x_spec, w_spec, w_spec, w_spec,
            pl.BlockSpec((c, 3 * h * d), lambda bb, rr: (0, 0)),
            pl.BlockSpec((1, h, l, l), lambda bb, rr: (bb, 0, 0, 0)),
            pl.BlockSpec((1, 1, l), lambda bb, rr: (bb, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, row_block, l, h * d),
                               lambda bb, rr: (bb, rr, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, rp, l, h * d), x.dtype),
        interpret=interpret,
    )(x, per_head(wq, scale), per_head(wk), per_head(wv), w_all,
      bias.astype(x.dtype), maskbias)
    return out[:, :r]


def triangle_attention_packed_reference(x, wq, wk, wv, bias, mask):
    """Plain-XLA semantics twin of the packed kernel (tests/fallback)."""
    b, r, l, c = x.shape
    h = bias.shape[1]
    d = wq.shape[-1] // h
    def proj(w):
        y = jnp.dot(x.astype(jnp.float32), w.astype(jnp.float32))
        return y.reshape(b, r, l, h, d)
    q, k, v = proj(wq), proj(wk), proj(wv)
    logits = jnp.einsum('brqhd,brkhd->brhqk', q * (d ** -0.5), k)
    logits = logits + bias[:, None].astype(jnp.float32)
    maskbias = (1.0 - mask.astype(jnp.float32)) * BIG_NEG
    logits = logits + maskbias[:, None, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum('brhqk,brkhd->brqhd', probs, v)
    return out.reshape(b, r, l, h * d).astype(x.dtype)


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
