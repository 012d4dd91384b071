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


def _packed_kernel(*refs, scale: float, bf16_softmax: bool = False,
                   fused_proj: bool = False, ln: bool = False,
                   gate: bool = False, out_proj: bool = False,
                   eps: float = 1e-5):
    """Projection + attention for one (batch, row-block) program.

    x_ref: (1, RB, L, C) pair activations, NATURAL layout — post-LN, or
    RAW when `ln` (the LayerNorm then runs in-VMEM on the block; the
    normalised tensor never exists in HBM).  With `gate`, the sigmoid
    gate joins the fused projection as a 4th column block and multiplies
    the output in-kernel — with ln+gate the XLA graph around the kernel
    shrinks to bias (pair_bias_proj) + out-proj + residual.  With
    `out_proj`, the output projection (H*D -> C) and the residual add run
    in-kernel too (out_ref then holds the NEW pair block directly) — XLA
    emitted the proj+residual as ~1 ms/call loop fusions and the (…, H*D)
    attention tensor round-tripped HBM for no reason.
    w*_ref: (H, C, D) per-head projection weights (leading-dim indexed).
    bias_ref: (1, H, L, L) input dtype (upcast in-kernel; halves the
    per-program bias HBM traffic).  maskbias_ref: (1, 1, L) additive f32.
    out_ref: (1, RB, L, H*D) — heads concatenated on lanes, so the
    consumer's head merge is a free bitcast (no layout copies anywhere) —
    or (1, RB, L, C) with `out_proj`.
    """
    it = iter(refs)
    x_ref = next(it)
    if ln:
        s_ref, b_ref = next(it), next(it)         # (1, C) LN rows, f32
    wq_ref, wk_ref, wv_ref, wall_ref = (next(it) for _ in range(4))
    if gate:
        bg_ref = next(it)                         # (1, H*D) gate bias
    if out_proj:
        wo_ref, bo_ref, res_ref = next(it), next(it), next(it)
    bias_ref, maskbias_ref, out_ref = next(it), next(it), next(it)

    x = x_ref[0]                                  # (RB, L, C) bf16
    maskb = maskbias_ref[0]                       # (1, L)
    h = wq_ref.shape[0]
    d = wq_ref.shape[-1]
    in_dt = x.dtype
    proj_dims = (((2,), (0,)), ((), ()))          # (RB, L, C) @ (C, D)
    del scale  # folded into wq by the caller
    if ln:
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.maximum(jnp.mean(x32 * x32, -1, keepdims=True)
                          - mean * mean, 0.0)
        x = ((x32 - mean) * jax.lax.rsqrt(var + eps) * s_ref[0]
             + b_ref[0]).astype(in_dt)

    if fused_proj:
        # One full-lane projection dot (N = (3 or 4)*H*D) followed by
        # per-head VMEM lane slices; trades MXU lane util (48/128
        # per-head) for a possible relayout cost on the slices.
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
    res = jnp.concatenate(outs, axis=-1)
    if gate:
        if fused_proj:
            g = jax.lax.slice_in_dim(y_all, 3 * h * d, 4 * h * d, axis=2)
        else:
            g = jax.lax.dot_general(
                x, jax.lax.slice_in_dim(wall_ref[...], 3 * h * d,
                                        4 * h * d, axis=1),
                proj_dims, preferred_element_type=jnp.float32)
        res = res * jax.nn.sigmoid(g + bg_ref[0][None, None, :])
    if out_proj:
        # (RB, L, H*D) @ (H*D, C) + bias + residual: the attended tensor
        # never exists in HBM; the kernel emits the new pair block.
        y = jax.lax.dot_general(res.astype(in_dt), wo_ref[...],
                                (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        y = y + bo_ref[0][None, None, :] + res_ref[0].astype(jnp.float32)
        out_ref[0] = y.astype(out_ref.dtype)
        return
    out_ref[0] = res.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=('row_block', 'interpret'))
def triangle_attention_packed(x, wq, wk, wv, bias, mask, row_block=None,
                              ln=None, gate=None, out_proj=None,
                              residual=None,
                              interpret: bool = False):
    """Layout-native fused triangle attention: projection + attention.

    The head-major variant above needs three (B, R, L, H, D) transposes in
    and one out — measured ~19 ms/step at B=4, L=288, MORE than the kernel
    itself.  This variant consumes the post-LN pair activations directly
    and performs the per-head q/k/v projections INSIDE the kernel, keeping
    every HBM tensor in its natural (B, R, L, C) layout.

    Args:
        x: (B, R, L, C) post-LN pair activations (rows attend per row) —
            or the RAW pre-LN activations when `ln` is given.
        wq, wk, wv: (C, H*D) projection weights (column-major head blocks,
            i.e. the plain Linear kernel layout).
        bias: (B, H, L, L) attention bias, shared across rows.
        mask: (B, L) key mask (1 = valid).
        ln: optional (scale, bias) — LayerNorm x in-VMEM per block (the
            normalised tensor never exists in HBM; the caller then feeds
            RAW x and computes the bias via ops.pair_bias).
        gate: optional (wg, bg) — fold the sigmoid output gate into the
            fused projection and multiply in-kernel (bf16 fused-proj path
            only).
        out_proj: optional (wo, bo) with wo (H*D, C_out) — run the output
            projection in-kernel; with `residual` (B, R, L, C_out) the
            residual add joins it and the kernel returns the NEW pair
            block (B, R, L, C_out) directly.
    Returns: (B, R, L, H*D), dtype of x (gated when `gate`), or
        (B, R, L, C_out) when `out_proj` is given.
    """
    b, r, l, c = x.shape
    h = bias.shape[1]
    d = wq.shape[-1] // h
    scale = d ** -0.5
    import os as _os
    fused_proj = (x.dtype == jnp.bfloat16 and
                  _os.environ.get('ABX_TRI_ATTN_FUSED_PROJ', '1') == '1')
    if row_block is None:
        # Scoped VMEM is ~16 MB on v5e; the f32 working set at RB=8
        # (x + per-head q/k/v/logits/probs + out accumulator) exceeds it.
        env = _os.environ.get('ABX_TRI_ATTN_RB')
        row_block = (int(env) if env
                     else (4 if fused_proj or x.dtype != jnp.bfloat16
                           else 8))
    rpad = (-r) % row_block
    if rpad:
        x = jnp.pad(x, [(0, 0), (0, rpad), (0, 0), (0, 0)])
        if residual is not None:
            residual = jnp.pad(residual, [(0, 0), (0, rpad), (0, 0), (0, 0)])
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
    row_spec = lambda n: pl.BlockSpec((1, n), lambda bb, rr: (0, 0))
    # bf16 exp measured +4% end-to-end (37.5 -> 39.0 steps/s at
    # num_t=20); the argument is computed exactly in f32 and the attend
    # dot already rounds probabilities to bf16, so the added softmax noise
    # is of the same order as the existing bf16-attend rounding.  Disable
    # via ABX_TRI_ATTN_BF16_EXP=0 for strict-f32-softmax evaluation.
    bf16_softmax = (x.dtype == jnp.bfloat16 and
                    _os.environ.get('ABX_TRI_ATTN_BF16_EXP', '1') == '1')
    # Full-lane fused projection (one N=(3|4)*H*D dot + per-head VMEM
    # slices): measured +1 steps/s over per-head N=48 dots; needs RB=4 to
    # fit VMEM (the f32 working set grows by the (RB, L, NHD) y_all).
    # (C, H*D) mats are already per-head column blocks, so the fused
    # projection weight is a plain column concat [q|k|v(|g)].
    w_cols = [(wq * scale).astype(x.dtype), wk.astype(x.dtype),
              wv.astype(x.dtype)]
    if gate is not None:
        w_cols.append(gate[0].astype(x.dtype))
    w_all = jnp.concatenate(w_cols, axis=-1)
    n_proj = 4 if gate is not None else 3

    row_f32 = lambda v: v.reshape(1, -1).astype(jnp.float32)
    in_specs = [x_spec]
    operands = [x]
    if ln is not None:
        in_specs += [row_spec(c), row_spec(c)]
        operands += [row_f32(ln[0]), row_f32(ln[1])]
    in_specs += [w_spec, w_spec, w_spec,
                 pl.BlockSpec((c, n_proj * h * d), lambda bb, rr: (0, 0))]
    operands += [per_head(wq, scale), per_head(wk), per_head(wv), w_all]
    if gate is not None:
        in_specs.append(row_spec(h * d))
        operands.append(row_f32(gate[1]))
    c_out = h * d
    if out_proj is not None:
        assert residual is not None, 'out_proj epilogue needs the residual'
        wo, bo = out_proj
        c_out = wo.shape[-1]
        in_specs += [pl.BlockSpec((h * d, c_out), lambda bb, rr: (0, 0)),
                     row_spec(c_out),
                     pl.BlockSpec((1, row_block, l, c_out),
                                  lambda bb, rr: (bb, rr, 0, 0))]
        operands += [wo.astype(x.dtype), row_f32(bo), residual]
    in_specs += [pl.BlockSpec((1, h, l, l), lambda bb, rr: (bb, 0, 0, 0)),
                 pl.BlockSpec((1, 1, l), lambda bb, rr: (bb, 0, 0))]
    operands += [bias.astype(x.dtype), maskbias]

    kwargs = {}
    bias_bytes = h * l * l * jnp.dtype(x.dtype).itemsize
    if _HAS_PLTPU and not interpret and bias_bytes > 4 * 1024 * 1024:
        # 32-head seq-track shape: the per-program (H, L, L) bias block
        # alone is ~5 MB double-buffered; raise the scoped-VMEM budget
        # (v5e has 128 MB physical VMEM).
        kwargs['compiler_params'] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
    out = pl.pallas_call(
        functools.partial(_packed_kernel, scale=scale,
                          bf16_softmax=bf16_softmax,
                          fused_proj=fused_proj,
                          ln=ln is not None, gate=gate is not None,
                          out_proj=out_proj is not None),
        grid=grid,
        in_specs=in_specs,
        **kwargs,
        out_specs=pl.BlockSpec((1, row_block, l, c_out),
                               lambda bb, rr: (bb, rr, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, rp, l, c_out), x.dtype),
        interpret=interpret,
    )(*operands)
    return out[:, :r]


def _packed_cols_kernel(x_ref, s_ref, b_ref, wall_ref, bg_ref, bias_ref,
                        maskbias_ref, out_ref, *, h: int, d: int, eps: float,
                        bf16_softmax: bool):
    """Ending-node (per-column) attention for one (batch, col-block)
    program, consuming the RAW pair tensor in its natural layout.

    x_ref: (1, L, CB, C) — a block of COLUMNS of the natural (B, L, L, C)
    pair tensor.  The kernel transposes in VMEM (never through HBM),
    LayerNorms, projects q/k/v/gate in one dot, attends along the row
    axis, applies the sigmoid gate, and writes back transposed, so the
    HBM tensors stay in natural layout on both sides.
    wall_ref: (C, (3h+1)*d) fused [q|k|v|gate] projection (scale folded
    into q; gate bias applied in-kernel).  bias_ref: (1, H, L, L) with
    bias[h, q, k] = proj_pair(LN(pair[k, q])) — the transposed-node bias.
    """
    xt = jnp.transpose(x_ref[0], (1, 0, 2))          # (CB, L, C)
    x32 = xt.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, -1, keepdims=True) - mean * mean,
                      0.0)
    ln = ((x32 - mean) * jax.lax.rsqrt(var + eps) * s_ref[0]
          + b_ref[0]).astype(xt.dtype)               # (CB, L, C)
    in_dt = xt.dtype
    maskb = maskbias_ref[0]                          # (1, L)

    y_all = jax.lax.dot_general(ln, wall_ref[...],
                                (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    outs = []
    for hh in range(h):
        q = jax.lax.slice_in_dim(y_all, hh * d, (hh + 1) * d, axis=2)
        k = jax.lax.slice_in_dim(y_all, (h + hh) * d, (h + hh + 1) * d,
                                 axis=2)
        v = jax.lax.slice_in_dim(y_all, (2 * h + hh) * d,
                                 (2 * h + hh + 1) * d, axis=2)
        logits = jax.lax.dot_general(
            q.astype(in_dt), k.astype(in_dt),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (CB, L, L)
        logits = (logits + bias_ref[0, hh][None].astype(jnp.float32)
                  + maskb[None])
        m = jnp.max(logits, axis=-1, keepdims=True)
        if bf16_softmax:
            e = jnp.exp((logits - m).astype(jnp.bfloat16)).astype(
                jnp.float32)
        else:
            e = jnp.exp(logits - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)
        outs.append(jax.lax.dot_general(
            probs.astype(in_dt), v.astype(in_dt),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))      # (CB, L, D)
    gate = (jax.lax.slice_in_dim(y_all, 3 * h * d, 4 * h * d, axis=2)
            + bg_ref[0][None, None, :])
    res = jnp.concatenate(outs, axis=-1) * jax.nn.sigmoid(gate)
    out_ref[0] = jnp.transpose(res.astype(out_ref.dtype), (1, 0, 2))


@functools.partial(jax.jit, static_argnames=('col_block', 'eps',
                                             'interpret'))
def triangle_attention_packed_cols(x, ln_scale, ln_bias, wq, wk, wv,
                                   wg, bg, bias, mask, col_block=None,
                                   eps: float = 1e-5,
                                   interpret: bool = False):
    """Layout-native ENDING-NODE triangle attention (LN + projections +
    attention + gate), natural layout in and out.

    MEASURED NEGATIVE — kept unwired as a recorded result.  The XLA path
    materialises pair^T, LayerNorms it, attends, and transposes back —
    ~6 ms/step of HBM transpose+LN traffic at B=4, L=288 (round-3
    profile).  This kernel reads COLUMN blocks of the natural tensor so
    those transposes happen on VMEM-resident blocks instead — but the
    per-program (L, CB, C) transposes cost 4.6 vs 2.9 ms/call against the
    row kernel, cancelling the saving (75.2 vs 74.9 ms/step device, full
    sampler).  The LN-fold row path (triangle_attention_packed with
    ln=/gate=) gets the LN saving without the in-kernel transposes.

    Args:
        x: (B, L, L, C) RAW pair activations (pre-LN), natural layout.
        ln_scale, ln_bias: (C,) input LayerNorm parameters.
        wq, wk, wv: (C, H*D) projection weights; wg, bg: (C, H*D), (H*D)
            gate projection.
        bias: (B, H, L, L) attention bias for the TRANSPOSED node, i.e.
            bias[b, h, q, k] = proj_pair(LN(x[b, k, q])) — computed by the
            caller (pair_bias_proj + transpose of the tiny (L, L, H)).
        mask: (B, L) key mask over the row axis (1 = valid).
    Returns: (B, L, L, H*D) gated attention output, natural layout,
        out[b, j, i] = (ending-node attention output at pt-position
        (i, j)) — ready for the pointwise out-projection + residual.
    """
    b, l, _, c = x.shape
    h = bias.shape[1]
    d = wq.shape[-1] // h
    scale = d ** -0.5
    import os as _os
    if col_block is None:
        # Mosaic requires the second-minor block dim (the column count) to
        # be a multiple of 8; the working set at CB=8 needs ~24 MB scoped
        # VMEM (limit raised below).
        env = _os.environ.get('ABX_TRI_ATTN_CB')
        col_block = int(env) if env else 8
    cpad = (-l) % col_block
    if cpad:
        x = jnp.pad(x, [(0, 0), (0, 0), (0, cpad), (0, 0)])
    lp = x.shape[2]
    n_cb = lp // col_block
    bf16_softmax = (x.dtype == jnp.bfloat16 and
                    _os.environ.get('ABX_TRI_ATTN_BF16_EXP', '1') == '1')
    w_all = jnp.concatenate(
        [(wq * scale).astype(x.dtype), wk.astype(x.dtype),
         wv.astype(x.dtype), wg.astype(x.dtype)], axis=-1)
    maskbias = ((1.0 - mask.astype(jnp.float32)) * BIG_NEG)[:, None, :]
    row = lambda v: v.reshape(1, -1).astype(jnp.float32)
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs['compiler_params'] = pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024)
    out = pl.pallas_call(
        functools.partial(_packed_cols_kernel, h=h, d=d, eps=eps,
                          bf16_softmax=bf16_softmax),
        grid=(b, n_cb),
        **kwargs,
        in_specs=[
            pl.BlockSpec((1, l, col_block, c), lambda bb, cc: (bb, 0, cc, 0)),
            pl.BlockSpec((1, c), lambda bb, cc: (0, 0)),
            pl.BlockSpec((1, c), lambda bb, cc: (0, 0)),
            pl.BlockSpec((c, 4 * h * d), lambda bb, cc: (0, 0)),
            pl.BlockSpec((1, h * d), lambda bb, cc: (0, 0)),
            pl.BlockSpec((1, h, l, l), lambda bb, cc: (bb, 0, 0, 0)),
            pl.BlockSpec((1, 1, l), lambda bb, cc: (bb, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, l, col_block, h * d),
                               lambda bb, cc: (bb, 0, cc, 0)),
        out_shape=jax.ShapeDtypeStruct((b, l, lp, h * d), x.dtype),
        interpret=interpret,
    )(x, row(ln_scale), row(ln_bias), w_all, row(bg), bias.astype(x.dtype),
      maskbias)
    return out[:, :, :l]


def triangle_attention_packed_cols_reference(x, ln_scale, ln_bias, wq, wk,
                                             wv, wg, bg, bias, mask,
                                             eps: float = 1e-5):
    """Plain-XLA semantics twin: transpose -> LN -> attend -> gate ->
    transpose back (the ending-node XLA path, minus out-proj/residual)."""
    xt = jnp.swapaxes(x, 1, 2)
    x32 = xt.astype(jnp.float32)
    mean = jnp.mean(x32, -1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, -1, keepdims=True) - mean * mean,
                      0.0)
    ln = ((x32 - mean) * jax.lax.rsqrt(var + eps) * ln_scale
          + ln_bias).astype(x.dtype)
    out = triangle_attention_packed_reference(ln, wq, wk, wv, bias, mask)
    gate = jnp.dot(ln.astype(jnp.float32), wg.astype(jnp.float32)) + bg
    out = out.astype(jnp.float32) * jax.nn.sigmoid(gate)
    return jnp.swapaxes(out.astype(x.dtype), 1, 2)


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
