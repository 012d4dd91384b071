"""Pallas TPU kernel: fused IPA attention (logits + softmax + attends).

The IPA attention pipeline (reference folding.py:60-121) assembles its
logits from three terms — a scalar q·k dot, a squared point distance
computed in f32, and a pair bias — then softmaxes and attends over three
value streams (scalar, 3D points, and the pair track).  XLA executes this
as ~15 separate (B, H, L, L) f32 ops per IPA layer (adds, transposes,
reduce-max/exp/sum, three attend einsums); at 8 layers x 3 trunk passes
the chain profiled at ~4 ms/step (B=4, L=288) of mostly launch/layout
overhead on 16 MB tensors.

This kernel computes the whole pipeline for a block of query rows in one
VMEM pass: per head, logits = qs·ks^T + pw·(q2 + k2 - 2 qp·kp^T) + bias
+ mask, f32 softmax, then the three attends batched over heads/rows.
The (B, H, L, L) logits/probability tensors never exist in HBM.

Layout contract: the small per-residue q/k/v tensors enter HEAD-MAJOR
((B, H, L, D) — they are O(L) sized, so the transpose outside is noise),
the O(L^2) pair tensor and bias enter in their natural layouts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BIG_NEG = -1e9


def _kernel(qs_ref, ks_ref, vs_ref, qp_ref, kp_ref, vp_ref, q2_ref, k2_ref,
            bias_ref, maskb_ref, pair_ref,
            out_s_ref, out_p_ref, out_2d_ref, *, h: int):
    """One (batch, row-block) program.

    The per-head point weight pw is FOLDED by the wrapper: qp and the q2/k2
    row sums arrive pre-scaled by pw_h, so the point term is just
    q2 + k2 - 2*cross.

    qs_ref: (1, H, IB, Ds) bf16 scalar queries, pre-scaled.
    ks_ref/vs_ref: (1, H, L, Ds) bf16.
    qp_ref: (1, H, IB, Pq*3) f32 centered global query points (x pw).
    kp_ref: (1, H, L, Pq*3) f32; vp_ref: (1, H, L, Pv*3) f32.
    q2_ref: (1, IB, H) f32 pw*|q|^2 row sums; k2_ref: (1, H, L) f32 ditto.
    bias_ref: (1, H, IB, L) f32 pair bias (rows of the hoisted bias).
    maskb_ref: (1, 1, L) f32 additive key mask.
    pair_ref: (1, IB, L, C) pair activations (natural layout).
    out_s_ref: (1, IB, H*Ds); out_p_ref: (1, IB, H*Pv*3) f32;
    out_2d_ref: (1, IB, H*C).
    """
    maskb = maskb_ref[0]                       # (1, L)
    probs_h = []
    for hh in range(h):
        qs = qs_ref[0, hh]                     # (IB, Ds) bf16
        ks = ks_ref[0, hh]                     # (L, Ds)
        logits = jax.lax.dot_general(
            qs, ks, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (IB, L)
        qp = qp_ref[0, hh]                     # (IB, P3) f32, x pw
        kp = kp_ref[0, hh]                     # (L, P3) f32
        cross = jax.lax.dot_general(
            qp, kp, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (IB, L)
        point_term = (q2_ref[0, :, hh][:, None] + k2_ref[0, hh][None, :]
                      - 2.0 * cross)
        logits = logits + point_term + bias_ref[0, hh] + maskb
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        probs_h.append(e / jnp.sum(e, axis=-1, keepdims=True))

    in_dt = pair_ref.dtype
    # Scalar / point attends per head, heads concatenated on lanes
    # (a (H, IB, D) -> (IB, H*D) transpose+reshape is an unsupported
    # Mosaic shape cast; lane concat is the supported concat-ready form).
    outs_s, outs_p = [], []
    for hh in range(h):
        p_lp = probs_h[hh].astype(in_dt)            # (IB, L)
        outs_s.append(jax.lax.dot_general(
            p_lp, vs_ref[0, hh], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))    # (IB, Ds)
        # Point attend in f32 (cancellation-sensitive frame math after).
        outs_p.append(jax.lax.dot_general(
            probs_h[hh], vp_ref[0, hh], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))    # (IB, Pv3)
    out_s_ref[0] = jnp.concatenate(outs_s, axis=-1).astype(out_s_ref.dtype)
    out_p_ref[0] = jnp.concatenate(outs_p, axis=-1)

    # Pair attend: each query row contracts its own pair row —
    # batch over IB: (IB, H, L) @ (IB, L, C).
    probs = jnp.stack(probs_h, axis=0)              # (H, IB, L) f32
    out_2d = jax.lax.dot_general(
        jnp.transpose(probs.astype(in_dt), (1, 0, 2)), pair_ref[0],
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)         # (IB, H, C)
    ib = out_2d.shape[0]
    out_2d_ref[0] = out_2d.reshape(ib, -1).astype(out_2d_ref.dtype)


@functools.partial(jax.jit, static_argnames=('row_block', 'interpret'))
def ipa_attention(qs, ks, vs, qp, kp, vp, pw, bias, mask, pair,
                  row_block: int = None, interpret: bool = False):
    """Fused IPA attention.

    Args:
        qs: (B, L, H, Ds) scalar queries, ALREADY scaled by the scalar
            logit weight (sqrt(1/(3*Ds)) etc. folded by the caller).
        ks, vs: (B, L, H, Ds) scalar keys/values.
        qp, kp: (B, L, H, Pq, 3) f32 centered global query/key points.
        vp: (B, L, H, Pv, 3) f32 global value points.
        pw: (H,) f32 point-term weights (the full -0.5*w_c*softplus
            coefficient — applied to the squared distance as-is).
        bias: (B, H, L, L) pair bias (hoisted, layer-invariant).
        mask: (B, L) key mask (1 = valid).
        pair: (B, L, L, C) pair activations, natural layout.
    Returns:
        (result_scalar (B, L, H*Ds) pair.dtype,
         result_point  (B, L, H, Pv, 3) f32,
         result_pair   (B, L, H*C) pair.dtype)
    """
    b, l, h, ds = qs.shape
    pq3 = qp.shape[-2] * 3
    pv3 = vp.shape[-2] * 3
    c = pair.shape[-1]
    import os as _os
    if row_block is None:
        env = _os.environ.get('ABX_IPA_ATTN_RB')
        row_block = int(env) if env else 32

    def head_major(t, d):
        return jnp.transpose(t.reshape(b, l, h, d), (0, 2, 1, 3))

    qs_hm = head_major(qs, ds)
    ks_hm, vs_hm = head_major(ks, ds), head_major(vs, ds)
    qp_hm = head_major(qp.astype(jnp.float32), pq3)
    kp_hm = head_major(kp.astype(jnp.float32), pq3)
    vp_hm = head_major(vp.astype(jnp.float32), pv3)
    # Fold the (negative) per-head point weight: scale qp and both squared
    # norms by pw_h so the in-kernel point term is q2 + k2 - 2*cross.
    pwf = pw.astype(jnp.float32)
    q2 = jnp.transpose(jnp.sum(qp_hm * qp_hm, axis=-1)
                       * pwf[None, :, None], (0, 2, 1))   # (B, L, H)
    k2 = jnp.sum(kp_hm * kp_hm, axis=-1) * pwf[None, :, None]  # (B, H, L)
    qp_hm = qp_hm * pwf[None, :, None, None]

    rpad = (-l) % row_block
    if rpad:
        pad4 = [(0, 0), (0, 0), (0, rpad), (0, 0)]
        qs_hm, qp_hm = jnp.pad(qs_hm, pad4), jnp.pad(qp_hm, pad4)
        q2 = jnp.pad(q2, [(0, 0), (0, rpad), (0, 0)])
        bias = jnp.pad(bias, [(0, 0), (0, 0), (0, rpad), (0, 0)])
        pair = jnp.pad(pair, [(0, 0), (0, rpad), (0, 0), (0, 0)])
    lp = qs_hm.shape[2]
    n_rb = lp // row_block

    maskbias = ((1.0 - mask.astype(jnp.float32)) * BIG_NEG)[:, None, :]
    grid = (b, n_rb)
    blk = lambda d: pl.BlockSpec((1, h, row_block, d),
                                 lambda bb, ii: (bb, 0, ii, 0))
    full = lambda d: pl.BlockSpec((1, h, l, d), lambda bb, ii: (bb, 0, 0, 0))
    outs = pl.pallas_call(
        functools.partial(_kernel, h=h),
        grid=grid,
        in_specs=[
            blk(ds), full(ds), full(ds),
            blk(pq3), full(pq3), full(pv3),
            pl.BlockSpec((1, row_block, h), lambda bb, ii: (bb, ii, 0)),
            pl.BlockSpec((1, h, l), lambda bb, ii: (bb, 0, 0)),
            blk(l),
            pl.BlockSpec((1, 1, l), lambda bb, ii: (bb, 0, 0)),
            pl.BlockSpec((1, row_block, l, c), lambda bb, ii: (bb, ii, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, row_block, h * ds), lambda bb, ii: (bb, ii, 0)),
            pl.BlockSpec((1, row_block, h * pv3), lambda bb, ii: (bb, ii, 0)),
            pl.BlockSpec((1, row_block, h * c), lambda bb, ii: (bb, ii, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, lp, h * ds), pair.dtype),
            jax.ShapeDtypeStruct((b, lp, h * pv3), jnp.float32),
            jax.ShapeDtypeStruct((b, lp, h * c), pair.dtype),
        ],
        interpret=interpret,
    )(qs_hm, ks_hm, vs_hm, qp_hm, kp_hm, vp_hm, q2, k2,
      bias.astype(jnp.float32), maskbias, pair)
    out_s, out_p, out_2d = (o[:, :l] for o in outs)
    return out_s, out_p.reshape(b, l, h, pv3 // 3, 3), out_2d


def ipa_attention_reference(qs, ks, vs, qp, kp, vp, pw, bias, mask, pair):
    """Plain-XLA semantics twin (tests / fallback)."""
    logits = jnp.einsum('bihd,bjhd->bhij', qs.astype(jnp.float32),
                        ks.astype(jnp.float32))
    q2 = jnp.sum(jnp.square(qp.astype(jnp.float32)), axis=(-1, -2))
    k2 = jnp.sum(jnp.square(kp.astype(jnp.float32)), axis=(-1, -2))
    cross = jnp.einsum('bihpr,bjhpr->bhij', qp.astype(jnp.float32),
                       kp.astype(jnp.float32))
    dist2 = (q2.transpose(0, 2, 1)[:, :, :, None]
             + k2.transpose(0, 2, 1)[:, :, None, :] - 2.0 * cross)
    logits = logits + pw[None, :, None, None] * dist2
    logits = logits + bias.astype(jnp.float32)
    logits = logits + ((1.0 - mask.astype(jnp.float32)) * BIG_NEG)[
        :, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1)
    out_s = jnp.einsum('bhij,bjhd->bihd', probs.astype(pair.dtype), vs)
    b, l, h, ds = out_s.shape
    out_p = jnp.einsum('bhij,bjhpr->bihpr', probs, vp.astype(jnp.float32))
    out_2d = jnp.einsum('bhij,bijc->bihc', probs.astype(pair.dtype), pair)
    return (out_s.reshape(b, l, h * ds), out_p,
            out_2d.reshape(b, l, -1))
