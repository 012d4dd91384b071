"""Seqformer trunk: single+pair representation evolution.

Parity surface: /root/reference/abx/model/seqformer.py — SeqAttentionWithPair-
Bias, Transition, ESMFold-style OuterProductMean (prod ‖ diff), Triangle-
Multiplication (out/in), TriangleAttention (start/end), block-diagonal
antibody/antigen pair assembly, sinusoidal timestep embedding, and recycling
injection.

TPU notes:
  * All attention/triangle contractions are batched einsums that XLA maps onto
    the MXU; masks are additive-bias style (no boolean masked_fill) so the
    kernels fuse.  The triangle contraction optionally routes through the
    Pallas kernel in abx_tpu/ops/triangle.py (env ABX_PALLAS_TRIANGLE=1;
    default off — measured XLA is already near peak for this op on v5e).
  * Dropout uses flax RNG collections; inference passes deterministic=True
    so the whole trunk is side-effect free and scan-friendly.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from abx_tpu.common import residue_constants as rc
from abx_tpu.models.encoder import (PairEmbedding, ResidueEmbedding,
                                    TokenEmbedding, TokenEmbeddingParams)
from abx_tpu.models.modules import (MLP, LayerNorm, Linear, LinearParams,
                                    fused_dense, get_timestep_embedding,
                                    shared_dropout)

BIG_NEG = -1e9


def pair_concat(pair_1, pair_2):
    """Block-diagonal pair assembly (reference seqformer.py:24-45)."""
    b, l1, _, c = pair_1.shape
    l2 = pair_2.shape[1]
    top = jnp.concatenate(
        [pair_1, jnp.zeros((b, l1, l2, c), pair_1.dtype)], axis=2)
    bottom = jnp.concatenate(
        [jnp.zeros((b, l2, l1, c), pair_2.dtype), pair_2], axis=2)
    return jnp.concatenate([top, bottom], axis=1)


class SpatialDepthWiseInception(nn.Module):
    """Grouped depthwise 1-D convolution over the sequence axis.

    Port of reference seqformer.py:632-674 (`SpatialDepthWiseConvolution` +
    `SpatialDepthWiseInception`).  Disabled in the released config
    (`inp_kernels: []` everywhere) — ported so a checkpoint trained with it
    enabled converts and runs (VERDICT r2 missing #5).

    Input layout (B, N, L, D): N is the reference's flattened `(rows·heads)`
    axis — NOTE the reference groups over that FLATTENED axis (s-major), so
    for pair-track attention the inception groups partition attention ROWS,
    not heads; reproduced exactly.  N is split into `len(kernels)` equal
    groups: group 0 (kernels[0] == 1) passes through; group i gets a
    depthwise conv of width kernels[i] over L, weights per D-channel and
    shared across the group's N slots (torch Conv1d(D, D, k, groups=D) on
    (B·N, D, L)).
    """
    head_dim: int
    kernels: Any

    @nn.compact
    def __call__(self, x):
        ks = tuple(int(k) for k in self.kernels)
        assert len(ks) > 1 and ks[0] == 1, 'kernels[0] must be 1'
        n = x.shape[1]
        assert n % len(ks) == 0
        g = n // len(ks)
        l = x.shape[2]
        outs = [x[:, :g]]
        for i, k in enumerate(ks[1:]):
            # torch pads k//2 both sides: shape-preserving only for odd k.
            assert k % 2 == 1, f'inp kernel {k} must be odd'
            # torch Conv1d(D, D, k, groups=D) init: U(±1/sqrt(k)).
            w = self.param(
                f'conv{i}_weight',
                nn.initializers.variance_scaling(1 / 3, 'fan_in', 'uniform'),
                (k, self.head_dim))
            b = self.param(f'conv{i}_bias', nn.initializers.zeros,
                           (self.head_dim,))
            xg = x[:, g * (i + 1):g * (i + 2)]
            xp = jnp.pad(xg, ((0, 0), (0, 0), (k // 2, k // 2), (0, 0)))
            y = b.astype(x.dtype)
            for t in range(k):
                y = y + xp[:, :, t:t + l] * w[t].astype(x.dtype)
            outs.append(y)
        return jnp.concatenate(outs, axis=1)


def _sdwi_heads(t, kernels, head_dim, name):
    """Apply SDWI to a heads-minor tensor (..., L, h, d) by flattening the
    leading (rows, heads) axes s-major, exactly like the reference's
    `rearrange(t, 'b s h l d -> b (s h) l d')`."""
    shape = t.shape
    b, l, h, d = shape[0], shape[-3], shape[-2], shape[-1]
    rows = 1
    for s in shape[1:-3]:
        rows *= int(s)
    x = t.reshape(b, rows, l, h, d)
    x = jnp.moveaxis(x, 3, 2).reshape(b, rows * h, l, d)
    x = SpatialDepthWiseInception(head_dim, kernels, name=name)(x)
    x = jnp.moveaxis(x.reshape(b, rows, h, l, d), 2, 3)
    return x.reshape(shape)


def _sdwi_pair(t, kernels, num_head, per_row, name):
    """Apply SDWI to a pair-track projection (B, I, J, h·d), reproducing the
    reference's orientation-dependent rearrange (seqformer.py:460-478):
    per_row convolves over j with groups over (i·h); per_column convolves
    over i with groups over (j·h)."""
    b, i, j, hd = t.shape
    d = hd // num_head
    x = t.reshape(b, i, j, num_head, d)
    if per_row:
        x = jnp.moveaxis(x, 3, 2).reshape(b, i * num_head, j, d)
    else:
        x = x.transpose(0, 2, 3, 1, 4).reshape(b, j * num_head, i, d)
    x = SpatialDepthWiseInception(d, kernels, name=name)(x)
    if per_row:
        x = jnp.moveaxis(x.reshape(b, i, num_head, j, d), 2, 3)
    else:
        x = x.reshape(b, j, num_head, i, d).transpose(0, 3, 1, 2, 4)
    return x.reshape(b, i, j, hd)


class GatedAttention(nn.Module):
    """Multi-head attention with optional pair bias, gating and key mask.

    Equivalent to reference `Attention` (seqformer.py:228-312) with the
    fused-QKV (`split_first=False`) and split projections both supported.
    Operates on (B, S, Q, C) where S is a broadcast "rows" axis.
    `inp_kernels` enables the SpatialDepthWiseInception q/k/v convolutions
    (reference :254-258,283-288); incompatible with the fused kernels, so
    callers pass `fused=False` when set.
    """
    key_dim: int
    value_dim: int
    output_dim: int
    num_head: int
    gating: bool = True
    split_first: bool = True
    inp_kernels: Any = ()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q_data, k_data=None, bias=None, k_mask=None,
                 fused: bool = False, bias_llh=None, residual=None,
                 ln=None):
        h = self.num_head
        key_dim = self.key_dim // h
        value_dim = self.value_dim // h
        c_in = q_data.shape[-1]
        gate_pre = None
        inp = tuple(self.inp_kernels or ())
        fused = fused and not inp  # conv sits between proj and attention

        if self.split_first:
            assert k_data is not None
            if k_data is q_data:
                # Self-attention: q/k/v (and the gate, which also reads
                # q_data) fuse into ONE matmul — param tree unchanged.
                kq, _ = LinearParams(self.key_dim, c_in, init='attn',
                                     use_bias=False, name='proj_q')()
                kk, _ = LinearParams(self.key_dim, c_in, init='attn',
                                     use_bias=False, name='proj_k')()
                kv, _ = LinearParams(self.value_dim, c_in, init='attn',
                                     use_bias=False, name='proj_v')()
                if (fused and k_mask is not None
                        and (bias_llh is not None or bias is not None)):
                    # Layout-native fused path: the kernel does the per-head
                    # projections itself — q/k/v never exist in HBM and no
                    # head-major transposes are emitted.
                    from abx_tpu.ops.tri_attention import \
                        triangle_attention_packed
                    att_bias = (bias if bias is not None
                                else jnp.moveaxis(bias_llh, -1, -3))
                    if ln is not None and self.gating:
                        # LN-fold: q_data is RAW; LayerNorm + sigmoid gate
                        # run in-kernel.  With a residual, the output
                        # projection + residual add run in-kernel too
                        # (XLA emitted them as ~1 ms/call loop fusions and
                        # round-tripped the attended tensor through HBM).
                        kg, bg = LinearParams(self.value_dim, c_in,
                                              init='gate', name='gate')()
                        if residual is not None:
                            wo, bo = LinearParams(
                                self.output_dim, self.value_dim,
                                init='final', name='proj_out')()
                            return triangle_attention_packed(
                                q_data, kq, kk, kv, att_bias, k_mask[:, 0],
                                ln=ln, gate=(kg, bg), out_proj=(wo, bo),
                                residual=residual)
                        out = triangle_attention_packed(
                            q_data, kq, kk, kv, att_bias, k_mask[:, 0],
                            ln=ln, gate=(kg, bg))
                        out = Linear(self.output_dim, init='final',
                                     dtype=self.dtype, name='proj_out')(out)
                        return out if residual is None else residual + out
                    out = triangle_attention_packed(
                        q_data, kq, kk, kv, att_bias, k_mask[:, 0])
                    from abx_tpu.ops.registry import use_gate_proj_kernel
                    if (self.gating and residual is not None
                            and use_gate_proj_kernel()):
                        # Fused epilogue: gate -> proj_out -> +residual in
                        # one VMEM pass (ops/gate_proj.py).
                        kg, bg = LinearParams(self.value_dim, c_in,
                                              init='gate', name='gate')()
                        gate_pre = (jnp.dot(q_data.astype(self.dtype),
                                            kg.astype(self.dtype))
                                    + bg.astype(self.dtype))
                        wout, bout = LinearParams(
                            self.output_dim, self.value_dim, init='final',
                            name='proj_out')()
                        from abx_tpu.ops.gate_proj import gate_proj_residual
                        return gate_proj_residual(out, gate_pre, wout,
                                                  bout, residual)
                    if self.gating:
                        kg, bg = LinearParams(self.value_dim, c_in,
                                              init='gate', name='gate')()
                        gate_pre = (jnp.dot(q_data.astype(self.dtype),
                                            kg.astype(self.dtype))
                                    + bg.astype(self.dtype))
                        out = out * nn.sigmoid(gate_pre)
                    out = Linear(self.output_dim, init='final',
                                 dtype=self.dtype, name='proj_out')(out)
                    return out if residual is None else residual + out
                branches = [(kq, None), (kk, None), (kv, None)]
                if self.gating:
                    branches.append(LinearParams(
                        self.value_dim, c_in, init='gate', name='gate')())
                    q, k, v, gate_pre = fused_dense(q_data, branches,
                                                    self.dtype)
                else:
                    q, k, v = fused_dense(q_data, branches, self.dtype)
            else:
                q = Linear(self.key_dim, init='attn', use_bias=False,
                           dtype=self.dtype, name='proj_q')(q_data)
                k = Linear(self.key_dim, init='attn', use_bias=False,
                           dtype=self.dtype, name='proj_k')(k_data)
                v = Linear(self.value_dim, init='attn', use_bias=False,
                           dtype=self.dtype, name='proj_v')(k_data)

        def heads_minor(t, d):
            # (..., q, h*d) -> (..., q, h, d): a free reshape; einsums
            # below keep this layout so XLA folds the head split into the
            # dot_generals instead of emitting copies.
            return t.reshape(t.shape[:-1] + (h, d))

        if not self.split_first:
            assert k_data is None
            if (fused and ln is not None and self.gating
                    and residual is not None and q_data.ndim == 4
                    and bias is not None and k_mask is not None):
                # Packed seq-track attention: one pallas program per batch
                # element does LN + fused per-head q/k/v/gate projection +
                # biased softmax + gate + out-proj + residual (R=1 row
                # block; the proj_in per-head [q‖k‖v] columns are regrouped
                # into [q_all|k_all|v_all] outside — a tiny weight-only
                # reshape, param tree unchanged).
                from abx_tpu.ops.tri_attention import \
                    triangle_attention_packed
                kin, _ = LinearParams(self.key_dim * 3, c_in, init='attn',
                                      use_bias=False, name='proj_in')()
                kg, bg = LinearParams(self.value_dim, c_in, init='gate',
                                      name='gate')()
                wo, bo = LinearParams(self.output_dim, self.value_dim,
                                      init='final', name='proj_out')()
                w3 = kin.reshape(c_in, h, 3, key_dim)
                wq_, wk_, wv_ = (w3[:, :, i].reshape(c_in, h * key_dim)
                                 for i in range(3))
                return triangle_attention_packed(
                    q_data, wq_, wk_, wv_, bias, k_mask[:, 0], row_block=1,
                    ln=ln, gate=(kg, bg), out_proj=(wo, bo),
                    residual=residual)
            # Fused projection with PER-HEAD [q‖k‖v] column layout,
            # matching the reference (seqformer.py:280-281: reshape to
            # heads first, then chunk) — keeps checkpoint conversion a
            # pure transpose.  The gate reads the same input and joins
            # the matmul.
            branches = [LinearParams(self.key_dim * 3, c_in, init='attn',
                                     use_bias=False, name='proj_in')()]
            if self.gating:
                branches.append(LinearParams(
                    self.value_dim, c_in, init='gate', name='gate')())
                qkv, gate_pre = fused_dense(q_data, branches, self.dtype)
            else:
                (qkv,) = fused_dense(q_data, branches, self.dtype)
            qkv = heads_minor(qkv, 3 * key_dim)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q, k, v = (heads_minor(q, key_dim), heads_minor(k, key_dim),
                       heads_minor(v, value_dim))
        if inp:
            q = _sdwi_heads(q, inp, key_dim, 'inp_q')
            k = _sdwi_heads(k, inp, key_dim, 'inp_k')
            v = _sdwi_heads(v, inp, value_dim, 'inp_v')
        if bias is None and bias_llh is not None:
            bias = jnp.moveaxis(bias_llh, -1, -3)
        q = q * (key_dim ** -0.5)
        logits = jnp.einsum('...qhd,...khd->...hqk', q, k)
        if bias is not None:
            # bias: (B, H, Q, K), shared over the rows axis.
            logits = logits + bias[:, None].astype(logits.dtype)
        if k_mask is not None:
            # k_mask: (B, S, K) -> additive mask.
            neg = (1.0 - k_mask[:, :, None, None, :]) * BIG_NEG
            logits = logits + neg.astype(logits.dtype)

        weights = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            self.dtype)
        out = jnp.einsum('...hqk,...khd->...qhd', weights, v)
        out = out.reshape(out.shape[:-2] + (self.value_dim,))
        if self.gating:
            if gate_pre is None:
                gate_pre = Linear(self.value_dim, init='gate',
                                  dtype=self.dtype, name='gate')(q_data)
            out = out * nn.sigmoid(gate_pre)
        out = Linear(self.output_dim, init='final', dtype=self.dtype,
                     name='proj_out')(out)
        return out if residual is None else residual + out


class SeqAttentionWithPairBias(nn.Module):
    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, seq_act, pair_act, mask, deterministic: bool = True,
                 residual: bool = False):
        """`residual=True` returns seq_act + attention(seq_act) — at
        inference the add folds into the packed-attention epilogue."""
        from abx_tpu.models.modules import LayerNormParams, layer_norm
        from abx_tpu.ops.registry import (use_fused_pair_bias,
                                          use_packed_seq_attn)
        c = self.config
        inp = tuple(getattr(c, 'inp_kernels', ()) or ())
        res_in = seq_act
        s_scale, s_bias = LayerNormParams(seq_act.shape[-1],
                                          name='seq_norm')()
        scale, ln_bias = LayerNormParams(pair_act.shape[-1],
                                         name='pair_norm')()
        wp, _ = LinearParams(c.num_head, pair_act.shape[-1], init='linear',
                             use_bias=False, name='proj_pair')()
        if (deterministic and pair_act.ndim == 4
                and jax.default_backend() == 'tpu'
                and use_fused_pair_bias()):
            # The pair track feeds this module ONLY through LN -> C->H
            # projection: one VMEM pass, the LN'd tensor never hits HBM,
            # and the kernel emits the (B, H, L, L) attention-bias layout
            # directly (no HBM moveaxis of the (B, L, L, 32) tensor)
            # (ops/pair_bias.py).
            from abx_tpu.ops.pair_bias import pair_bias_proj
            bias = pair_bias_proj(pair_act, scale, ln_bias, wp,
                                  transpose_out=True)
        else:
            ln = layer_norm(pair_act, scale, ln_bias, dtype=self.dtype)
            bias = jnp.dot(ln.astype(self.dtype), wp.astype(self.dtype))
            bias = jnp.moveaxis(bias, -1, -3)  # (B, H, L, L)
        if (residual and deterministic and not inp
                and jax.default_backend() == 'tpu'
                and use_packed_seq_attn()):
            # Packed path: seq LN + per-head projections + biased softmax
            # + gate + out-proj + residual in one kernel (raw seq_act in).
            out = GatedAttention(
                key_dim=seq_act.shape[-1], value_dim=seq_act.shape[-1],
                output_dim=seq_act.shape[-1], num_head=c.num_head,
                split_first=False, dtype=self.dtype, name='attn')(
                seq_act[:, None], bias=bias, k_mask=mask[:, None],
                fused=True, ln=(s_scale, s_bias),
                residual=res_in[:, None])
            return out[:, 0]
        seq_act = layer_norm(seq_act, s_scale, s_bias, dtype=self.dtype)
        out = GatedAttention(
            key_dim=seq_act.shape[-1], value_dim=seq_act.shape[-1],
            output_dim=seq_act.shape[-1], num_head=c.num_head,
            split_first=False, inp_kernels=inp,
            dtype=self.dtype, name='attn')(
            seq_act[:, None], bias=bias, k_mask=mask[:, None])
        out = out[:, 0]
        return res_in + out if residual else out


class Transition(nn.Module):
    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, act, mask=None, residual: bool = False,
                 deterministic: bool = True):
        """LN -> C*factor -> relu -> C [+ act when residual].

        On the 4-D pair track at inference this dispatches to the fused
        Pallas block (ops/transition.py) — one HBM round trip instead of
        five; the functional path below is the differentiable fallback.
        """
        from abx_tpu.models.modules import LayerNormParams, layer_norm
        from abx_tpu.ops.registry import use_fused_transition
        c = self.config
        num_in = act.shape[-1]
        n_mid = num_in * c.num_intermediate_factor
        scale, ln_bias = LayerNormParams(num_in, name='norm')()
        w1, b1 = LinearParams(n_mid, num_in, init='linear',
                              name='in_proj')()
        w2, b2 = LinearParams(num_in, n_mid, init='final',
                              name='out_proj')()
        if (residual and deterministic and act.ndim == 4
                and jax.default_backend() == 'tpu'
                and use_fused_transition()):
            from abx_tpu.ops.transition import fused_transition
            return fused_transition(act, scale, ln_bias, w1, b1, w2, b2)
        x = layer_norm(act, scale, ln_bias, dtype=self.dtype)
        x = nn.relu(jnp.dot(x.astype(self.dtype), w1.astype(self.dtype))
                    + b1.astype(self.dtype))
        out = (jnp.dot(x.astype(self.dtype), w2.astype(self.dtype))
               + b2.astype(self.dtype))
        return act + out if residual else out


class OuterProductMean(nn.Module):
    """ESMFold-style outer product+difference (seqformer.py:380-411)."""
    config: Any
    num_out_channel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, act, mask):
        c = self.config
        mask_col = mask[..., None]
        act = LayerNorm(dtype=self.dtype, name='norm')(act)
        left, right = fused_dense(act, [
            LinearParams(c.num_outer_channel, act.shape[-1], init='linear',
                         name='left_proj')(),
            LinearParams(c.num_outer_channel, act.shape[-1], init='linear',
                         name='right_proj')(),
        ], self.dtype)
        left = mask_col * left
        right = mask_col * right
        prod = left[:, None, :, :] * right[:, :, None, :]
        diff = left[:, None, :, :] - right[:, :, None, :]
        out = jnp.concatenate([prod, diff], axis=-1)
        return Linear(self.num_out_channel, init='final', dtype=self.dtype,
                      name='out_proj')(out)


class TriangleMultiplication(nn.Module):
    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, act, mask, residual: bool = False):
        """Triangle multiplication; `residual=True` folds the +act into the
        fused post-kernel (inference path)."""
        from abx_tpu.models.modules import LayerNormParams, layer_norm
        from abx_tpu.ops.registry import (use_fused_trimult,
                                          use_pallas_triangle)
        from abx_tpu.ops.triangle import triangle_multiply
        c = self.config
        num_in = act.shape[-1]
        nc = c.num_intermediate_channel
        per_row = c.orientation == 'per_row'

        scale, ln_bias = LayerNormParams(num_in, name='norm')()
        # left/right projections, their gates, and the final gate all read
        # the post-LN activations: one (B, L, L, C) read feeding one matmul
        # instead of five (the pair track is the HBM-bandwidth hot spot).
        branches = [
            LinearParams(nc, num_in, init='linear', name='left_proj')(),
            LinearParams(nc, num_in, init='linear', name='right_proj')(),
        ]
        if c.gating:
            branches += [
                LinearParams(nc, num_in, init='gate', name='left_gate')(),
                LinearParams(nc, num_in, init='gate', name='right_gate')(),
                LinearParams(num_in, num_in, init='gate',
                             name='final_gate')(),
            ]
        fscale, fbias = LayerNormParams(nc, name='final_norm')()
        wout, bout = LinearParams(num_in, nc, init='final',
                                  name='proj_out')()

        inp = tuple(getattr(c, 'inp_kernels', ()) or ())
        if (residual and c.gating and act.ndim == 4 and not inp
                and jax.default_backend() == 'tpu' and use_fused_trimult()):
            from abx_tpu.ops.registry import use_trimult_c_major
            from abx_tpu.ops.tri_mult import tri_mult_post, tri_mult_pre
            from abx_tpu.ops.triangle import triangle_multiply_c_major
            w = jnp.concatenate([k for k, _ in branches], axis=-1)
            wb = jnp.concatenate([b for _, b in branches])
            if use_trimult_c_major() and not use_pallas_triangle():
                # Channel-major data path: no XLA transpose copies around
                # the contraction GEMM (ops/registry.use_trimult_c_major).
                left, right, fg = tri_mult_pre(act, scale, ln_bias, w, wb,
                                               mask, c_major=True)
                out = triangle_multiply_c_major(left, right,
                                                per_row=per_row)
                return tri_mult_post(out, fscale, fbias, wout, bout, fg,
                                     act, y_c_major=True)
            from abx_tpu.ops.registry import use_trimult_gatefold
            if use_trimult_gatefold():
                # Gate-fold path: the fgate never crosses HBM — post
                # recomputes it from the residual with the pre LN params
                # (ops/registry.use_trimult_gatefold).
                from abx_tpu.ops.tri_mult import tri_mult_post_gatefold
                w4 = jnp.concatenate([k for k, _ in branches[:4]], axis=-1)
                wb4 = jnp.concatenate([b for _, b in branches[:4]])
                wg, wgb = branches[4]
                left, right = tri_mult_pre(act, scale, ln_bias, w4, wb4,
                                           mask, emit_fgate=False)
                out = triangle_multiply(left, right, per_row=per_row,
                                        use_pallas=use_pallas_triangle())
                return tri_mult_post_gatefold(out, fscale, fbias, wout,
                                              bout, scale, ln_bias, wg,
                                              wgb, act)
            left, right, fg = tri_mult_pre(act, scale, ln_bias, w, wb, mask)
            out = triangle_multiply(left, right, per_row=per_row,
                                    use_pallas=use_pallas_triangle())
            return tri_mult_post(out, fscale, fbias, wout, bout, fg, act)

        pair_mask = (mask[:, :, None, None]
                     * mask[:, None, :, None]).astype(self.dtype)
        x = layer_norm(act, scale, ln_bias, dtype=self.dtype)
        if c.gating:
            left, right, lg, rg, fg = fused_dense(x, branches, self.dtype)
        else:
            left, right = fused_dense(x, branches, self.dtype)
        if inp:
            # Reference order: proj -> inception conv -> mask -> gate
            # (seqformer.py:448-488; mask and gate are elementwise, so
            # gating after conv here is equivalent).
            left = _sdwi_pair(left, inp, c.num_head, per_row, 'inp_left')
            right = _sdwi_pair(right, inp, c.num_head, per_row, 'inp_right')
        if c.gating:
            left = left * nn.sigmoid(lg)
            right = right * nn.sigmoid(rg)
        left = left * pair_mask
        right = right * pair_mask

        out = triangle_multiply(left, right, per_row=per_row,
                                use_pallas=use_pallas_triangle())

        out = layer_norm(out, fscale, fbias, dtype=self.dtype)
        out = (jnp.dot(out.astype(self.dtype), wout.astype(self.dtype))
               + bout.astype(self.dtype))
        if c.gating:
            out = out * nn.sigmoid(fg)
        return act + out if residual else out


class TriangleAttention(nn.Module):
    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pair_act, seq_mask, deterministic: bool = True,
                 residual: bool = False):
        """`residual=True` folds the +input into the fused attention
        epilogue (gate -> proj -> +res in one VMEM pass at inference)."""
        from abx_tpu.ops.registry import (use_fused_tri_attention,
                                          use_tri_attn_ln_fold)
        c = self.config
        inp = tuple(getattr(c, 'inp_kernels', ()) or ())
        fused = (deterministic and use_fused_tri_attention()
                 and not inp and jax.default_backend() == 'tpu')
        if (fused and residual and c.gating and pair_act.ndim == 4
                and use_tri_attn_ln_fold()):
            # LN-fold fast path (both orientations): the input LayerNorm
            # and the sigmoid output gate run INSIDE the packed kernel on
            # the raw (oriented) tensor, so the normalised 127 MB tensor
            # never exists in HBM; the attention bias comes from the
            # pair-bias kernel in (B, H, L, L) layout directly.
            from abx_tpu.models.modules import LayerNormParams
            from abx_tpu.ops.pair_bias import pair_bias_proj
            x_in = pair_act
            if c.orientation == 'per_column':
                x_in = jnp.swapaxes(pair_act, 1, 2)
            scale, ln_bias = LayerNormParams(pair_act.shape[-1],
                                             name='norm')()
            wp, _ = LinearParams(c.num_head, pair_act.shape[-1],
                                 init='linear', use_bias=False,
                                 name='proj_pair')()
            bias = pair_bias_proj(x_in, scale, ln_bias, wp,
                                  transpose_out=True)   # (B, H, L, L)
            out = GatedAttention(
                key_dim=pair_act.shape[-1], value_dim=pair_act.shape[-1],
                output_dim=pair_act.shape[-1], num_head=c.num_head,
                gating=c.gating, dtype=self.dtype, name='attn')(
                x_in, k_data=x_in, bias=bias, k_mask=seq_mask[:, None],
                fused=True, residual=x_in, ln=(scale, ln_bias))
            if c.orientation == 'per_column':
                out = jnp.swapaxes(out, 1, 2)
            return out
        res_in = None
        if c.orientation == 'per_column':
            pair_act = jnp.swapaxes(pair_act, 1, 2)
        if residual:
            # Residual in THIS orientation: the elementwise add commutes
            # with the axis swap undone below.
            res_in = pair_act
        pair_act = LayerNorm(dtype=self.dtype, name='norm')(pair_act)
        bias_llh = Linear(c.num_head, init='linear', use_bias=False,
                          dtype=self.dtype, name='proj_pair')(pair_act)
        # Fused kernel only on TPU inference (no custom VJP; einsum path
        # remains the differentiable fallback).  Allowlist the backend: the
        # kernel is Mosaic (pallas-TPU) code and would fail to lower on
        # GPU/CPU backends.
        out = GatedAttention(
            key_dim=pair_act.shape[-1], value_dim=pair_act.shape[-1],
            output_dim=pair_act.shape[-1], num_head=c.num_head,
            gating=c.gating, inp_kernels=inp, dtype=self.dtype,
            name='attn')(
            pair_act, k_data=pair_act, bias_llh=bias_llh,
            k_mask=seq_mask[:, None], fused=fused, residual=res_in)
        if c.orientation == 'per_column':
            out = jnp.swapaxes(out, 1, 2)
        return out


class SeqformerIteration(nn.Module):
    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, seq_act, pair_act, seq_mask, deterministic=True):
        c = self.config

        def dropout_fn(value, cfg):
            if deterministic or cfg.dropout_rate == 0.0:
                return value
            broadcast_dim = None
            if cfg.shared_dropout:
                broadcast_dim = 1 if cfg.orientation == 'per_row' else 2
            return shared_dropout(value, cfg.dropout_rate, deterministic,
                                  self.make_rng('dropout'), broadcast_dim)

        seq_attn = SeqAttentionWithPairBias(c.seq_attention_with_pair_bias,
                                            dtype=self.dtype,
                                            name='seq_attn')
        if deterministic:
            # Residual folds into the packed-attention epilogue.
            seq_act = seq_attn(seq_act, pair_act, seq_mask,
                               deterministic=True, residual=True)
        else:
            seq_act = seq_act + dropout_fn(
                seq_attn(seq_act, pair_act, seq_mask, deterministic=False),
                c.seq_attention_with_pair_bias)
        seq_act = seq_act + Transition(c.seq_transition, dtype=self.dtype,
                                       name='seq_transition')(seq_act)
        pair_act = pair_act + OuterProductMean(
            c.outer_product_mean, pair_act.shape[-1], dtype=self.dtype,
            name='outer_product_mean')(seq_act, seq_mask)
        # Inference folds the residual add into the fused tri-mult post
        # kernel; training keeps the delta form for shared dropout.
        tri_out = TriangleMultiplication(
            c.triangle_multiplication_outgoing, dtype=self.dtype,
            name='tri_mul_out')
        tri_in = TriangleMultiplication(
            c.triangle_multiplication_incoming, dtype=self.dtype,
            name='tri_mul_in')
        if deterministic:
            pair_act = tri_out(pair_act, seq_mask, residual=True)
            pair_act = tri_in(pair_act, seq_mask, residual=True)
        else:
            pair_act = pair_act + dropout_fn(
                tri_out(pair_act, seq_mask),
                c.triangle_multiplication_outgoing)
            pair_act = pair_act + dropout_fn(
                tri_in(pair_act, seq_mask),
                c.triangle_multiplication_incoming)
        attn_start = TriangleAttention(c.triangle_attention_starting_node,
                                       dtype=self.dtype,
                                       name='tri_attn_start')
        attn_end = TriangleAttention(c.triangle_attention_ending_node,
                                     dtype=self.dtype, name='tri_attn_end')
        if deterministic:
            pair_act = attn_start(pair_act, seq_mask, residual=True)
            pair_act = attn_end(pair_act, seq_mask, residual=True)
        else:
            pair_act = pair_act + dropout_fn(
                attn_start(pair_act, seq_mask, deterministic=False),
                c.triangle_attention_starting_node)
            pair_act = pair_act + dropout_fn(
                attn_end(pair_act, seq_mask, deterministic=False),
                c.triangle_attention_ending_node)
        pair_act = Transition(c.pair_transition, dtype=self.dtype,
                              name='pair_transition')(
            pair_act, residual=True, deterministic=deterministic)
        return seq_act, pair_act


class Seqformer(nn.Module):
    config: Any  # embeddings_and_seqformer config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, seq_act, pair_act, mask, deterministic=True):
        for i in range(self.config.seqformer_num_block):
            block = SeqformerIteration(self.config.seqformer,
                                       dtype=self.dtype, name=f'block_{i}')
            seq_act, pair_act = block(seq_act, pair_act, mask,
                                      deterministic=deterministic)
        return seq_act, pair_act


class TimestepEmbedder(nn.Module):
    """Concatenate sinusoidal t embeddings to both tracks (Embedder)."""
    index_embed_size: int
    dtype: Any = jnp.float32

    def __call__(self, seq_act, pair_act, t):
        b, l = seq_act.shape[:2]
        t_embed = get_timestep_embedding(t, self.index_embed_size)
        t_embed = t_embed.astype(self.dtype)
        seq_t = jnp.tile(t_embed[:, None, :], (1, l, 1))
        pair_t = jnp.concatenate([
            jnp.tile(t_embed[:, None, None, :], (1, l, l, 1)),
            jnp.tile(t_embed[:, None, None, :], (1, l, l, 1)),
        ], axis=-1)
        seq_out = jnp.concatenate([seq_act, seq_t], axis=-1)
        pair_out = jnp.concatenate([pair_act, pair_t], axis=-1)
        return seq_out, pair_out


class EmbeddingAndSeqformer(nn.Module):
    """Input embedding + trunk (reference seqformer.py:123-226).

    The antibody block occupies positions [0, antibody_len) and the antigen
    block [antibody_len, L); both are statically sized (config.data).

    setup()-style so `static_embeddings` can be invoked standalone: every
    embedding term that depends only on trajectory-invariant inputs (fixed
    coordinates/sequence, residue indices, chain ids) is computed there —
    the sampler hoists it OUT of the 100-step scan entirely, and within one
    forward it is shared across the recycle passes.  The reference
    recomputes all of it 3x per diffusion step (encoder.py:123-269,
    seqformer.py:170-226).
    """
    config: Any          # embeddings_and_seqformer config
    antibody_len: int    # static split point
    dtype: Any = jnp.float32

    def setup(self):
        c = self.config
        num_token = rc.restype_num + 3
        self.proj_aa_type = TokenEmbedding(num_token, c.seq_channel,
                                           padding_idx=rc.unk_restype_index,
                                           dtype=self.dtype)
        self.proj_rel_pos = TokenEmbedding(c.max_relative_feature * 2 + 2,
                                           c.pair_channel, dtype=self.dtype)
        if c.esm.enabled:
            self.esm_embed_weights = self.param(
                'esm_embed_weights', nn.initializers.zeros,
                (c.esm.num_layers + 1,))
            self.esm_norm = LayerNorm(dtype=self.dtype)
            self.proj_esm_embed = MLP((c.seq_channel, c.seq_channel),
                                      ('linear', 'linear'), dtype=self.dtype)
        self.aa_proj_norm = LayerNorm(dtype=self.dtype)
        self.aa_proj = MLP((c.seq_channel, c.seq_channel),
                           ('linear', 'linear'), dtype=self.dtype)
        self.encode_residue_emb = ResidueEmbedding(c.seq_channel,
                                                   dtype=self.dtype)
        self.encode_pair_emb = PairEmbedding(
            c.pair_channel,
            dgram_num_bins=c.prev_pos.num_bins,
            dgram_min_bin=c.prev_pos.min_bin,
            dgram_max_bin=c.prev_pos.max_bin,
            dtype=self.dtype)
        pair_full = c.pair_channel + 2 * c.index_embed_size
        if c.recycle_features:
            self.prev_seq_norm = LayerNorm(dtype=self.dtype)
            # Params-only declaration (identical tree to LayerNorm) so the
            # fused recycle kernel can consume scale/bias directly.
            from abx_tpu.models.modules import LayerNormParams
            self.prev_pair_norm_p = LayerNormParams(pair_full,
                                                    name='prev_pair_norm')
        if c.recycle_pos:
            self.proj_prev_pos_p = TokenEmbeddingParams(
                c.prev_pos.num_bins, pair_full, name='proj_prev_pos')
        self.seqformer = Seqformer(c, dtype=self.dtype)

    def _rel_pos_ids(self, pos):
        c = self.config
        offset = pos[:, None, :] - pos[:, :, None]
        return (jnp.clip(offset + c.max_relative_feature, 0,
                         2 * c.max_relative_feature) + 1).astype(jnp.int32)

    def esm_layer_weights(self):
        """Learned softmax weights over ESM layer representations — exposed
        so callers that hoist the ESM forward (Sampler's opt-in
        esm_reuse_recycles) can compute the weighted embedding outside the
        trunk and feed it back via `batch['esm_weighted']`."""
        return nn.softmax(self.esm_embed_weights)

    def static_embeddings(self, batch):
        """Trajectory-invariant embedding terms.

        Depends on `seq_t` ONLY at fixed positions (ResidueEmbedding /
        PairEmbedding mask their outputs to fixed residues/pairs, and both
        the reverse step and the recycling seq_0 leave fixed positions
        untouched — heads.py:62-65), so the result is constant over the
        diffusion trajectory and across recycle passes.
        """
        residx = batch['residx']
        ab = slice(0, self.antibody_len)
        ag = slice(self.antibody_len, None)
        b = residx.shape[0]

        # Antigen track: clean tokens through an extra MLP.
        ag_tokens = batch['seq'][:, ag].astype(jnp.int32)
        ag_embed = self.proj_aa_type(ag_tokens)
        ag_embed = self.aa_proj_norm(ag_embed)
        ag_seq_act = self.aa_proj(ag_embed)

        ab_pair_act = self.proj_rel_pos(self._rel_pos_ids(residx[:, ab]))
        ag_pair_act = self.proj_rel_pos(self._rel_pos_ids(residx[:, ag]))

        static_seq = jnp.concatenate(
            [jnp.zeros((b, self.antibody_len, ag_seq_act.shape[-1]),
                       ag_seq_act.dtype), ag_seq_act], axis=1)
        static_seq = static_seq + self.encode_residue_emb(batch)
        static_pair = pair_concat(ab_pair_act, ag_pair_act)
        static_pair = static_pair + self.encode_pair_emb(batch)
        return {'static_seq': static_seq, 'static_pair': static_pair}

    def __call__(self, batch, esm_embedding=None, esm_fn=None,
                 deterministic=True, static_acts=None):
        c = self.config

        seq_t = batch['seq_t'].astype(jnp.int32)
        mask = batch['mask']
        ab = slice(0, self.antibody_len)

        if static_acts is None:
            static_acts = self.static_embeddings(batch)

        # Antibody track: noisy tokens.
        ab_seq_act = self.proj_aa_type(seq_t[:, ab])

        if c.esm.enabled:
            layer_weights = nn.softmax(self.esm_embed_weights)
            if 'esm_weighted' in batch:
                # Pre-weighted (B, L_ab, D) embedding computed by the caller
                # (Sampler esm_reuse_recycles: ONE ESM pass per diffusion
                # step, shared across the recycle passes instead of the
                # reference's per-pass recomputation, abx.py:89-102).
                # Output-changing vs the reference — opt-in only.  Cast as
                # the esm_fn path does so a single-pass (num_recycle=0)
                # forward is bitwise identical either way.
                esm_act = batch['esm_weighted'].astype(self.dtype)
            elif esm_fn is not None:
                # Incremental weighted sum inside the ESM layer loop — the
                # (B, L, D, num_layers+1) stack is never materialised
                # (reference encoder.py:72-105 + seqformer.py:186 recompute
                # ESM and reduce the full stack every trunk pass).
                esm_act = esm_fn(
                    seq_t[:, ab], batch['heavy_len'], batch['light_len'],
                    layer_weights).astype(self.dtype)
            else:
                assert esm_embedding is not None, \
                    'esm.enabled requires esm_fn or a precomputed embedding'
                esm_act = jnp.einsum('blcn,n->blc',
                                     esm_embedding.astype(jnp.float32),
                                     layer_weights).astype(self.dtype)
            esm_act = self.esm_norm(esm_act)
            esm_act = self.proj_esm_embed(esm_act)
            ab_seq_act = ab_seq_act + esm_act

        b, l = seq_t.shape
        seq_act = jnp.concatenate(
            [ab_seq_act, jnp.zeros((b, l - self.antibody_len,
                                    ab_seq_act.shape[-1]),
                                   ab_seq_act.dtype)], axis=1)
        seq_act = seq_act + static_acts['static_seq']
        pair_act = static_acts['static_pair']

        t_embed = get_timestep_embedding(
            batch['t'], c.index_embed_size).astype(self.dtype)
        seq_act = jnp.concatenate(
            [seq_act, jnp.tile(t_embed[:, None, :], (1, l, 1))], axis=-1)
        if c.recycle_features and 'prev_seq' in batch:
            seq_act = seq_act + self.prev_seq_norm(batch['prev_seq'])

        from abx_tpu.models.modules import layer_norm
        from abx_tpu.ops.registry import use_fused_recycle_embed
        fused_recycle = (
            c.recycle_features and c.recycle_pos and deterministic
            and 'prev_pair' in batch and 'prev_pos' in batch
            and pair_act.ndim == 4 and jax.default_backend() == 'tpu'
            and use_fused_recycle_embed())
        if fused_recycle:
            # One VMEM pass assembles the full pair input (concat + LN +
            # dgram embed + adds) — see ops/recycle_embed.py.
            from abx_tpu.ops.recycle_embed import recycle_embed
            scale, ln_bias = self.prev_pair_norm_p()
            table = self.proj_prev_pos_p()
            pair_act = recycle_embed(
                pair_act, jnp.concatenate([t_embed, t_embed], axis=-1),
                batch['prev_pair'], scale, ln_bias, table,
                batch['prev_pos'].astype(jnp.int32))
        else:
            pair_t = jnp.tile(t_embed[:, None, None, :], (1, l, l, 1))
            pair_act = jnp.concatenate(
                [pair_act, pair_t, pair_t], axis=-1)
            if c.recycle_features and 'prev_pair' in batch:
                scale, ln_bias = self.prev_pair_norm_p()
                pair_act = pair_act + layer_norm(
                    batch['prev_pair'], scale, ln_bias, dtype=self.dtype)
            if c.recycle_pos and 'prev_pos' in batch:
                table = self.proj_prev_pos_p()
                pair_act = pair_act + jnp.take(
                    table, batch['prev_pos'].astype(jnp.int32),
                    axis=0).astype(self.dtype)

        seq_act, pair_act = self.seqformer(seq_act, pair_act, mask,
                                           deterministic=deterministic)
        return seq_act, pair_act
