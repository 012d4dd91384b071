"""ESM2 protein language model in flax (TPU-native port).

The reference conditions the score network on frozen ESM2-t36-3B embeddings
(/root/reference/abx/model/encoder.py:21-121), re-tokenising the noisy
antibody sequence AS A STRING on every trunk call and batching through the
fair-esm torch model.  This port:

  * implements the ESM2 encoder (pre-LN transformer, rotary attention,
    token-dropout embedding scale) as flax modules, bf16-friendly;
  * replaces the string round-trip with pure integer retokenisation — the
    aatype -> ESM-token map is a 21-entry gather, and the
    [cls ‖ heavy ‖ G-linker(48) ‖ light ‖ eos] assembly is index arithmetic
    on static shapes, so ESM runs INSIDE the jitted diffusion step;
  * returns the (B, L_ab, D, num_layers+1) stacked per-layer representations
    the trunk's learned layer-weighting consumes.

Weight conversion from the fair-esm checkpoint lives in
abx_tpu/utils/torch_convert.py (`convert_esm2_ckpt`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from abx_tpu.common import residue_constants as rc

# ESM alphabet (fair-esm standard): ids of the special / aa tokens.
ESM_CLS, ESM_PAD, ESM_EOS, ESM_UNK, ESM_MASK = 0, 1, 2, 3, 32
_ESM_AA_ORDER = 'LAGVSERTIDPKQNFYMHWC'  # ids 4..23
ESM_TOKEN_OF_AA = {aa: i + 4 for i, aa in enumerate(_ESM_AA_ORDER)}
ESM_TOKEN_OF_AA['X'] = 24
ESM_GLY = ESM_TOKEN_OF_AA['G']

# Our aatype (residue_constants order, X=20) -> ESM token id.
AATYPE_TO_ESM = np.array(
    [ESM_TOKEN_OF_AA[a] for a in rc.restypes_with_x], dtype=np.int32)


@dataclasses.dataclass(frozen=True)
class ESM2Config:
    num_layers: int = 36
    embed_dim: int = 2560
    attention_heads: int = 40
    alphabet_size: int = 33
    token_dropout: bool = True

    @staticmethod
    def t36_3B() -> 'ESM2Config':
        return ESM2Config(36, 2560, 40)

    @staticmethod
    def t33_650M() -> 'ESM2Config':
        return ESM2Config(33, 1280, 20)

    @staticmethod
    def t12_35M() -> 'ESM2Config':
        return ESM2Config(12, 480, 20)

    @staticmethod
    def tiny() -> 'ESM2Config':
        return ESM2Config(2, 64, 4)


# fair-esm ESM2 release head counts by embed_dim: every size uses 20 heads
# except 3B/15B (40).  `embed_dim // 64` would miscount t30_150M (640->20),
# t12_35M (480->20) and t6_8M (320->20).
_ESM2_HEADS_BY_DIM = {5120: 40, 2560: 40, 1280: 20, 640: 20, 480: 20,
                      320: 20}


def esm2_num_heads(embed_dim: int, override: Optional[int] = None) -> int:
    """Attention head count for a released ESM2 size (or explicit override)."""
    if override:
        return int(override)
    return _ESM2_HEADS_BY_DIM.get(int(embed_dim),
                                  max(1, int(embed_dim) // 64))


def _rotary_sincos(seq_len: int, dim: int, dtype=jnp.float32):
    """ESM-style rotary tables: freqs duplicated (not interleaved)."""
    inv_freq = 1.0 / (10000 ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    t = np.arange(seq_len, dtype=np.float64)
    freqs = np.einsum('i,j->ij', t, inv_freq)
    emb = np.concatenate([freqs, freqs], axis=-1)
    return (jnp.asarray(np.cos(emb), dtype=dtype),
            jnp.asarray(np.sin(emb), dtype=dtype))


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _apply_rotary(x, cos, sin):
    # x: (B, L, H, Dh) heads-minor; cos/sin: (L, Dh).
    return (x * cos[None, :, None] + _rotate_half(x) * sin[None, :, None])


class _DenseParams(nn.Module):
    """fair-esm-compatible Dense params without the matmul (for fusion)."""
    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        return (self.param('kernel', nn.initializers.lecun_normal(),
                           (self.in_features, self.features)),
                self.param('bias', nn.initializers.zeros, (self.features,)))


def _esm_flash_attention(q, k, v, padding_mask):
    """Stock Pallas TPU flash attention with padding via segment ids.

    The XLA einsum path materialises f32 logits (B, 40, L, L) per layer —
    ~60 MB/layer at B=4, streamed 36 times per ESM pass, 3 passes per
    diffusion step.  Pad tokens get segment id 0 (valid tokens 1), which
    reproduces the additive -inf key mask for every valid query; outputs at
    pad positions are garbage and are zeroed downstream
    (extract_antibody_reprs).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)
    b, h, l, d = q.shape
    lp = -(-l // 128) * 128
    pad4 = [(0, 0), (0, 0), (0, lp - l), (0, 0)]
    q, k, v = (jnp.pad(t, pad4) for t in (q, k, v))
    seg = jnp.pad(1 - padding_mask.astype(jnp.int32),
                  [(0, 0), (0, lp - l)])
    bs = BlockSizes(block_q=128, block_k_major=128, block_k=128, block_b=1)
    out = flash_attention(q, k, v,
                          segment_ids=SegmentIds(q=seg, kv=seg),
                          causal=False, sm_scale=1.0, block_sizes=bs)
    return out[:, :, :l]


class ESMSelfAttention(nn.Module):
    config: ESM2Config
    dtype: Any = jnp.float32
    # Tensor-parallel axis name when running inside shard_map with
    # Megatron-sharded params (parallel/esm_tp.py): q/k/v kernels are
    # column-sharded so this device holds h/tp heads, out_proj is
    # row-sharded and psum'd here.  None = single-device semantics.
    tp_axis: Optional[str] = None
    tp_size: int = 1

    @nn.compact
    def __call__(self, x, padding_mask):
        from abx_tpu.ops.registry import use_flash_esm
        c = self.config
        d = c.embed_dim
        h = c.attention_heads
        dh = d // h
        b, l, _ = x.shape

        # q/k/v read the same input: one matmul (param tree unchanged).
        from abx_tpu.models.modules import fused_dense
        d_loc = d // self.tp_size  # local projection width under tp
        branches = [_DenseParams(d_loc, d, name='q_proj')(),
                    _DenseParams(d_loc, d, name='k_proj')(),
                    _DenseParams(d_loc, d, name='v_proj')()]
        q, k, v = fused_dense(x, branches, self.dtype)
        # Heads stay MINOR ((B, L, H, Dh) — a free reshape); the einsums
        # below carry the head axis so XLA folds the head split into the
        # dot_generals instead of emitting (B, L, D) transpose copies
        # (profiled 1.9 ms/step of {1,2,0} copies x 3 tensors x 36 layers
        # with the head-major form).
        # Head count comes from the ACTUAL projection width: h under
        # single-device params, h/tp under tensor-parallel shards.
        h_loc = q.shape[-1] // dh
        q = q.reshape(b, l, h_loc, dh)
        k = k.reshape(b, l, h_loc, dh)
        v = v.reshape(b, l, h_loc, dh)

        cos, sin = _rotary_sincos(l, dh, dtype=self.dtype)
        q = _apply_rotary(q, cos, sin)
        k = _apply_rotary(k, cos, sin)

        q = q * (dh ** -0.5)
        from abx_tpu.ops.registry import use_fused_esm_attention
        if use_fused_esm_attention() and jax.default_backend() == 'tpu':
            # Per-(batch, head) VMEM-resident attention — the f32 logits
            # tensor never touches HBM (ops/esm_attention.py).
            from abx_tpu.ops.esm_attention import esm_attention
            hm = lambda t: t.transpose(0, 2, 1, 3)
            out = esm_attention(hm(q), hm(k), hm(v), padding_mask)
            out = out.transpose(0, 2, 1, 3)
        elif use_flash_esm() and jax.default_backend() == 'tpu':
            hm = lambda t: t.transpose(0, 2, 1, 3)
            out = _esm_flash_attention(hm(q), hm(k), hm(v), padding_mask)
            out = out.transpose(0, 2, 1, 3)
        else:
            logits = jnp.einsum('bqhd,bkhd->bhqk', q, k)
            neg = (padding_mask[:, None, None, :]).astype(jnp.float32) * -1e9
            weights = jax.nn.softmax(logits.astype(jnp.float32) + neg,
                                     axis=-1)
            out = jnp.einsum('bhqk,bkhd->bqhd', weights.astype(self.dtype), v)
        out = out.reshape(b, l, h_loc * dh)
        # out_proj as an explicit matmul (param tree identical to nn.Dense)
        # so the bias is added AFTER the tensor-parallel reduction — under
        # tp the row-sharded partial products sum over tp_axis and the
        # replicated bias must be applied exactly once.
        ow, ob = _DenseParams(d, d_loc, name='out_proj')()
        y = jnp.dot(out, ow.astype(self.dtype))
        if self.tp_axis is not None:
            y = jax.lax.psum(y, self.tp_axis)
        return y + ob.astype(self.dtype)


def _esm_layer_norm(x, name, mod):
    """One-pass f32 LayerNorm for the ESM layer (param tree identical to
    nn.LayerNorm under `name`).

    nn.LayerNorm's two-pass moments cost a second full read of the
    (B, L, 2560) tensor per LN — profiled ~11.5 ms/step across
    2 LNs × 36 layers × 3 passes.  `modules.layer_norm` fuses both
    reductions into one read (E[x²]−E[x]²) and matches fair-esm's torch
    eps=1e-5 (flax defaults to 1e-6).  ESM is frozen — inference-only —
    so the training two-pass opt-out never applies here.
    """
    del mod  # context only — the compact scope attaches the params
    from abx_tpu.models.modules import LayerNormParams, layer_norm
    scale, bias = LayerNormParams(x.shape[-1], name=name)()
    return layer_norm(x, scale, bias, eps=1e-5, dtype=jnp.float32)


class ESMLayer(nn.Module):
    config: ESM2Config
    dtype: Any = jnp.float32
    tp_axis: Optional[str] = None  # see ESMSelfAttention
    tp_size: int = 1

    @nn.compact
    def __call__(self, x, padding_mask):
        c = self.config
        residual = x
        y = _esm_layer_norm(x, 'self_attn_layer_norm', self)
        y = ESMSelfAttention(c, dtype=self.dtype, tp_axis=self.tp_axis,
                             tp_size=self.tp_size, name='self_attn')(
            y.astype(self.dtype), padding_mask)
        x = residual + y

        residual = x
        y = _esm_layer_norm(x, 'final_layer_norm', self)
        # fc1 is column-sharded under tp (the explicit dot computes with
        # whatever kernel shard it is given — each device holds (4D)/tp
        # FFN lanes).  Param tree identical to nn.Dense under 'fc1'.
        from abx_tpu.ops import registry as _reg
        w1, b1 = _DenseParams(4 * c.embed_dim // self.tp_size,
                              c.embed_dim, name='fc1')()
        w1 = w1.astype(self.dtype)
        if _reg.esm_fc1_slice_barrier():
            w1 = jax.lax.optimization_barrier(w1)
        y = jnp.dot(y.astype(self.dtype), w1) + b1.astype(self.dtype)
        if _reg.esm_gelu_barrier():
            y = jax.lax.optimization_barrier(y)
        y = jax.nn.gelu(y, approximate=False)
        # Barrier: keep the exact-GELU erf OUT of the fc2 dot's operand
        # prologue.  Fused, the VPU erf on the (B, L, 4D) tensor stalls
        # the MXU mid-dot (profiled fc2 at 0.54 vs 0.33 ms ideal); split,
        # GELU streams once through HBM (~0.06 ms) and the dot runs
        # clean.
        y = jax.lax.optimization_barrier(y)
        # fc2 row-sharded under tp: explicit matmul -> psum -> bias once
        # (param tree identical to nn.Dense; see ESMSelfAttention.out_proj).
        w2, b2 = _DenseParams(c.embed_dim, 4 * c.embed_dim // self.tp_size,
                              name='fc2')()
        y = jnp.dot(y, w2.astype(self.dtype))
        if self.tp_axis is not None:
            y = jax.lax.psum(y, self.tp_axis)
        y = y + b2.astype(self.dtype)
        return residual + y


class ESMLayerStep(nn.Module):
    """`lax.scan`-able wrapper over ESMLayer.

    Carry is (x, acc): the running hidden state plus the f32 accumulator of
    the learned layer-weighted sum — accumulating INSIDE the layer loop means
    the (B, L, D, num_layers+1) representation stack (~0.5 GB at 3B scale,
    B=4) is never materialised (VERDICT round-1 item 1a; the trunk's consumer
    is seqformer.py `esm_embed_weights`).
    """
    config: ESM2Config
    dtype: Any = jnp.float32
    collect: bool = False
    tp_axis: Optional[str] = None
    tp_size: int = 1

    @nn.compact
    def __call__(self, carry, padding_mask, w):
        x, acc = carry
        x = ESMLayer(self.config, dtype=self.dtype, tp_axis=self.tp_axis,
                     tp_size=self.tp_size, name='layer')(x, padding_mask)
        # Barrier: keep the f32 accumulator update OUT of the fc2 dot's
        # fusion.  Fused, XLA emits the fc2 matmul with an f32 multi-output
        # epilogue that halves its MXU rate (profiled 0.70 vs 0.33 ms
        # ideal, ~40 ms/step at 36 layers x 3 passes); split, the dot runs
        # at bf16 full rate and the acc update is a cheap elementwise pass.
        xb = jax.lax.optimization_barrier(x)
        acc = acc + w * xb.astype(jnp.float32)
        return (x, acc), (x if self.collect else None)


class ESM2(nn.Module):
    """ESM2 encoder.

    `scan_layers=True` runs the (identical) transformer layers as one
    `nn.scan` with parameters stacked on a leading layer axis — ~36x smaller
    HLO and compile time at 3B scale (remote TPU compiles here cost minutes;
    see utils/compile_cache.py).  Use `stack_layer_params` to convert
    per-layer parameter trees (converter output / unrolled init) to the
    scanned layout.
    """
    config: ESM2Config
    dtype: Any = jnp.float32
    scan_layers: bool = False
    # Megatron tensor-parallel axis when applied inside shard_map with
    # column/row-sharded layer params (parallel/esm_tp.py); activations
    # stay replicated over this axis, so everything outside the layers
    # (embedding, final LN, layer-weighted sum) is unchanged.
    tp_axis: Optional[str] = None
    tp_size: int = 1

    @nn.compact
    def __call__(self, tokens, final_only: bool = False, layer_weights=None):
        """tokens (B, L) int -> per-layer representations.

        Output depends on the mode:
          * `layer_weights` (num_layers+1,) given — the learned-softmax
            weighted sum over per-layer representations, computed
            incrementally in f32: (B, L, D).  The full stack is never built.
          * `final_only=True` — post-LN last-layer representation (B, L, D).
          * otherwise — the full (B, L, D, num_layers+1) stack (small
            models / parity tests only; at 3B scale this is ~0.5 GB).
        """
        c = self.config
        padding_mask = (tokens == ESM_PAD)

        embed = nn.Embed(c.alphabet_size, c.embed_dim,
                         dtype=self.dtype, name='embed_tokens')
        x = embed(tokens)
        if c.token_dropout:
            # Inference-time token-dropout rescale (fair-esm esm2.py):
            # zero <mask> embeddings and scale by the train-time mask ratio.
            x = jnp.where((tokens == ESM_MASK)[..., None], 0.0, x)
            mask_ratio_train = 0.15 * 0.8
            src_lengths = jnp.sum(~padding_mask, axis=-1)
            mask_ratio_obs = (jnp.sum(tokens == ESM_MASK, axis=-1)
                              / jnp.maximum(src_lengths, 1))
            x = x * ((1 - mask_ratio_train)
                     / (1 - mask_ratio_obs))[:, None, None].astype(x.dtype)
        x = jnp.where(padding_mask[..., None], 0.0, x)

        x0 = x  # embedding-layer representation (repr index 0)

        weighted = layer_weights is not None
        if weighted:
            layer_weights = jnp.asarray(layer_weights, jnp.float32)
            acc = layer_weights[0] * x.astype(jnp.float32)
            ws = layer_weights[1:]
        else:
            acc = jnp.zeros_like(x, dtype=jnp.float32)
            ws = jnp.zeros((c.num_layers,), jnp.float32)

        collect = (not weighted) and (not final_only)
        per_layer = None  # (num_layers, B, L, D) when collected
        if self.scan_layers:
            scan = nn.scan(
                ESMLayerStep,
                variable_axes={'params': 0},
                split_rngs={'params': True},
                in_axes=(nn.broadcast, 0),
                length=c.num_layers)
            (x, acc), ys = scan(c, dtype=self.dtype, collect=collect,
                                tp_axis=self.tp_axis, tp_size=self.tp_size,
                                name='layers')((x, acc), padding_mask, ws)
            if collect:
                per_layer = ys
        else:
            reprs = [] if collect else None
            for i in range(c.num_layers):
                x = ESMLayer(c, dtype=self.dtype, tp_axis=self.tp_axis,
                             tp_size=self.tp_size,
                             name=f'layer_{i}')(x, padding_mask)
                if weighted:
                    acc = acc + ws[i] * x.astype(jnp.float32)
                if reprs is not None:
                    reprs.append(x)
            if collect:
                per_layer = jnp.stack(reprs, axis=0)

        # Final LN is applied to the LAST layer's representation only
        # (fair-esm: hidden_representations[num_layers] = x after LN).
        final = nn.LayerNorm(
            dtype=jnp.float32, name='emb_layer_norm_after')(x).astype(
            self.dtype)
        if weighted:
            # acc already holds w[-1] * x_raw; swap in the post-LN final.
            return acc + layer_weights[-1] * (final.astype(jnp.float32)
                                              - x.astype(jnp.float32))
        if final_only:
            return final  # (B, L, D)
        # Full stack: [embedding, layers 1..n-1, post-LN final].
        stack = jnp.moveaxis(per_layer, 0, -1)  # (B, L, D, num_layers)
        return jnp.concatenate(
            [x0[..., None], stack[..., :-1], final[..., None]], axis=-1)


class AntibodyESM:
    """Callable wrapper: noisy antibody aatype -> ESM embeddings.

    Integer retokenisation + static-shape [cls‖heavy‖linker‖light‖eos]
    assembly (replaces encoder.py:37-121's per-step string round trip).

    Params are an explicit call argument (NOT closed over): under `jax.jit`
    a closed-over 3B-parameter tree would be baked into the executable as
    constants; passing it through keeps it a runtime input.
    """

    def __init__(self, config: ESM2Config, antibody_len: int,
                 sep_pad_num: int = 48, dtype=jnp.bfloat16,
                 scan_layers: bool = True):
        self.config = config
        self.antibody_len = antibody_len
        self.sep_pad_num = sep_pad_num
        self.module = ESM2(config, dtype=dtype, scan_layers=scan_layers)

    def esm_seq_len(self) -> int:
        return self.antibody_len + self.sep_pad_num + 2

    def __call__(self, params, ab_aatype, heavy_len, light_len,
                 layer_weights=None):
        """
        Args:
            params: ESM2 flax params (scan layout when scan_layers).
            ab_aatype: (B, L_ab) aatype ints (heavy ‖ light ‖ pad).
            heavy_len / light_len: (B,) ints.
            layer_weights: optional (num_layers+1,) learned softmax weights.
        Returns: (B, L_ab, D) when layer_weights given, else
            (B, L_ab, D, num_layers+1).
        """
        tokens = build_esm_tokens(ab_aatype, heavy_len, light_len,
                                  self.sep_pad_num)
        reprs = self.module.apply(params, tokens,
                                  layer_weights=layer_weights)
        return extract_antibody_reprs(reprs, heavy_len, light_len,
                                      self.antibody_len, self.sep_pad_num)


def stack_layer_params(params, num_layers: Optional[int] = None):
    """Per-layer `layer_{i}` params -> `nn.scan` layout.

    Converts the converter/unrolled-init tree
    ``{'params': {'layer_0': ..., 'layer_1': ..., ...}}`` into the
    ``{'params': {'layers': {'layer': <stacked leading axis>}}}`` layout
    that `ESM2(scan_layers=True)` expects.  Non-layer entries pass through.
    """
    src = dict(params['params'])
    if num_layers is None:
        num_layers = sum(1 for k in src if k.startswith('layer_'))
    layers = [src.pop(f'layer_{i}') for i in range(num_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *layers)
    src['layers'] = {'layer': stacked}
    out = dict(params)
    out['params'] = src
    return out


def build_esm_tokens(ab_aatype, heavy_len, light_len, sep_pad_num=48):
    """(B, L_ab) aatype -> (B, L_ab+sep+2) ESM tokens, linker-joined."""
    b, l_ab = ab_aatype.shape
    l_esm = l_ab + sep_pad_num + 2
    aa_esm = jnp.asarray(AATYPE_TO_ESM)[
        jnp.clip(ab_aatype, 0, rc.restype_num)]

    pos = jnp.arange(l_esm)[None, :]                    # (1, L_esm)
    h = heavy_len[:, None]
    lt = light_len[:, None]

    in_heavy = (pos >= 1) & (pos <= h)
    in_linker = (pos > h) & (pos <= h + sep_pad_num)
    in_light = (pos > h + sep_pad_num) & (pos <= h + sep_pad_num + lt)
    is_eos = pos == (h + sep_pad_num + lt + 1)
    is_cls = pos == 0

    # Antibody gather index: heavy at p-1, light at p-1-sep.
    ab_idx = jnp.where(in_light, pos - 1 - sep_pad_num, pos - 1)
    ab_idx = jnp.clip(ab_idx, 0, l_ab - 1)
    ab_tok = jnp.take_along_axis(aa_esm, ab_idx, axis=1)

    tokens = jnp.full((b, l_esm), ESM_PAD, dtype=jnp.int32)
    tokens = jnp.where(is_cls, ESM_CLS, tokens)
    tokens = jnp.where(in_heavy | in_light, ab_tok, tokens)
    tokens = jnp.where(in_linker, ESM_GLY, tokens)
    tokens = jnp.where(is_eos, ESM_EOS, tokens)
    return tokens


def extract_antibody_reprs(reprs, heavy_len, light_len, l_ab, sep_pad_num=48):
    """Inverse of build_esm_tokens: gather antibody positions, drop linker.

    Works on both the full stack (B, L_esm, D, N) and the pre-weighted
    (B, L_esm, D) representation.
    """
    ab_pos = jnp.arange(l_ab)[None, :]
    h = heavy_len[:, None]
    esm_pos = jnp.where(ab_pos < h, ab_pos + 1, ab_pos + 1 + sep_pad_num)
    esm_pos = jnp.clip(esm_pos, 0, reprs.shape[1] - 1)
    trailing = reprs.ndim - 2
    idx = esm_pos.reshape(esm_pos.shape + (1,) * trailing)
    out = jnp.take_along_axis(reprs, idx.astype(jnp.int32), axis=1)
    # Zero padded antibody positions.
    valid = (ab_pos < h + light_len[:, None])
    valid = valid.reshape(valid.shape + (1,) * trailing)
    return jnp.where(valid, out, 0.0)


class ESM2LMHead(nn.Module):
    """Masked-LM head (fair-esm RobertaLMHead): dense -> gelu -> LN -> tied
    output projection + bias."""
    config: ESM2Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, embed_weight=None):
        c = self.config
        x = nn.Dense(c.embed_dim, dtype=self.dtype, name='dense')(features)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.LayerNorm(dtype=jnp.float32, name='layer_norm')(
            x.astype(jnp.float32)).astype(self.dtype)
        if embed_weight is None:
            embed_weight = self.param(
                'weight', nn.initializers.normal(0.02),
                (c.alphabet_size, c.embed_dim))
        bias = self.param('bias', nn.initializers.zeros, (c.alphabet_size,))
        return x @ embed_weight.T.astype(self.dtype) + bias
