"""Vendored miniature PyTorch ESM2 with fair-esm module/key naming.

Written from the published ESM2 architecture (Lin et al. 2022; fair-esm
`esm/esm2.py` + `esm/multihead_attention.py` + `esm/rotary_embedding.py`
semantics) so the abx_tpu ESM2 converter + flax numerics can be golden-
tested WITHOUT the fair-esm package or real 3B weights (neither exists in
this environment; the reference consumes them at
/root/reference/abx/model/encoder.py:21-34).

Faithful semantics covered:
  * token-dropout embedding rescale ((1-0.12)/(1-observed mask ratio),
    <mask> embeddings zeroed);
  * padding positions zeroed after embedding;
  * pre-LN transformer layers, exact (erf) GELU;
  * rotary position embeddings with the DUPLICATED (not interleaved)
    frequency layout, applied after q-scaling;
  * key-padding mask -> -inf logits, softmax in f32;
  * final `emb_layer_norm_after` applied to the last layer only;
  * state-dict keys exactly as fair-esm saves them, including the
    non-parameter `rot_emb.inv_freq` buffers and a contact-head regression,
    so converter coverage accounting is exercised.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

MASK_IDX = 32
PAD_IDX = 1


def rotate_half(x):
    x1, x2 = x.chunk(2, dim=-1)
    return torch.cat((-x2, x1), dim=-1)


class RotaryEmbedding(nn.Module):
    def __init__(self, dim):
        super().__init__()
        inv_freq = 1.0 / (10000 ** (torch.arange(0, dim, 2).float() / dim))
        self.register_buffer('inv_freq', inv_freq)

    def forward(self, q, k):
        # q, k: (B*H, L, Dh)
        seq_len = q.shape[1]
        t = torch.arange(seq_len, device=q.device).type_as(self.inv_freq)
        freqs = torch.einsum('i,j->ij', t, self.inv_freq)
        emb = torch.cat((freqs, freqs), dim=-1)[None, :, :]
        cos, sin = emb.cos(), emb.sin()
        return (q * cos + rotate_half(q) * sin,
                k * cos + rotate_half(k) * sin)


class MultiheadAttention(nn.Module):
    def __init__(self, embed_dim, num_heads):
        super().__init__()
        self.embed_dim = embed_dim
        self.num_heads = num_heads
        self.head_dim = embed_dim // num_heads
        self.scaling = self.head_dim ** -0.5
        self.q_proj = nn.Linear(embed_dim, embed_dim)
        self.k_proj = nn.Linear(embed_dim, embed_dim)
        self.v_proj = nn.Linear(embed_dim, embed_dim)
        self.out_proj = nn.Linear(embed_dim, embed_dim)
        self.rot_emb = RotaryEmbedding(self.head_dim)

    def forward(self, x, key_padding_mask):
        # x: (B, L, D); key_padding_mask: (B, L) bool, True = pad.
        b, l, d = x.shape
        h, dh = self.num_heads, self.head_dim
        q = self.q_proj(x) * self.scaling
        k = self.k_proj(x)
        v = self.v_proj(x)

        def to_heads(t):
            return t.view(b, l, h, dh).transpose(1, 2).reshape(b * h, l, dh)

        q, k, v = to_heads(q), to_heads(k), to_heads(v)
        q, k = self.rot_emb(q, k)

        attn = torch.bmm(q, k.transpose(1, 2))  # (B*H, L, L)
        attn = attn.view(b, h, l, l)
        attn = attn.masked_fill(
            key_padding_mask[:, None, None, :], float('-inf'))
        attn = F.softmax(attn.float(), dim=-1).type_as(x)
        out = torch.bmm(attn.view(b * h, l, l), v)
        out = out.view(b, h, l, dh).transpose(1, 2).reshape(b, l, d)
        return self.out_proj(out)


class TransformerLayer(nn.Module):
    def __init__(self, embed_dim, num_heads):
        super().__init__()
        self.self_attn = MultiheadAttention(embed_dim, num_heads)
        self.self_attn_layer_norm = nn.LayerNorm(embed_dim)
        self.fc1 = nn.Linear(embed_dim, 4 * embed_dim)
        self.fc2 = nn.Linear(4 * embed_dim, embed_dim)
        self.final_layer_norm = nn.LayerNorm(embed_dim)

    def forward(self, x, key_padding_mask):
        residual = x
        x = self.self_attn_layer_norm(x)
        x = self.self_attn(x, key_padding_mask)
        x = residual + x

        residual = x
        x = self.final_layer_norm(x)
        x = self.fc2(F.gelu(self.fc1(x)))
        return residual + x


class ContactHead(nn.Module):
    """Placeholder contact-prediction regression (parameters exist in real
    checkpoints but are not part of the encoder)."""

    def __init__(self, in_features):
        super().__init__()
        self.regression = nn.Linear(in_features, 1)


class MiniESM2(nn.Module):
    def __init__(self, num_layers, embed_dim, attention_heads,
                 alphabet_size=33, token_dropout=True):
        super().__init__()
        self.num_layers = num_layers
        self.token_dropout = token_dropout
        self.embed_tokens = nn.Embedding(alphabet_size, embed_dim,
                                         padding_idx=PAD_IDX)
        self.layers = nn.ModuleList(
            TransformerLayer(embed_dim, attention_heads)
            for _ in range(num_layers))
        self.emb_layer_norm_after = nn.LayerNorm(embed_dim)
        self.contact_head = ContactHead(num_layers * attention_heads)

    def forward(self, tokens):
        padding_mask = tokens.eq(PAD_IDX)
        x = self.embed_tokens(tokens)

        if self.token_dropout:
            x = x.masked_fill((tokens == MASK_IDX).unsqueeze(-1), 0.0)
            mask_ratio_train = 0.15 * 0.8
            src_lengths = (~padding_mask).sum(-1)
            mask_ratio_observed = (tokens == MASK_IDX).sum(-1).float() \
                / src_lengths
            x = x * (1 - mask_ratio_train) \
                / (1 - mask_ratio_observed)[:, None, None]

        x = x * (1 - padding_mask.unsqueeze(-1).type_as(x))

        hidden = {0: x}
        for i, layer in enumerate(self.layers):
            x = layer(x, padding_mask)
            hidden[i + 1] = x
        x = self.emb_layer_norm_after(x)
        hidden[self.num_layers] = x
        return hidden
