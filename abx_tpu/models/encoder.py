"""Structural context encoders: per-residue and pairwise embeddings.

Parity surface: /root/reference/abx/model/encoder.py:123-269
(ResidueEmbedding, PairEmbedding).  Fixed (non-diffused) residues provide the
structural conditioning; diffused residues are masked to zero.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from abx_tpu.common import residue_constants as rc
from abx_tpu.geometry import frames as frame_ops
from abx_tpu.models.modules import MLP, Linear, LayerNorm


class TokenEmbedding(nn.Module):
    """Embedding table with an always-zero padding row (padding_idx emul)."""
    num_embeddings: int
    features: int
    padding_idx: int | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        table = self.param(
            'embedding', nn.initializers.normal(stddev=1.0),
            (self.num_embeddings, self.features))
        out = jnp.take(table, tokens, axis=0).astype(self.dtype)
        if self.padding_idx is not None:
            out = jnp.where(
                (tokens == self.padding_idx)[..., None], 0.0, out)
        return out


class TokenEmbeddingParams(nn.Module):
    """Declares a TokenEmbedding table without the gather (for fused
    kernels); param tree identical to `TokenEmbedding` under the same
    name."""
    num_embeddings: int
    features: int

    @nn.compact
    def __call__(self):
        return self.param('embedding', nn.initializers.normal(stddev=1.0),
                          (self.num_embeddings, self.features))


class ResidueEmbedding(nn.Module):
    """Per-residue structural encoder (encoder.py:123-174)."""
    seq_channel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch):
        feat_dim = self.seq_channel
        mask = jnp.logical_and(batch['mask'], batch['fixed_mask'])
        n, l = mask.shape

        aa = batch['seq_t'].astype(jnp.int32)
        aa_feat = TokenEmbedding(rc.restype_num + 3, feat_dim,
                                 dtype=self.dtype, name='aatype_embed')(aa)
        aa_feat = aa_feat * mask[:, :, None]
        cdr_feat = TokenEmbedding(rc.num_ab_regions + 1, feat_dim,
                                  dtype=self.dtype, name='cdr_embed')(
            batch['cdr_def'].astype(jnp.int32))

        coords = batch['atom14_gt_positions'].reshape(n, l, -1)
        torsions = batch['torsion_angles_sin_cos'].reshape(n, l, -1)
        coord_feat = MLP((feat_dim, feat_dim), ('linear', 'linear'),
                         dtype=self.dtype, name='coordinate_embed')(
            jnp.concatenate([coords, torsions], axis=-1))

        feats = jnp.concatenate([
            aa_feat,
            batch['chain_id'][..., None].astype(self.dtype),
            batch['residx'][..., None].astype(self.dtype),
            cdr_feat, coord_feat,
        ], axis=-1)
        out = MLP((feat_dim * 2, feat_dim, feat_dim, feat_dim),
                  ('linear',) * 4, dtype=self.dtype, name='mlp')(feats)
        return out * mask[:, :, None]


class PairEmbedding(nn.Module):
    """Pairwise structural encoder (encoder.py:178-269)."""
    pair_channel: int
    dgram_num_bins: int = 15
    dgram_min_bin: float = 3.375
    dgram_max_bin: float = 21.375
    max_relpos: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch):
        feat_dim = self.pair_channel
        max_num_atoms = 14
        max_aa_types = rc.restype_num + 3

        mask = jnp.logical_and(batch['mask'], batch['fixed_mask'])
        mask_pair = mask[:, :, None] * mask[:, None, :]
        n, l = mask.shape

        aa = batch['seq_t'].astype(jnp.int32)
        chain_ids = batch['chain_id']
        residx = batch['residx']
        coords = batch['atom14_gt_positions']
        coords_mask = batch['atom14_gt_exists']
        mask_atoms = coords_mask[..., rc.atom_order['CA']]

        aa_pair = aa[:, :, None] * max_aa_types + aa[:, None, :]
        feat_aapair = TokenEmbedding(
            max_aa_types * max_aa_types, feat_dim, dtype=self.dtype,
            name='aa_pair_embed')(aa_pair)

        same_chain = (chain_ids[:, :, None] == chain_ids[:, None, :])
        relpos = jnp.clip(residx[:, :, None] - residx[:, None, :],
                          -self.max_relpos, self.max_relpos)
        feat_relpos = TokenEmbedding(
            2 * self.max_relpos + 1, feat_dim, dtype=self.dtype,
            name='relpos_embed')(
            (relpos + self.max_relpos).astype(jnp.int32))
        feat_relpos = feat_relpos * same_chain[..., None]

        # Learned-coefficient Gaussian of all 14x14 interatomic distances.
        # The squared distances + CA pair mask are static over the diffusion
        # trajectory; the sampler precomputes them once
        # (features.make_static_pair_features) and we fall back to computing
        # in place (training / standalone use).
        if 'static_pair_dist2' in batch:
            dist2 = batch['static_pair_dist2']
            mask_atom_pair = batch['static_pair_atom_mask']
        else:
            dist2 = jnp.sum(jnp.square(
                coords[:, :, None, :, None, :]
                - coords[:, None, :, None, :, :]), axis=-1) / 100.0
            dist2 = dist2.reshape(n, l, l, -1)
            mask_atom_pair = (mask_atoms[:, :, None, None]
                              * mask_atoms[:, None, :, None])
        dist_coef_table = self.param(
            'aapair_to_distcoef', nn.initializers.zeros,
            (max_aa_types * max_aa_types, max_num_atoms * max_num_atoms))
        distance_coef = nn.softplus(
            jnp.take(dist_coef_table, aa_pair, axis=0)).astype(self.dtype)
        d_gauss = jnp.exp(-distance_coef * dist2.astype(self.dtype))
        feat_dist = MLP((feat_dim, feat_dim), ('linear', 'linear'),
                        final_activation=True, dtype=self.dtype,
                        name='distance_embed')(d_gauss * mask_atom_pair)

        if 'static_pseudo_beta_fixed' in batch:
            pb = batch['static_pseudo_beta_fixed']
        else:
            pb = frame_ops.pseudo_beta_virtual(coords)
        disto_bins = frame_ops.dgram_from_positions(
            pb, self.dgram_num_bins, self.dgram_min_bin, self.dgram_max_bin)
        feat_dgram = TokenEmbedding(self.dgram_num_bins, feat_dim,
                                    dtype=self.dtype, name='dgram_embed')(
            disto_bins)

        feat_all = jnp.concatenate(
            [feat_aapair, feat_relpos, feat_dist, feat_dgram], axis=-1)
        feat_all = MLP((feat_dim, feat_dim, feat_dim), ('linear',) * 3,
                       dtype=self.dtype, name='out_mlp')(feat_all)
        return feat_all * mask_pair[..., None]
