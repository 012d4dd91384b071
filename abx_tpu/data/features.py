"""Declarative, jittable feature pipeline.

Parity surface: /root/reference/abx/model/features.py — the same ordered
transform registry driven by config (config_data_feature.json), but executed
ON DEVICE inside jit: the noising transform (`make_diffuser_features`) takes
an explicit PRNG key, so forward-diffusion noising is part of the compiled
sampler instead of living in a CPU collate function.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from abx_tpu.common import residue_constants as rc
from abx_tpu.geometry import frames as frame_ops
from abx_tpu.utils.tensor import batched_gather

_FEATS_FN: Dict[str, Callable] = {}


def register(fn):
    _FEATS_FN[fn.__name__] = fn
    return fn


@register
def make_restype_atom_constants(batch, is_training=False):
    seq = batch['seq'].astype(jnp.int32)
    batch['atom14_atom_exists'] = batched_gather(
        jnp.asarray(rc.restype_atom14_mask), seq)
    batch['atom14_atom_is_ambiguous'] = batched_gather(
        jnp.asarray(rc.restype_atom14_is_ambiguous), seq)
    if 'residx_atom37_to_atom14' not in batch:
        batch['residx_atom37_to_atom14'] = batched_gather(
            jnp.asarray(rc.restype_atom37_to_atom14), seq)
    if 'atom37_atom_exists' not in batch:
        batch['atom37_atom_exists'] = batched_gather(
            jnp.asarray(rc.restype_atom37_mask), seq)
    return batch


@register
def make_atom14_alt_gt_positions(batch, is_training=False):
    seq = batch['seq'].astype(jnp.int32)
    swap = batched_gather(
        jnp.asarray(rc.restype_ambiguous_atoms_swap_index), seq)
    batch['atom14_alt_gt_positions'] = batched_gather(
        batch['atom14_gt_positions'], swap, batch_dims=2)
    batch['atom14_alt_gt_exists'] = batched_gather(
        batch['atom14_gt_exists'], swap, batch_dims=2)
    return batch


def _ensure_atom37(batch):
    if 'atom37_gt_positions' not in batch:
        batch = make_restype_atom_constants(batch)
        batch['atom37_gt_positions'] = batched_gather(
            batch['atom14_gt_positions'], batch['residx_atom37_to_atom14'],
            batch_dims=2)
        batch['atom37_gt_exists'] = jnp.logical_and(
            batched_gather(batch['atom14_gt_exists'],
                           batch['residx_atom37_to_atom14'],
                           batch_dims=2) > 0,
            batch['atom37_atom_exists'] > 0).astype(jnp.float32)
    return batch


@register
def make_atom37_positions(batch, is_training=False):
    return _ensure_atom37(batch)


@register
def make_pseudo_beta(batch, is_training=False):
    batch = _ensure_atom37(batch)
    pb, pb_mask = frame_ops.pseudo_beta(
        batch['seq'], batch['atom37_gt_positions'], batch['atom37_gt_exists'])
    batch['pseudo_beta'] = pb
    batch['pseudo_beta_mask'] = pb_mask
    return batch


@register
def make_gt_frames(batch, is_training=False):
    batch = _ensure_atom37(batch)
    batch.update(frame_ops.atom37_to_frames(
        batch['seq'].astype(jnp.int32), batch['atom37_gt_positions'],
        batch['atom37_gt_exists']))
    return batch


@register
def make_calpha3_frames(batch, is_training=False):
    batch = _ensure_atom37(batch)
    batch.update(frame_ops.calpha3_to_frames(
        batch['atom37_gt_positions'][:, :, 1],
        batch['atom37_gt_exists'][:, :, 1]))
    return batch


@register
def make_torsion_angles(batch, is_training=False):
    batch = _ensure_atom37(batch)
    batch.update(frame_ops.atom37_to_torsion_angles(
        batch['seq'].astype(jnp.int32), batch['atom37_gt_positions'],
        batch['atom37_gt_exists']))
    return batch


def select_cdrs_mask(anchor_flag, antibody_len, cdr_enums,
                     mask_template, key=None, shrink_limit: int = 1,
                     extend_limit: int = 2) -> jnp.ndarray:
    """Diffused-residue mask between anchor pairs of the chosen CDRs.

    `anchor_flag` (B, L_ab) holds the CDR enum at the two anchor residues
    flanking each CDR (reference features.py:158-167): residues strictly
    between the anchors are diffused.

    Training augmentation (key != None; reference features.py:143-167):
    a random non-empty subset of the selected CDRs is diffused and each
    boundary is jittered by [-shrink_limit, extend_limit].
    """
    b, l_ab = anchor_flag.shape
    n_cdr = len(cdr_enums)
    pos = jnp.arange(l_ab)

    if key is not None:
        # Match the reference's subset law exactly (features.py:147-149):
        # m ~ Uniform{1..K_present}, then a uniform random size-m subset of
        # the CDRs PRESENT in this complex.  (A traced top-m on random
        # scores == random.shuffle + take-m.)
        k_m, k_u, k_jit = jax.random.split(key, 3)
        present = jnp.stack(
            [jnp.any(anchor_flag == enum, axis=-1) for enum in cdr_enums],
            axis=-1)                                    # (B, K) bool
        n_present = jnp.maximum(jnp.sum(present, axis=-1), 1)
        m = (jax.random.uniform(k_m, (b,)) * n_present).astype(jnp.int32) + 1
        scores = jax.random.uniform(k_u, (b, n_cdr))
        scores = jnp.where(present, scores, -1.0)       # absent: never picked
        ranks = jnp.argsort(jnp.argsort(-scores, axis=-1), axis=-1)
        include = (ranks < m[:, None]) & present
        jitter = jax.random.randint(
            k_jit, (b, n_cdr, 2), -shrink_limit, extend_limit + 1)
    else:
        include = jnp.ones((b, n_cdr), dtype=bool)
        jitter = jnp.zeros((b, n_cdr, 2), dtype=jnp.int32)

    diffused = jnp.zeros((b, l_ab), dtype=jnp.int32)
    for idx, enum in enumerate(cdr_enums):
        is_anchor = (anchor_flag == enum)
        any_anchor = jnp.any(is_anchor, axis=-1) & include[:, idx]
        first = jnp.argmax(is_anchor, axis=-1)             # left anchor
        last = l_ab - 1 - jnp.argmax(is_anchor[:, ::-1], axis=-1)
        first = jnp.clip(first - jitter[:, idx, 0], 0, l_ab - 1)
        last = jnp.clip(last + jitter[:, idx, 1], 0, l_ab - 1)
        # Parity quirk: the reference diffuses slice(first+1, last-1)
        # (features.py:166), i.e. the residue at last-1 — the final CDR
        # residue — stays FIXED.  Reproduced as-is for checkpoint parity.
        inside = (pos[None, :] > first[:, None]) & (
            pos[None, :] < last[:, None] - 1)
        diffused = jnp.where(any_anchor[:, None],
                             jnp.maximum(diffused, inside.astype(jnp.int32)),
                             diffused)
    full = jnp.zeros(mask_template.shape, dtype=jnp.int32)
    full = full.at[:, :l_ab].set(diffused)
    return full


@register
def make_static_pair_features(batch, is_training=False):
    """Precompute the coordinate-derived pair-encoder inputs ONCE.

    PairEmbedding's heaviest inputs — the 14x14 interatomic squared
    distances and the pseudo-beta distogram bins — depend only on the fixed
    ground-truth coordinates, yet the reference recomputes them inside every
    trunk pass (3x per diffusion step, ~300x per trajectory;
    encoder.py:247-261).  Hoisting them out of the scanned step trades one
    (B, L, L, 196) resident tensor for the per-pass recompute.
    """
    from abx_tpu.geometry import frames as frame_ops
    coords = batch['atom14_gt_positions']
    coords_mask = batch['atom14_gt_exists']
    n, l = coords.shape[:2]
    dist2 = jnp.sum(jnp.square(
        coords[:, :, None, :, None, :] - coords[:, None, :, None, :, :]),
        axis=-1) / 100.0
    batch['static_pair_dist2'] = dist2.reshape(n, l, l, -1)
    ca = rc.atom_order['CA']
    mask_atoms = coords_mask[..., ca]
    batch['static_pair_atom_mask'] = (
        mask_atoms[:, :, None, None] * mask_atoms[:, None, :, None])
    batch['static_pseudo_beta_fixed'] = frame_ops.pseudo_beta_virtual(coords)
    return batch


@register
def make_diffuser_features(batch, diffuser=None, generate_area='H3',
                           key=None, mode='design', t_value=None,
                           is_training=False):
    """Build fixed/diffused masks + initial noisy state (features.py:130-212).

    Modes: 'train' (forward marginal at uniform t), 'design' (t=1 reference
    sample), 'optimize' (forward marginal at t=t_value).
    """
    assert diffuser is not None and key is not None
    anchor_flag = batch['anchor_flag'].astype(jnp.int32)
    antibody_len = anchor_flag.shape[1]
    b = batch['seq'].shape[0]

    gt_frames = batch['rigidgroups_gt_frames']
    bb = gt_frames[..., 0]
    rigids_0 = bb.to_tensor7()
    seq_0 = batch['seq'].astype(jnp.int32)

    if generate_area == 'cdr':
        cdr_enums = list(rc.cdr_str_to_enum.values())
    else:
        cdr_enums = [rc.cdr_str_to_enum[generate_area]]

    key, k_mask = jax.random.split(key)
    diffused_mask = select_cdrs_mask(
        anchor_flag, antibody_len, cdr_enums, batch['mask'],
        key=k_mask if (is_training and mode == 'train') else None)
    diffused_mask = diffused_mask * batch['mask'].astype(jnp.int32)
    fixed_mask = 1 - diffused_mask

    # Structure-loss mask: diffused region +-1 on the antibody, everything on
    # the antigen (reference features.py:155-169 approximated by dilation).
    d = diffused_mask[:, :antibody_len]
    dilated = jnp.clip(
        d + jnp.roll(d, 1, axis=-1) + jnp.roll(d, -1, axis=-1), 0, 1)
    struc_loss_mask = batch['mask'].astype(jnp.int32)
    struc_loss_mask = struc_loss_mask.at[:, :antibody_len].set(dilated)

    k_t, k_noise = jax.random.split(key)
    if mode == 'train':
        t = jax.random.uniform(k_t, (b,), minval=0.01, maxval=1.0)
        feats = diffuser.forward_marginal(k_noise, rigids_0, seq_0, t,
                                          diffused_mask)
    elif mode == 'design':
        t = jnp.ones((b,))
        feats = diffuser.sample_ref(k_noise, rigids_0.shape[:2],
                                    impute_rigids=rigids_0,
                                    impute_seq=seq_0,
                                    diffuse_mask=diffused_mask)
    elif mode == 'optimize':
        t = jnp.full((b,), t_value)
        feats = diffuser.forward_marginal(k_noise, rigids_0, seq_0, t,
                                          diffused_mask)
    else:
        raise ValueError(mode)

    batch.update(feats)
    batch.update(t=t, struc_loss_mask=struc_loss_mask,
                 fixed_mask=fixed_mask, rigids_0=rigids_0,
                 diffused_mask=diffused_mask)
    return batch


class FeatureBuilder:
    """Ordered transform pipeline, config-as-data (features.py:229-243)."""

    DEFAULT_PIPELINE = [
        ('make_restype_atom_constants', {}),
        ('make_atom14_alt_gt_positions', {}),
        ('make_gt_frames', {}),
        ('make_torsion_angles', {}),
        ('make_pseudo_beta', {}),
        ('make_calpha3_frames', {}),
    ]

    def __init__(self, config: Optional[Sequence] = None,
                 is_training: bool = False):
        self.config = list(config) if config is not None \
            else list(self.DEFAULT_PIPELINE)
        self.is_training = is_training

    def __call__(self, batch: Dict, **extra) -> Dict:
        batch = dict(batch)
        for name, kwargs in self.config:
            fn = _FEATS_FN[name]
            merged = dict(kwargs)
            if name == 'make_diffuser_features':
                merged.update(extra)
            batch = fn(batch, is_training=self.is_training, **merged)
        return batch
