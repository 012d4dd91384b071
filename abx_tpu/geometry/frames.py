"""Backbone/side-chain frame & torsion feature math (pure JAX).

Functional equivalents of the reference's batch feature math
(/root/reference/abx/common/geometry.py and /root/reference/abx/model/atom.py),
operating on `Rigid` pytrees and built entirely from static-shape gathers so
the whole pipeline can run inside `jit`/`vmap`/`scan` on TPU.

Shapes use B = batch, L = residues.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from abx_tpu.common import residue_constants as rc
from abx_tpu.geometry.rigid import Rigid, rigids_from_3_points
from abx_tpu.utils.tensor import batched_gather


def atom37_to_frames(aatype, atom37_pos, atom37_mask) -> Dict[str, jnp.ndarray]:
    """Ground-truth rigid-group frames from atom37 coordinates.

    Parity surface: reference geometry.py:9-63 (8 groups, backbone flip,
    ambiguity rotations).

    Args:
        aatype: (B, L) int.
        atom37_pos: (B, L, 37, 3).
        atom37_mask: (B, L, 37).
    Returns dict with `rigidgroups_gt_frames` as a Rigid of shape (B, L, 8).
    """
    base_idx = batched_gather(
        jnp.asarray(rc.restype_rigidgroup_base_atom37_idx), aatype)  # (B,L,8,3)
    base_pos = batched_gather(atom37_pos, base_idx, batch_dims=2)  # (B,L,8,3,3)

    frames = rigids_from_3_points(
        base_pos[..., 0, :], base_pos[..., 1, :], base_pos[..., 2, :])

    group_exists = batched_gather(
        jnp.asarray(rc.restype_rigidgroup_mask), aatype)  # (B, L, 8)
    atoms_exist = batched_gather(atom37_mask, base_idx, batch_dims=2)
    gt_exists = jnp.logical_and(
        jnp.all(atoms_exist > 0, axis=-1), group_exists > 0)

    # Backbone frame convention flip (x -> -x, z -> -z), reference :41-44.
    flip = np.tile(np.eye(3, dtype=np.float32), (8, 1, 1))
    flip[0, 0, 0] = -1.0
    flip[0, 2, 2] = -1.0
    frames = frames.compose_rot(jnp.asarray(flip))

    is_ambiguous = batched_gather(
        jnp.asarray(rc.restype_rigidgroup_is_ambiguous), aatype)
    ambiguity_rot = batched_gather(
        jnp.asarray(rc.restype_rigidgroup_rots), aatype)
    alt_frames = frames.compose_rot(ambiguity_rot)

    return {
        'rigidgroups_gt_frames': frames,
        'rigidgroups_gt_exists': gt_exists.astype(jnp.float32),
        'rigidgroups_group_exists': group_exists,
        'rigidgroups_group_is_ambiguous': is_ambiguous,
        'rigidgroups_alt_gt_frames': alt_frames,
    }


def atom37_to_torsion_angles(aatype, atom37_pos, atom37_mask):
    """7 torsion angles (pre-omega, phi, psi, chi1-4) as sin/cos.

    Parity surface: reference geometry.py:115-211, including the psi sign
    flip and the pi-periodic mirror angles.
    """
    num_batch, num_res = aatype.shape

    pad_pos = jnp.pad(atom37_pos[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
    pad_mask = jnp.pad(atom37_mask[:, :-1], ((0, 0), (1, 0), (0, 0)))

    pre_omega_atom_pos = jnp.concatenate(
        [pad_pos[:, :, 1:3], atom37_pos[:, :, 0:2]], axis=-2)
    phi_atom_pos = jnp.concatenate(
        [pad_pos[:, :, 2:3], atom37_pos[:, :, 0:3]], axis=-2)
    psi_atom_pos = jnp.concatenate(
        [atom37_pos[:, :, 0:3], atom37_pos[:, :, 4:5]], axis=-2)

    pre_omega_mask = jnp.logical_and(
        jnp.all(pad_mask[:, :, 1:3] > 0, axis=-1),
        jnp.all(atom37_mask[:, :, 0:2] > 0, axis=-1))
    phi_mask = jnp.logical_and(
        pad_mask[:, :, 2] > 0, jnp.all(atom37_mask[:, :, 0:3] > 0, axis=-1))
    psi_mask = jnp.logical_and(
        jnp.all(atom37_mask[:, :, 0:3] > 0, axis=-1), atom37_mask[:, :, 4] > 0)

    chi_atom_idx = batched_gather(
        jnp.asarray(rc.chi_angles_atom_indices), aatype)  # (B, L, 4, 4)
    chis_atom_pos = batched_gather(atom37_pos, chi_atom_idx, batch_dims=2)
    chis_mask = batched_gather(jnp.asarray(rc.chi_angles_mask), aatype)
    chi_atoms_mask = batched_gather(atom37_mask, chi_atom_idx, batch_dims=2)
    chis_mask = chis_mask * jnp.all(chi_atoms_mask > 0, axis=-1)

    torsions_atom_pos = jnp.concatenate([
        pre_omega_atom_pos[:, :, None],
        phi_atom_pos[:, :, None],
        psi_atom_pos[:, :, None],
        chis_atom_pos,
    ], axis=2)  # (B, L, 7, 4, 3)

    torsion_angles_mask = jnp.concatenate([
        pre_omega_mask[:, :, None],
        phi_mask[:, :, None],
        psi_mask[:, :, None],
        chis_mask,
    ], axis=2).astype(jnp.float32)

    torsion_frames = rigids_from_3_points(
        torsions_atom_pos[..., 1, :],
        torsions_atom_pos[..., 2, :],
        torsions_atom_pos[..., 0, :])
    fourth_atom_rel = torsion_frames.invert().apply(
        torsions_atom_pos[..., 3, :])

    sin_cos = jnp.stack(
        [fourth_atom_rel[..., 2], fourth_atom_rel[..., 1]], axis=-1)
    sin_cos = sin_cos / jnp.sqrt(
        jnp.sum(jnp.square(sin_cos), axis=-1, keepdims=True) + 1e-8)
    sin_cos = sin_cos * jnp.asarray(
        [1.0, 1.0, -1.0, 1.0, 1.0, 1.0, 1.0])[..., None]

    chi_is_ambiguous = batched_gather(jnp.asarray(rc.chi_pi_periodic), aatype)
    mirror = jnp.concatenate(
        [jnp.ones((num_batch, num_res, 3)), 1.0 - 2.0 * chi_is_ambiguous],
        axis=-1)
    alt_sin_cos = sin_cos * mirror[..., None]

    return {
        'torsion_angles_sin_cos': sin_cos,        # (B, L, 7, 2)
        'alt_torsion_angles_sin_cos': alt_sin_cos,
        'torsion_angles_mask': torsion_angles_mask,
    }


def torsion_angles_to_frames(aatype, backb_to_global: Rigid,
                             torsion_sin_cos) -> Rigid:
    """Compose the 8 rigid-group frames from backbone + torsions.

    Parity surface: reference atom.py:9-58.
    Args:
        aatype: (B, L).
        backb_to_global: Rigid (B, L).
        torsion_sin_cos: (B, L, 7, 2).
    Returns: Rigid (B, L, 8) in global coordinates.
    """
    default_4x4 = batched_gather(
        jnp.asarray(rc.restype_rigid_group_default_frame), aatype)
    default_frames = Rigid.from_tensor4x4(default_4x4)  # (B, L, 8)

    sin_angles = jnp.pad(torsion_sin_cos[..., 0], ((0, 0), (0, 0), (1, 0)))
    cos_angles = jnp.pad(
        torsion_sin_cos[..., 1], ((0, 0), (0, 0), (1, 0)),
        constant_values=1.0)
    zeros = jnp.zeros_like(sin_angles)
    ones = jnp.ones_like(sin_angles)
    # x-axis rotation by each torsion angle.
    all_rots = jnp.stack([
        ones, zeros, zeros,
        zeros, cos_angles, -sin_angles,
        zeros, sin_angles, cos_angles,
    ], axis=-1).reshape(sin_angles.shape + (3, 3))

    all_frames = default_frames.compose_rot(all_rots)  # (B, L, 8)

    # Chain chi frames: chi2..chi4 compose onto their predecessor.
    chi1 = all_frames[..., 4]
    chi2 = chi1.compose(all_frames[..., 5])
    chi3 = chi2.compose(all_frames[..., 6])
    chi4 = chi3.compose(all_frames[..., 7])

    rot = jnp.concatenate([
        all_frames.rot[..., 0:5, :, :], chi2.rot[..., None, :, :],
        chi3.rot[..., None, :, :], chi4.rot[..., None, :, :]], axis=-3)
    trans = jnp.concatenate([
        all_frames.trans[..., 0:5, :], chi2.trans[..., None, :],
        chi3.trans[..., None, :], chi4.trans[..., None, :]], axis=-2)
    all_frames_to_backb = Rigid(rot, trans)

    # Compose with the backbone frame.
    bb = Rigid(backb_to_global.rot[..., None, :, :],
               backb_to_global.trans[..., None, :])
    return bb.compose(all_frames_to_backb)


def frames_to_atom14_pos(aatype, all_frames_to_global: Rigid) -> jnp.ndarray:
    """Idealised atom14 coordinates from global rigid-group frames.

    Parity surface: reference atom.py:60-76.
    """
    group_idx = batched_gather(
        jnp.asarray(rc.restype_atom14_to_rigid_group), aatype)  # (B, L, 14)
    frames = all_frames_to_global.map(
        lambda x: batched_gather(x, group_idx, batch_dims=2))
    lit_positions = batched_gather(
        jnp.asarray(rc.restype_atom14_rigid_group_positions), aatype)
    return frames.apply(lit_positions)


def calpha3_to_frames(calpha_pos, calpha_mask=None):
    """Frames from consecutive C-alpha triplets (reference geometry.py:65-113)."""
    pad = lambda x, before, after: jnp.pad(
        x, ((0, 0), (before, after)) + ((0, 0),) * (x.ndim - 2))
    prev_ca = pad(calpha_pos[:, :-1], 1, 0)
    prev2_ca = pad(calpha_pos[:, :-2], 2, 0)
    next_ca = pad(calpha_pos[:, 1:], 0, 1)
    next2_ca = pad(calpha_pos[:, 2:], 0, 2)

    left = rigids_from_3_points(prev_ca, calpha_pos, prev2_ca)
    right = rigids_from_3_points(next_ca, calpha_pos, next2_ca)

    ret = {
        'left_gt_calpha3_frame_positions': left.invert().apply(next_ca),
        'right_gt_calpha3_frame_positions': right.invert().apply(prev_ca),
    }
    if calpha_mask is not None:
        padm = lambda x, b, a: jnp.pad(x, ((0, 0), (b, a)))
        prev_m = padm(calpha_mask[:, :-1], 1, 0)
        prev2_m = padm(calpha_mask[:, :-2], 2, 0)
        next_m = padm(calpha_mask[:, 1:], 0, 1)
        next2_m = padm(calpha_mask[:, 2:], 0, 2)
        ret['left_gt_calpha3_frame_position_exists'] = (
            prev2_m * prev_m * calpha_mask * next_m) > 0
        ret['right_gt_calpha3_frame_position_exists'] = (
            prev_m * calpha_mask * next_m * next2_m) > 0
    return ret


def pseudo_beta(aatype, atom37_pos, atom37_mask=None):
    """CB position (CA for glycine); reference common_modules.py:85-105."""
    is_gly = jnp.equal(aatype, rc.restype_order['G'])
    ca_idx, cb_idx = rc.atom_order['CA'], rc.atom_order['CB']
    pb = jnp.where(
        is_gly[..., None], atom37_pos[..., ca_idx, :],
        atom37_pos[..., cb_idx, :])
    if atom37_mask is not None:
        pb_mask = jnp.where(
            is_gly, atom37_mask[..., ca_idx], atom37_mask[..., cb_idx])
        return pb, pb_mask
    return pb


def pseudo_beta_virtual(atom_pos):
    """Virtual CB from N/CA/C (reference common_modules.py:62-83).

    Accepts atom14 or atom37 ordering: slots 0/1/2 are N/CA/C in both.
    """
    n = atom_pos[..., 0, :]
    ca = atom_pos[..., 1, :]
    c = atom_pos[..., 2, :]
    b = ca - n
    cvec = c - ca
    a = jnp.cross(b, cvec)
    return -0.58273431 * a + 0.56802827 * b - 0.54067466 * cvec + ca


def dgram_from_positions(positions, num_bins, min_bin, max_bin):
    """Distance-bin indices (int) for pair recycling features."""
    breaks = jnp.linspace(min_bin, max_bin, num_bins - 1)
    sq_breaks = jnp.square(breaks)
    dist2 = jnp.sum(
        jnp.square(positions[..., :, None, :] - positions[..., None, :, :]),
        axis=-1, keepdims=True)
    return jnp.sum((dist2 > sq_breaks).astype(jnp.int32), axis=-1)
