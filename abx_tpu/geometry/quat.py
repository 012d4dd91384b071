"""Quaternion algebra, branchless and differentiable (JAX).

Scalar-first (w, x, y, z) Hamilton convention, matching the reference's
constant-tensor formulation (/root/reference/abx/model/quat_affine.py:10-51)
but written as closed-form arithmetic so XLA fuses it into surrounding code.
Small-angle branches are expressed with `jnp.where` on both value and operand
(to keep NaNs out of gradients).
"""

from __future__ import annotations

import jax.numpy as jnp

from abx_tpu.utils.tensor import l2_normalize


def identity_quat(shape=(), dtype=jnp.float32):
    q = jnp.zeros(tuple(shape) + (4,), dtype=dtype)
    return q.at[..., 0].set(1.0)


def quat_multiply(q1, q2):
    """Hamilton product q1 * q2; both (..., 4) scalar-first."""
    w1, x1, y1, z1 = jnp.split(q1, 4, axis=-1)
    w2, x2, y2, z2 = jnp.split(q2, 4, axis=-1)
    return jnp.concatenate([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def quat_multiply_by_vec(q, v):
    """q * (0, v) — used for the IPA affine update."""
    w1, x1, y1, z1 = jnp.split(q, 4, axis=-1)
    x2, y2, z2 = jnp.split(v, 3, axis=-1)
    return jnp.concatenate([
        -x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2,
    ], axis=-1)


def quat_precompose_vec(q, vec_update):
    """AF2-style affine update: normalize(q + q * (0, vec))."""
    return l2_normalize(q + quat_multiply_by_vec(q, vec_update), axis=-1)


def invert_quat(q):
    """Conjugate divided by norm (matches reference invert_quat)."""
    conj = q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)
    return conj / jnp.sqrt(jnp.sum(jnp.square(q), axis=-1, keepdims=True))


def quat_to_rot(q):
    """Unit quaternion (..., 4) -> rotation matrix (..., 3, 3).

    Matches the reference contraction (quat_affine.py:60-67): no input
    normalization is applied, so non-unit inputs scale the result.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = 2 * w * x, 2 * w * y, 2 * w * z
    xy, xz, yz = 2 * x * y, 2 * x * z, 2 * y * z
    m = jnp.stack([
        ww + xx - yy - zz, xy - wz, xz + wy,
        xy + wz, ww - xx + yy - zz, yz - wx,
        xz - wy, yz + wx, ww - xx - yy + zz,
    ], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def rot_to_quat(m):
    """Rotation matrix (..., 3, 3) -> unit quaternion, branchless.

    Numerically-robust 4-candidate method (pytorch3d-style, mirroring
    quat_affine.py:181-231) with the candidate chosen by `argmax` via one-hot
    select so it traces to pure gathers/where on TPU.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    def _sqrt_pos(x):
        return jnp.sqrt(jnp.maximum(x, 0.0))

    q_abs = jnp.stack([
        _sqrt_pos(1.0 + m00 + m11 + m22),
        _sqrt_pos(1.0 + m00 - m11 - m22),
        _sqrt_pos(1.0 - m00 + m11 - m22),
        _sqrt_pos(1.0 - m00 - m11 + m22),
    ], axis=-1)

    cand = jnp.stack([
        jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], -1),
        jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], -1),
        jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], -1),
        jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], -1),
    ], axis=-2)  # (..., 4 candidates, 4)
    cand = cand / (2.0 * jnp.maximum(q_abs[..., None], 0.1))

    best = jnp.argmax(q_abs, axis=-1)
    sel = jnp.take_along_axis(
        cand, jnp.broadcast_to(best[..., None, None], best.shape + (1, 4)),
        axis=-2)
    return jnp.squeeze(sel, axis=-2)


def safe_norm(x, axis=-1, keepdims=True, tiny=1e-24):
    """L2 norm with a zero (not NaN) gradient at x == 0.

    The double-where pattern: the sqrt argument is clamped away from zero on
    the branch that is discarded, so no NaN enters the backward pass.
    """
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=keepdims)
    is_zero = sq < tiny
    safe_sq = jnp.where(is_zero, 1.0, sq)
    return jnp.where(is_zero, 0.0, jnp.sqrt(safe_sq))


def _sin_half_over_angle(angles):
    """sin(angle/2)/angle with a 2nd-order Taylor branch near zero."""
    small = jnp.abs(angles) < 1e-6
    safe = jnp.where(small, jnp.ones_like(angles), angles)
    general = jnp.sin(safe / 2.0) / safe
    taylor = 0.5 - angles * angles / 48.0
    return jnp.where(small, taylor, general)


def quat_to_rotvec(q):
    """Quaternion -> axis-angle vector, matching quat_affine.py:113-131."""
    flip = (q[..., :1] < 0).astype(q.dtype)
    q = (-q) * flip + (1.0 - flip) * q
    norms = safe_norm(q[..., 1:])
    half_angles = jnp.arctan2(norms, q[..., :1])
    angles = 2.0 * half_angles
    return q[..., 1:] / _sin_half_over_angle(angles)


def rotvec_to_quat(rotvec):
    """Axis-angle vector -> quaternion, matching quat_affine.py:133-150."""
    angles = safe_norm(rotvec)
    return jnp.concatenate(
        [jnp.cos(angles * 0.5), rotvec * _sin_half_over_angle(angles)],
        axis=-1)


def rotvec_to_rot(rotvec):
    return quat_to_rot(rotvec_to_quat(rotvec))


def rot_to_rotvec(m):
    return quat_to_rotvec(rot_to_quat(m))
