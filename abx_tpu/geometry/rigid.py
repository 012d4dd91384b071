"""Rigid transforms as a typed pytree.

One canonical representation — `Rigid(rot: (..., 3, 3), trans: (..., 3))` —
replaces both the (rots, trans)-tuple convention of the reference model code
(/root/reference/abx/model/r3.py) and the 7-vector (quat ‖ trans) convention
of the diffusers (/root/reference/diffuser/full_diffuser.py:12-26).
Converters to/from tensor7 and 4x4 are provided for interop and I/O.

All ops are shape-polymorphic over leading batch axes and safe under
`jit`/`vmap`/`scan`.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax.numpy as jnp
from jax import lax

from abx_tpu.geometry import quat as quat_ops

# 3x3 geometry must not be demoted to low matmul precision (the TPU default
# for f32 einsums); these contractions are tiny, so full precision is free.
_einsum = functools.partial(jnp.einsum, precision=lax.Precision.HIGHEST)


class Rigid(NamedTuple):
    rot: jnp.ndarray    # (..., 3, 3)
    trans: jnp.ndarray  # (..., 3)

    # -- constructors -------------------------------------------------------
    @staticmethod
    def identity(shape=(), dtype=jnp.float32) -> 'Rigid':
        rot = jnp.broadcast_to(jnp.eye(3, dtype=dtype), tuple(shape) + (3, 3))
        return Rigid(rot, jnp.zeros(tuple(shape) + (3,), dtype=dtype))

    @staticmethod
    def from_tensor7(t7: jnp.ndarray) -> 'Rigid':
        return Rigid(quat_ops.quat_to_rot(t7[..., :4]), t7[..., 4:])

    @staticmethod
    def from_tensor4x4(m: jnp.ndarray) -> 'Rigid':
        return Rigid(m[..., :3, :3], m[..., :3, 3])

    @staticmethod
    def from_quat_trans(q: jnp.ndarray, trans: jnp.ndarray) -> 'Rigid':
        return Rigid(quat_ops.quat_to_rot(q), trans)

    # -- converters ---------------------------------------------------------
    def to_tensor7(self) -> jnp.ndarray:
        return jnp.concatenate(
            [quat_ops.rot_to_quat(self.rot), self.trans], axis=-1)

    def to_tensor4x4(self) -> jnp.ndarray:
        shape = self.rot.shape[:-2]
        m = jnp.zeros(shape + (4, 4), dtype=self.rot.dtype)
        m = m.at[..., :3, :3].set(self.rot)
        m = m.at[..., :3, 3].set(self.trans)
        return m.at[..., 3, 3].set(1.0)

    # -- algebra ------------------------------------------------------------
    def apply(self, points: jnp.ndarray) -> jnp.ndarray:
        """Apply to points; supports an optional extra point axis.

        points (..., 3) with the same batch shape as `trans`, or
        (..., M, 3) for M points per rigid.
        """
        if points.ndim == self.trans.ndim:
            return self.trans + _einsum(
                '...rd,...d->...r', self.rot, points)
        return self.trans[..., None, :] + _einsum(
            '...rd,...md->...mr', self.rot, points)

    def invert(self) -> 'Rigid':
        inv_rot = jnp.swapaxes(self.rot, -1, -2)
        inv_trans = -_einsum('...rd,...d->...r', inv_rot, self.trans)
        return Rigid(inv_rot, inv_trans)

    def compose(self, other: 'Rigid') -> 'Rigid':
        """self ∘ other (apply `other` first in the local frame)."""
        rot = _einsum('...rd,...dm->...rm', self.rot, other.rot)
        trans = self.trans + _einsum(
            '...rd,...d->...r', self.rot, other.trans)
        return Rigid(rot, trans)

    def compose_rot(self, rot: jnp.ndarray) -> 'Rigid':
        return Rigid(
            _einsum('...rd,...dm->...rm', self.rot, rot), self.trans)

    def scale_trans(self, factor) -> 'Rigid':
        return Rigid(self.rot, self.trans * factor)

    def map(self, fn: Callable[[jnp.ndarray], jnp.ndarray]) -> 'Rigid':
        return Rigid(fn(self.rot), fn(self.trans))

    def __getitem__(self, idx) -> 'Rigid':
        """Index the *batch* shape (the trailing 3x3 / 3 axes are preserved)."""
        if not isinstance(idx, tuple):
            idx = (idx,)
        return Rigid(self.rot[idx + (slice(None), slice(None))],
                     self.trans[idx + (slice(None),)])

    @property
    def shape(self):
        return self.trans.shape[:-1]


def rigids_from_3_points(point_on_neg_x_axis, origin, point_on_xy_plane,
                         eps: float = 1e-8) -> Rigid:
    """Gram–Schmidt frame construction (reference r3.py:89-109)."""
    e0 = _robust_normalize(origin - point_on_neg_x_axis, eps)
    e1u = point_on_xy_plane - origin
    e1 = e1u - jnp.sum(e1u * e0, axis=-1, keepdims=True) * e0
    e1 = _robust_normalize(e1, eps)
    e2 = jnp.cross(e0, e1)
    rot = jnp.stack([e0, e1, e2], axis=-1)
    return Rigid(rot, origin)


def _robust_normalize(v, eps: float = 1e-8):
    return v / jnp.sqrt(jnp.sum(jnp.square(v), axis=-1, keepdims=True) + eps)
