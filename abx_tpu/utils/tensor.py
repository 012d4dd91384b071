"""Small tensor utilities shared across the framework (pure JAX)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def batched_gather(data, indices, batch_dims: int = 0):
    """Gather `data` along the first non-batch axis with per-batch indices.

    Equivalent surface to the reference's `batched_select`
    (/root/reference/abx/model/utils.py:19-54): leading `batch_dims` axes of
    `data` and `indices` are shared; gathering happens on axis `batch_dims`.
    """
    if batch_dims == 0:
        return jnp.take(data, indices, axis=0)
    return jax.vmap(lambda d, i: batched_gather(d, i, batch_dims - 1))(
        data, indices)


def l2_normalize(x, axis: int = -1, eps: float = 1e-12):
    return x / jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True) + eps)


def masked_mean(mask, value, axis=None, eps: float = 1e-10):
    return jnp.sum(mask * value, axis=axis) / (jnp.sum(mask, axis=axis) + eps)


def squared_difference(x, y):
    return jnp.square(x - y)
