"""Device mesh + sharding for embarrassingly-parallel sampling.

The reference's only parallelism is one-process-per-GPU with file-level
round-robin work splitting (SURVEY.md §2.8; inference.py:389-392,
dataset.py:75-88) — no collectives.  The TPU-native equivalent:

  * a 1-D `jax.sharding.Mesh` over all local/global devices ('data' axis),
  * the (complex x num_samples) batch dimension sharded over 'data',
  * model parameters fully replicated,
  * host-side dataset sharding by `jax.process_index()` over DCN.

Because sampling is independent per (complex, sample), XLA inserts no
collectives in the hot loop — scaling is linear in chips by construction.
Training (abx_tpu/train) reuses the same mesh with a `psum` gradient
reduction over 'data'.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = 'data') -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = 'data') -> NamedSharding:
    """First-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = 'data'):
    """Device-put a host batch with its leading axis sharded over the mesh.

    Leading dims must be divisible by the mesh size; pad_batch_to_devices
    handles the remainder.
    """
    n = mesh.devices.size
    sharding = batch_sharding(mesh, axis_name)
    rep = replicated(mesh)

    def put(x):
        if x.shape[0] % n == 0:
            return jax.device_put(x, sharding)
        return jax.device_put(x, rep)  # undivisible batch: replicate

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def pad_batch_to_devices(batch, num_devices: int):
    """Pad the leading axis to a multiple of num_devices (masked work)."""
    def pad(x):
        b = x.shape[0]
        rem = (-b) % num_devices
        if rem == 0:
            return x, b
        pad_width = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), pad_width), b
    sizes = set()
    out = {}
    for k, v in batch.items():
        padded, b = pad(v)
        out[k] = padded
        sizes.add(b)
    assert len(sizes) == 1
    return out, sizes.pop()
