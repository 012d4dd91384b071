"""Checkpoint save/load for abx_tpu params.

Native format: flax msgpack bytes (single file, host-agnostic).  Orbax is
used when available for sharded/async saving during training.  A separate
converter (abx_tpu/utils/torch_convert.py) maps the reference's PyTorch
state dicts onto this parameter tree.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def save_params(path: str, params: Any):
    from flax import serialization
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, 'wb') as f:
        f.write(serialization.to_bytes(params))


def load_params(path: str, target: Optional[Any] = None):
    from flax import serialization
    with open(path, 'rb') as f:
        data = f.read()
    if target is not None:
        return serialization.from_bytes(target, data)
    return serialization.msgpack_restore(data)


def params_size(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
