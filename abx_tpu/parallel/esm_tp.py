"""Tensor-parallel frozen ESM2 over a ('data', 'model') mesh.

The score-network trunk is pure data parallelism (parallel/mesh.py) — it is
~10M params and its batch dimension is embarrassingly parallel.  The frozen
ESM2-3B conditioning is different: 5.3 GB of bf16 params, ~86% of the
flagship workload's HBM footprint and ~90% of its FLOPs (BENCH_r03,
BASELINE.md).  This module shards it Megatron-style over a second mesh
axis, dividing the per-chip ESM weight footprint by the tp degree and
scaling the ESM matmuls across chips:

  * q/k/v and fc1 kernels column-sharded (features axis) — each device
    computes heads/tp attention heads and (4D)/tp FFN lanes;
  * out_proj and fc2 kernels row-sharded (input axis) — partial products
    are reduced with one `jax.lax.psum` each (2 psums/layer over ICI),
    biases replicated and added once after the reduction;
  * embeddings, LayerNorms and all activations replicated over 'model'.

Implemented with `jax.shard_map` (explicit SPMD), NOT GSPMD auto-sharding,
for one load-bearing reason: the fused ESM attention Pallas kernels
(ops/esm_attention.py) are opaque custom calls the auto-partitioner cannot
split, but under shard_map every device simply runs them on its LOCAL head
shard — the kernels need no changes.  The models/esm.py modules read their
head count from the actual (sharded) projection width and accept a
`tp_axis` for the two reductions.

The reference has no analogue: its ESM2 is a single-GPU fp16 module
(/root/reference/abx/model/encoder.py:31-34).  Use when HBM is tight
(larger L or batch alongside the full trunk) or when chips outnumber the
useful data-parallel batch; for small-batch design sweeps plain DP remains
the throughput-optimal layout because it needs no collectives at all.

Usage:
    mesh = mesh2d(dp=2, tp=4)
    esm_fn = TensorParallelAntibodyESM(mesh, esm_cfg, antibody_len)
    esm_params = shard_esm_params(mesh, params)   # tp-sharded device_put
    Sampler(..., esm_fn=esm_fn, esm_params=esm_params)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from abx_tpu.models.esm import (ESM2, ESM2Config, build_esm_tokens,
                                extract_antibody_reprs)

# Param-name classes (fair-esm naming, models/esm.py):
#   column-parallel — shard the LAST axis of kernel AND bias;
#   row-parallel    — shard the kernel's input (second-to-last) axis,
#                     replicate the bias (added once after the psum).
_COL_PARALLEL = ('q_proj', 'k_proj', 'v_proj', 'fc1')
_ROW_PARALLEL = ('out_proj', 'fc2')


def mesh2d(dp: int, tp: int, devices: Optional[Sequence] = None,
           axis_names=('data', 'model')) -> Mesh:
    """A (dp, tp) mesh; tp should map to the ICI-adjacent axis."""
    devices = list(devices) if devices is not None else jax.devices()
    assert len(devices) >= dp * tp, (dp, tp, len(devices))
    return Mesh(np.asarray(devices[:dp * tp]).reshape(dp, tp), axis_names)


def esm_param_specs(params, tp_axis: str = 'model'):
    """PartitionSpec pytree for an ESM2 param tree (scan or unrolled layout).

    Works on the stacked `nn.scan` layout ((N, ...) leaves) and the
    per-layer layout alike: the spec is derived from the owning module
    name in the path, and the sharded axis is counted from the END of the
    shape, which is layout-invariant.
    """
    def spec(path, leaf):
        names = {getattr(p, 'key', None) for p in path}
        if names & set(_COL_PARALLEL):
            return P(*([None] * (leaf.ndim - 1) + [tp_axis]))
        if names & set(_ROW_PARALLEL):
            if path[-1].key == 'kernel':
                return P(*([None] * (leaf.ndim - 2) + [tp_axis, None]))
            return P()  # bias: replicated, added once after the psum
        return P()
    return jax.tree_util.tree_map_with_path(spec, params)


def shard_esm_params(mesh: Mesh, params, tp_axis: str = 'model'):
    """device_put the ESM param tree with Megatron tp shardings."""
    specs = esm_param_specs(params, tp_axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


class TensorParallelAntibodyESM:
    """Drop-in for models/esm.AntibodyESM with tp-sharded params.

    Same call signature — `(params, ab_aatype, heavy_len, light_len,
    layer_weights)` — so Sampler/Trainer take it unchanged via their
    `esm_fn=` argument.  The batch rides the 'data' axis; params must be
    sharded with `shard_esm_params` over the same mesh (a replicated tree
    also works — shard_map reshards inputs to in_specs).
    """

    def __init__(self, mesh: Mesh, config: ESM2Config, antibody_len: int,
                 sep_pad_num: int = 48, dtype=jnp.bfloat16,
                 scan_layers: bool = True, data_axis: str = 'data',
                 tp_axis: str = 'model'):
        c_heads, c_ffn = config.attention_heads, 4 * config.embed_dim
        tp = mesh.shape[tp_axis]
        assert c_heads % tp == 0, (
            f'attention_heads={c_heads} not divisible by tp={tp}')
        assert c_ffn % tp == 0, (f'ffn={c_ffn} not divisible by tp={tp}')
        self.mesh = mesh
        self.config = config
        self.antibody_len = antibody_len
        self.sep_pad_num = sep_pad_num
        self.data_axis = data_axis
        self.tp_axis = tp_axis
        self.module = ESM2(config, dtype=dtype, scan_layers=scan_layers,
                           tp_axis=tp_axis, tp_size=tp)

    def esm_seq_len(self) -> int:
        return self.antibody_len + self.sep_pad_num + 2

    def __call__(self, params, ab_aatype, heavy_len, light_len,
                 layer_weights=None):
        assert layer_weights is not None, (
            'the tp path computes the layer-weighted sum in-loop; the full '
            '(B, L, D, N+1) stack output is single-device only')

        def inner(p, aa, hl, ll, w):
            tokens = build_esm_tokens(aa, hl, ll, self.sep_pad_num)
            reprs = self.module.apply(p, tokens, layer_weights=w)
            return extract_antibody_reprs(reprs, hl, ll, self.antibody_len,
                                          self.sep_pad_num)

        d = P(self.data_axis)
        fn = jax.shard_map(
            inner, mesh=self.mesh,
            in_specs=(esm_param_specs(params, self.tp_axis), d, d, d, P()),
            out_specs=d,
            # Replication checking can't see through the Pallas attention
            # custom calls; correctness is asserted by tests instead.
            check_vma=False)
        return fn(params, ab_aatype, heavy_len, light_len,
                  jnp.asarray(layer_weights, jnp.float32))
