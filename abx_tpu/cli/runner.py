"""Shared CLI runtime: model/diffuser construction, sampling drivers.

Replaces the reference's per-entry-point duplication (inference.py and
design.py are ~95% identical, SURVEY.md §2.1) with one runner that the thin
CLI mains call.

Work distribution follows the TPU-native story (abx_tpu/parallel/mesh.py):
samples are batched along the leading axis and sharded over a 1-D device
mesh; multi-host runs shard the complex list by `jax.process_index()`.
"""

from __future__ import annotations

import dataclasses
import glob
import json
import logging
import zlib
import os
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from abx_tpu import config as config_lib
from abx_tpu.data import dataset as ds
from abx_tpu.data.dataset import DataConfig
from abx_tpu.diffusion.joint import JointConfig, JointDiffuser
from abx_tpu.models.network import ScoreNetwork
from abx_tpu.parallel import mesh as mesh_lib
from abx_tpu.sampling.output import (postprocess_reference,
                                     postprocess_sample,
                                     postprocess_trajectory)
from abx_tpu.sampling.sampler import Sampler, SamplerConfig
from abx_tpu.utils import checkpoint as ckpt_lib

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class Runtime:
    config: 'ml_collections.ConfigDict'
    diffuser: JointDiffuser
    model: ScoreNetwork
    params: Dict
    data_config: DataConfig
    # Pure ESM fn (esm_params, ab_aatype, heavy_len, light_len,
    # layer_weights) plus its params — kept separate so jit receives the
    # weights as a runtime argument (see sampling/sampler.py).
    esm_fn: Optional[object] = None
    esm_params: Optional[Dict] = None


def build_runtime(model_config_path: Optional[str] = None,
                  checkpoint_path: Optional[str] = None,
                  tiny: bool = False,
                  seed: int = 0,
                  bf16: bool = False,
                  esm_checkpoint: Optional[str] = None,
                  esm_random: bool = False,
                  esm_layers: Optional[int] = None,
                  esm_dim: Optional[int] = None) -> Runtime:
    from abx_tpu.utils.compile_cache import enable as _enable_cache
    _enable_cache()
    if tiny:
        cfg = config_lib.tiny_model_config()
        with cfg.unlocked():
            # tiny channels, but real-complex shape budget.
            cfg.data.max_antibody_len = 256
            cfg.data.max_antigen_len = 32
    else:
        cfg = config_lib.load_config(model_config_path)
    diffuser = JointDiffuser(JointConfig.from_dict(cfg.diffuser.to_dict()))
    dcfg = DataConfig(cfg.data.max_antibody_len, cfg.data.max_antigen_len,
                      cfg.data.patch_radius, cfg.data.anchor_neighbors,
                      cfg.data.get('parity_random_antigen_window', False))
    if esm_checkpoint or esm_random:
        # Must happen BEFORE param init/conversion so the trunk's ESM
        # projection params are created and mapped.
        with cfg.unlocked():
            cfg.model.embeddings_and_seqformer.esm.enabled = True
            # Shape overrides (smaller-than-3B encoders: ablations /
            # quality studies with esm_random; released smaller ESM2 ckpts).
            if esm_layers:
                cfg.model.embeddings_and_seqformer.esm.num_layers = esm_layers
            if esm_dim:
                cfg.model.embeddings_and_seqformer.esm.embed_channel = esm_dim
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    model = ScoreNetwork(cfg.model, diffuser=diffuser,
                         antibody_len=cfg.data.max_antibody_len,
                         dtype=dtype)

    if checkpoint_path and os.path.exists(checkpoint_path):
        if checkpoint_path.endswith(('.ckpt', '.pt', '.pth')):
            from abx_tpu.utils.torch_convert import convert_reference_ckpt
            params = convert_reference_ckpt(checkpoint_path, model, cfg,
                                            diffuser)
        else:
            params = ckpt_lib.load_params(checkpoint_path)
        logger.info('loaded checkpoint %s', checkpoint_path)
    else:
        params = _random_init(model, cfg, diffuser, seed)
        logger.warning('no checkpoint: using randomly initialised weights')

    esm_fn, esm_params = None, None
    if esm_checkpoint:
        esm_fn, esm_params = _build_esm_fn(esm_checkpoint, cfg, bf16)
    elif esm_random:
        esm_fn, esm_params = _random_esm(cfg, bf16, seed)
        logger.warning('esm_random: ESM2 with randomly initialised weights '
                       '(perf/memory studies only)')
    return Runtime(cfg, diffuser, model, params, dcfg, esm_fn, esm_params)


def _random_esm(cfg, bf16: bool, seed: int = 0):
    """Full-shape ESM2 with random weights, initialised ON DEVICE.

    Real ESM2-3B weights are absent from this environment (ROADMAP.md);
    perf and memory at the 3B shape are weight-independent, so the bench's
    ESM-on config uses this.  Parameters are generated leaf-by-leaf with
    `jax.random.normal` in the compute dtype — no host-side 11 GB f32 tree.
    """
    from abx_tpu.models.esm import AntibodyESM, ESM2Config, esm2_num_heads
    es = cfg.model.embeddings_and_seqformer.esm
    esm_cfg = ESM2Config(
        num_layers=es.num_layers, embed_dim=es.embed_channel,
        attention_heads=esm2_num_heads(es.embed_channel,
                                       override=es.get('num_heads', None)))
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    wrapper = AntibodyESM(esm_cfg, cfg.data.max_antibody_len,
                          sep_pad_num=es.esm_embed.sep_pad_num,
                          dtype=dtype, scan_layers=True)
    tokens = jnp.zeros((1, wrapper.esm_seq_len()), jnp.int32)
    shapes = jax.eval_shape(wrapper.module.init, jax.random.PRNGKey(0),
                            tokens)
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def make(key):
        out = []
        for i, leaf in enumerate(leaves):
            k = jax.random.fold_in(key, i)
            out.append(0.02 * jax.random.normal(k, leaf.shape, dtype))
        return jax.tree_util.tree_unflatten(treedef, out)

    return wrapper, make(key)


def _build_esm_fn(esm_checkpoint: str, cfg, bf16: bool):
    """Load + convert an ESM2 checkpoint; return (pure_fn, params).

    The returned fn has signature (esm_params, ab_aatype, heavy_len,
    light_len, layer_weights) so params stay a jit runtime argument.
    """
    import jax.numpy as jnp
    from abx_tpu.models.esm import (AntibodyESM, ESM2Config,
                                    esm2_num_heads, stack_layer_params)
    from abx_tpu.utils import checkpoint as ckpt_lib
    es_cfg_conf = cfg.model.embeddings_and_seqformer.esm
    esm_cfg = ESM2Config(
        num_layers=es_cfg_conf.num_layers,
        embed_dim=es_cfg_conf.embed_channel,
        attention_heads=esm2_num_heads(
            es_cfg_conf.embed_channel,
            override=es_cfg_conf.get('num_heads', None)))
    if esm_checkpoint.endswith(('.pt', '.pth', '.ckpt')):
        from abx_tpu.utils.torch_convert import convert_esm2_ckpt
        esm_params = convert_esm2_ckpt(esm_checkpoint, esm_cfg.num_layers)
    else:
        esm_params = ckpt_lib.load_params(esm_checkpoint)
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    # Frozen conditioning weights: store in the compute dtype (bf16 halves
    # the 3B model's HBM residency vs f32).
    esm_params = jax.tree.map(lambda x: jnp.asarray(x, dtype), esm_params)
    if 'layers' not in esm_params['params']:
        esm_params = stack_layer_params(esm_params, esm_cfg.num_layers)
    wrapper = AntibodyESM(esm_cfg, cfg.data.max_antibody_len,
                          sep_pad_num=es_cfg_conf.esm_embed.sep_pad_num,
                          dtype=dtype, scan_layers=True)
    return wrapper, esm_params


def _random_init(model, cfg, diffuser, seed: int):
    from abx_tpu.data.features import FeatureBuilder, make_diffuser_features
    l_ab, l_ag = cfg.data.max_antibody_len, cfg.data.max_antigen_len
    es = cfg.model.embeddings_and_seqformer.esm
    esm_fn = None
    if es.enabled:
        def esm_fn(ab_aatype, heavy_len, light_len,  # init-time stub
                   layer_weights=None):
            if layer_weights is not None:
                return jnp.zeros(ab_aatype.shape + (es.embed_channel,))
            return jnp.zeros(ab_aatype.shape + (es.embed_channel,
                                                es.num_layers + 1))
    l = l_ab + l_ag
    dummy = {
        'seq': jnp.zeros((1, l), jnp.int32),
        'mask': jnp.ones((1, l)),
        'atom14_gt_positions': jnp.zeros((1, l, 14, 3)),
        'atom14_gt_exists': jnp.ones((1, l, 14)),
        'cdr_def': jnp.zeros((1, l), jnp.int32),
        'chain_id': jnp.zeros((1, l), jnp.int32),
        'residx': jnp.tile(jnp.arange(l, dtype=jnp.int32), (1, 1)),
        'anchor_flag': jnp.zeros((1, l_ab), jnp.int32)
                        .at[:, 10].set(5).at[:, 20].set(5),
    }
    dummy['heavy_len'] = jnp.asarray([l_ab // 2], jnp.int32)
    dummy['light_len'] = jnp.asarray([l_ab // 2], jnp.int32)
    dummy = FeatureBuilder()(dummy)
    dummy = make_diffuser_features(
        dummy, diffuser=diffuser, generate_area='H3',
        key=jax.random.PRNGKey(0), mode='design')
    return model.init(jax.random.PRNGKey(seed), dummy, compute_loss=True,
                      esm_fn=esm_fn)


def load_complexes(data_dir: Optional[str], name_idx: Optional[Sequence[str]],
                   pdb_file: Optional[str], runtime: Runtime,
                   is_training: bool = False, use_seqres: bool = False):
    """Yield (feats, meta) for each requested complex."""
    if pdb_file:
        name = os.path.splitext(os.path.basename(pdb_file))[0]
        parts = name.split('_')
        heavy, light = parts[1], parts[2]
        antigens = parts[3].split('|') if len(parts) > 3 else []
        ex = ds.complex_from_pdb(pdb_file, heavy, light, antigens,
                                 use_seqres=use_seqres)
        prep = ds.prepare_example(ex, runtime.data_config, is_training)
        if prep is not None:
            yield prep
        return
    assert data_dir is not None and name_idx is not None
    dataset = ds.ComplexDataset(data_dir, name_idx, runtime.data_config,
                                is_training)
    yield from dataset


def run_sampling(runtime: Runtime, output_dir: str, mode: str,
                 complexes, num_samples: int = 1, generate_area: str = 'H3',
                 num_t: Optional[int] = None, opt_steps: Sequence[int] = (),
                 seed: int = 42, batch_samples: Optional[int] = None,
                 resume: bool = False, aot_dir: Optional[str] = None,
                 esm_reuse_recycles: bool = False,
                 esm_refresh_every: int = 1,
                 seq_corrector_steps: int = 0):
    """Main sampling driver.

    For throughput, up to `batch_samples` independent samples of one complex
    are folded into the batch axis and sharded across the mesh.
    """
    cfg = runtime.config
    num_t = num_t or cfg.diffuser.inference_step
    # HOST-LOCAL devices: hosts are independent by design — complexes are
    # sharded across hosts over DCN (`shard_names`), samples across each
    # host's own chips over ICI.  Using jax.devices() here would build a
    # global mesh and try to shard host-local numpy onto remote chips.
    devices = jax.local_devices()
    batch_samples = batch_samples or max(1, len(devices))
    dev_mesh = mesh_lib.make_mesh(devices)

    def make_sampler(mode_name, opt_step=None):
        scfg = SamplerConfig(
            num_t=num_t, mode=('optimize' if opt_step is not None
                               else ('trajectory' if mode_name == 'trajectory'
                                     else 'design')),
            opt_step=opt_step, generate_area=generate_area,
            collect_trajectory=(mode_name == 'trajectory'),
            esm_reuse_recycles=esm_reuse_recycles,
            esm_refresh_every=esm_refresh_every,
            seq_corrector_steps=seq_corrector_steps)
        sampler = Sampler(runtime.model, runtime.diffuser, cfg.model, scfg,
                          esm_fn=runtime.esm_fn,
                          esm_params=runtime.esm_params)
        if aot_dir:
            # Serve from serialized StableHLO exports: warm processes skip
            # Python re-tracing (Sampler.enable_aot).
            sampler.enable_aot(aot_dir)
        return sampler

    os.makedirs(output_dir, exist_ok=True)
    ref_dir = os.path.join(output_dir, 'reference')
    os.makedirs(ref_dir, exist_ok=True)

    opt_list = list(opt_steps) if mode == 'optimize' else [None]
    complexes = list(complexes)  # reused across optimize strengths

    results_log = []
    for opt_step in opt_list:
        sampler = make_sampler(mode, opt_step)
        sub_dir = (os.path.join(output_dir, f'OPT-{opt_step}')
                   if opt_step is not None else output_dir)
        os.makedirs(sub_dir, exist_ok=True)

        for feats, meta in complexes:
            name = meta['name']
            try:
                batch = ds.stack_batch([feats])
                postprocess_reference(ref_dir, meta, batch)
            except Exception:
                logger.exception('failed preparing %s; skipping', name)
                continue

            remaining = num_samples
            sample_idx = 0
            if resume:
                # Idempotent restart: sample keys are derived per CHUNK
                # (fold_in(chunk start index)), so identical regeneration
                # holds at chunk granularity — resume rounds down to the
                # last complete chunk boundary and must use the same
                # batch_samples as the original run (failure-recovery
                # story, SURVEY.md §5).
                def _done(i):
                    d = os.path.join(sub_dir, f'{i:04d}')
                    # design/optimize write <name>.pdb; trajectory writes
                    # one <name>@<t>.pdb per timestep.
                    return (os.path.exists(os.path.join(d, f'{name}.pdb'))
                            or bool(glob.glob(
                                os.path.join(d, f'{name}@*.pdb'))))

                while sample_idx < num_samples and _done(sample_idx):
                    sample_idx += 1
                sample_idx = (sample_idx // batch_samples) * batch_samples
                remaining = num_samples - sample_idx
                if sample_idx:
                    logger.info('%s: resuming at sample %d', name, sample_idx)
            while remaining > 0:
                n = min(batch_samples, remaining)
                tiled = {k: np.repeat(v, n, axis=0) for k, v in batch.items()}
                padded, real_n = mesh_lib.pad_batch_to_devices(
                    tiled, len(devices))
                sharded = mesh_lib.shard_batch(dev_mesh, padded)
                # Stable across processes (Python's hash() is salted).
                name_hash = zlib.crc32(name.encode('utf-8'))
                key = jax.random.fold_in(
                    jax.random.fold_in(jax.random.PRNGKey(seed), name_hash),
                    sample_idx)
                t0 = time.time()
                try:
                    result = sampler.sample(runtime.params, sharded, key)
                    result = jax.tree.map(np.asarray, result)
                except Exception:
                    # Per-complex resilience (reference inference.py:301-302)
                    # with deterministic keys: any failed complex/sample can
                    # be recomputed idempotently from its key.
                    logger.exception('sampling failed for %s; skipping', name)
                    break
                elapsed = time.time() - t0
                logger.info('%s: %d samples in %.2fs (%.2f samples/s)',
                            name, n, elapsed, n / elapsed)
                results_log.append((name, n, elapsed))
                for i in range(n):
                    sdir = os.path.join(sub_dir, f'{sample_idx + i:04d}')
                    os.makedirs(sdir, exist_ok=True)
                    if mode == 'trajectory':
                        postprocess_trajectory(sdir, meta, result, i)
                    else:
                        postprocess_sample(sdir, meta, result, i)
                remaining -= n
                sample_idx += n
    return results_log
