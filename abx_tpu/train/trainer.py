"""Data-parallel training loop (net-new; the reference ships none).

One jitted `train_step` over a 1-D mesh: batch sharded on 'data', params
replicated, gradients reduced by XLA (sharding propagation inserts the
psum).  Optax AdamW + gradient clipping; orbax (when present) or msgpack
checkpoints via abx_tpu.utils.checkpoint.
"""

from __future__ import annotations

import csv
import dataclasses
import functools
import logging
import os
import time
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from abx_tpu.data.features import (FeatureBuilder,
                                   make_diffuser_features,
                                   make_static_pair_features)
from abx_tpu.models.network import forward_with_recycling, zero_prev
from abx_tpu.parallel import mesh as mesh_lib
from abx_tpu.train.losses import total_loss
from abx_tpu.utils import checkpoint as ckpt_lib

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    warmup_steps: int = 1000
    # >0 enables cosine decay from peak LR to min_lr_ratio*peak over
    # `decay_steps` steps after warmup; 0 keeps warmup-then-constant.
    decay_steps: int = 0
    min_lr_ratio: float = 0.1
    weight_decay: float = 1e-4
    grad_clip: float = 1.0
    generate_area: str = 'cdr'
    log_every: int = 50  # <=0 disables periodic logging/metrics rows
    checkpoint_every: int = 1000
    ema_decay: float = 0.999  # 0 disables EMA
    # Periodic in-training checkpoints via orbax (async, sharded-aware,
    # keeps the newest 3 under <checkpoint_path>.orbax/); the final msgpack
    # save remains the interchange format.
    use_orbax: bool = False


def make_optimizer(cfg: TrainConfig):
    if cfg.decay_steps > 0:
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, cfg.warmup_steps,
            cfg.warmup_steps + cfg.decay_steps,
            end_value=cfg.min_lr_ratio * cfg.learning_rate)
    else:
        schedule = optax.linear_schedule(0.0, cfg.learning_rate,
                                         cfg.warmup_steps)
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(schedule, weight_decay=cfg.weight_decay),
    )


class Trainer:
    def __init__(self, model, diffuser, model_config, loss_config,
                 train_config: TrainConfig = TrainConfig(),
                 mesh: Optional[Any] = None,
                 esm_fn=None, esm_params=None):
        """`esm_fn`/`esm_params`: optional frozen ESM2 conditioning, as in
        the reference's training configuration (encoder.py:32
        `requires_grad_(False)`): the ESM forward runs inside every trunk
        pass on the current noisy sequence, gradients flow only into the
        trunk's projection of its output — never into ESM itself (its
        inputs are integer tokens and its params are not differentiated).
        `esm_params` is threaded through jit as a runtime argument (a
        closed-over 3B tree would be baked into the executable)."""
        self.model = model
        self.diffuser = diffuser
        self.model_config = model_config
        self.loss_config = loss_config
        self.config = train_config
        self.mesh = mesh or mesh_lib.make_mesh()
        self.optimizer = make_optimizer(train_config)
        self.feature_builder = FeatureBuilder(is_training=True)
        self.esm_fn = esm_fn
        self.esm_params = esm_params if esm_params is not None else {}
        self._step_fn = jax.jit(self._build_step())

    def init_state(self, params) -> Dict:
        state = {'params': params,
                 'opt_state': self.optimizer.init(params),
                 'step': jnp.asarray(0)}
        if self.config.ema_decay > 0:
            state['ema_params'] = jax.tree.map(jnp.asarray, params)
        return state

    def _build_step(self):
        cfg = self.config
        model = self.model
        diffuser = self.diffuser
        antibody_len = model.antibody_len

        model_config = self.model_config

        def loss_fn(params, esm_params, batch, key):
            # Robust two-pass LayerNorm variance for training numerics
            # (trace-time scoped; inference keeps the fused one-pass form).
            from abx_tpu.models.modules import two_pass_layer_norm
            with two_pass_layer_norm():
                return _loss_body(params, esm_params, batch, key)

        def _loss_body(params, esm_params, batch, key):
            efn = self.esm_fn
            if efn is not None and esm_params:
                efn = functools.partial(self.esm_fn, esm_params)
            k_noise, k_drop, k_rec = jax.random.split(key, 3)
            batch = self.feature_builder(batch)
            batch = make_diffuser_features(
                batch, diffuser=diffuser, generate_area=cfg.generate_area,
                key=k_noise, mode='train', is_training=True)
            batch = make_static_pair_features(batch)
            b, l = batch['seq'].shape
            batch.update(zero_prev(b, l, model_config,
                                   dtype=model.dtype))

            # Static embeddings shared across recycle passes; gradient
            # flows through them from the final pass (recycles are cut by
            # the stop_gradients on prev_*/seq_t, matching the reference's
            # no-grad recycling).
            static_acts = model.apply(params, batch,
                                      method='static_embeddings')

            def single(mb, compute_loss, pass_idx):
                # Independent dropout masks per recycle pass (a shared key
                # would correlate masks across passes).
                k_pass = jax.random.fold_in(k_drop, pass_idx)
                return model.apply(params, mb, esm_fn=efn,
                                   compute_loss=compute_loss,
                                   deterministic=False,
                                   rngs={'dropout': k_pass}, num_recycle=0,
                                   static_acts=static_acts)

            # Random recycle depth per step (reference abx.py:87-91).
            n_rec = jax.random.randint(k_rec, (), 0,
                                       model_config.num_recycle + 1)
            outputs = forward_with_recycling(
                single, batch, n_rec,
                model_config.embeddings_and_seqformer.prev_pos,
                compute_loss=True)
            out = total_loss(batch, outputs, self.loss_config, antibody_len)
            return out['loss'], out['metrics']

        def train_step(state, esm_params, batch, key):
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state['params'], esm_params, batch,
                                       key)
            updates, opt_state = self.optimizer.update(
                grads, state['opt_state'], state['params'])
            params = optax.apply_updates(state['params'], updates)
            new_state = {'params': params, 'opt_state': opt_state,
                         'step': state['step'] + 1}
            if 'ema_params' in state:
                d = cfg.ema_decay
                new_state['ema_params'] = jax.tree.map(
                    lambda e, p: d * e + (1.0 - d) * p,
                    state['ema_params'], params)
            metrics['grad_norm'] = optax.global_norm(grads)
            return new_state, metrics

        return train_step

    def step(self, state, batch, key):
        batch = mesh_lib.shard_batch(self.mesh, batch)
        return self._step_fn(state, self.esm_params, batch, key)

    def fit(self, state, data_iter: Iterator, num_steps: int,
            key, checkpoint_path: Optional[str] = None,
            metrics_path: Optional[str] = None):
        """Training loop; appends one CSV row per `log_every` steps to
        `metrics_path` (resume-friendly metrics sink)."""
        cfg = self.config
        t0 = time.time()
        metrics_writer = None
        metrics_file = None
        # Global step offset: state['step'] persists through the .train
        # checkpoint, so resumed runs continue the step axis instead of
        # restarting at 1 (which made resumed metrics.csv zigzag).
        start_step = int(state['step'])
        orbax_ckpt = None
        if cfg.use_orbax and checkpoint_path:
            from abx_tpu.utils.checkpoint import (OrbaxCheckpointer,
                                                  orbax_available)
            if orbax_available():
                orbax_ckpt = OrbaxCheckpointer(checkpoint_path + '.orbax')
            else:
                logger.warning('use_orbax set but orbax missing; falling '
                               'back to msgpack periodic checkpoints')
        try:
            for i in range(num_steps):
                batch = next(data_iter)
                key, sub = jax.random.split(key)
                state, metrics = self.step(state, batch, sub)
                gstep = start_step + i + 1
                if cfg.log_every > 0 and (i + 1) % cfg.log_every == 0:
                    metrics = jax.tree.map(float, metrics)
                    rate = cfg.log_every / (time.time() - t0)
                    t0 = time.time()
                    logger.info('step %d: loss=%.4f aar=%.3f (%.2f steps/s)',
                                gstep, metrics['total'],
                                metrics.get('seq/aar', -1), rate)
                    if metrics_path:
                        row = dict(step=gstep, steps_per_sec=rate, **metrics)
                        if metrics_writer is None:
                            metrics_writer, metrics_file = \
                                self._open_metrics(metrics_path, row)
                        metrics_writer.writerow(row)
                        metrics_file.flush()
                if (checkpoint_path and cfg.checkpoint_every > 0
                        and (i + 1) % cfg.checkpoint_every == 0):
                    if orbax_ckpt is not None:
                        orbax_ckpt.save(gstep, state)  # async
                    else:
                        self._save(checkpoint_path, state)
        finally:
            if metrics_file is not None:
                metrics_file.close()
            if orbax_ckpt is not None:
                orbax_ckpt.wait()
            # Stop a prefetching iterator promptly: otherwise its producer
            # thread keeps featurizing/device_put-ing up to `size` more
            # batches (holding device memory) until GC, and a late producer
            # error would be silently dropped (ADVICE r4).
            close = getattr(data_iter, 'close', None)
            if callable(close):
                close()
        if checkpoint_path:
            self._save(checkpoint_path, state)
        return state

    @staticmethod
    def _open_metrics(metrics_path: str, row: Dict):
        """Open the metrics CSV for append, reusing an existing header.

        When appending to a file from an earlier run, its header defines the
        columns: extra metrics in this run are dropped, absent ones left
        blank — values never land under the wrong column (mixed-schema
        append hazard).
        """
        fieldnames = sorted(row)
        exists = os.path.exists(metrics_path) and \
            os.path.getsize(metrics_path) > 0
        if exists:
            with open(metrics_path, newline='', encoding='utf-8') as f:
                existing = next(csv.reader(f), None)
            if existing:
                dropped = sorted(set(fieldnames) - set(existing))
                if dropped:
                    logger.warning(
                        'metrics.csv: appending under the existing header; '
                        'dropping columns not in it: %s', dropped)
                fieldnames = existing
        metrics_file = open(metrics_path, 'a', newline='', encoding='utf-8')
        writer = csv.DictWriter(metrics_file, fieldnames=fieldnames,
                                restval='', extrasaction='ignore')
        if not exists:
            writer.writeheader()
        return writer, metrics_file

    def _save(self, checkpoint_path: str, state) -> None:
        # EMA weights are the inference checkpoint (diffusion standard);
        # raw params saved alongside at EVERY checkpoint so a crash after a
        # mid-training save still leaves resumable training weights.
        ckpt_lib.save_params(
            checkpoint_path, state.get('ema_params', state['params']))
        ckpt_lib.save_params(checkpoint_path + '.raw', state['params'])
        # Full training state (opt moments, LR-schedule step, EMA) so a
        # resume continues AdamW/warmup/EMA exactly (not a cold restart).
        ckpt_lib.save_params(checkpoint_path + '.train', state)

    def load_train_state(self, checkpoint_path: str, params) -> Dict:
        """Restore a full `.train` state saved by `_save`.

        `params` provides the target tree structure (and dtypes) for
        msgpack restoration.  With `use_orbax`, periodic checkpoints land
        only in `<path>.orbax/` (the msgpack `.train` file is written at
        clean exit), so a crashed run's newest state may live there: the
        orbax state is restored whenever it is newer than the msgpack one
        (ADVICE r2).
        """
        target = self.init_state(params)
        msgpack_state = None
        if os.path.exists(checkpoint_path + '.train'):
            try:
                msgpack_state = ckpt_lib.load_params(
                    checkpoint_path + '.train', target=target)
            except Exception as e:
                # Saves are atomic now (ckpt_lib.save_params tmp+rename),
                # but checkpoints written before that fix — or copied
                # partially — may be truncated; fall through to orbax
                # rather than refusing to resume.
                logger.warning('unreadable %s.train (%s); trying orbax',
                               checkpoint_path, e)
        orbax_state = None
        orbax_dir = checkpoint_path + '.orbax'
        if os.path.isdir(orbax_dir) and ckpt_lib.orbax_available():
            mgr = ckpt_lib.OrbaxCheckpointer(orbax_dir)
            try:
                latest = mgr.latest_step()
                msg_step = (int(msgpack_state['step'])
                            if msgpack_state is not None else -1)
                if latest is not None and latest > msg_step:
                    orbax_state = mgr.restore(target)
                    logger.info(
                        'resuming from orbax step %d (msgpack at %d)',
                        latest, msg_step)
            finally:
                mgr.close()
        state = orbax_state if orbax_state is not None else msgpack_state
        if state is None:
            raise FileNotFoundError(
                f'no train state at {checkpoint_path}.train or {orbax_dir}')
        state['step'] = jnp.asarray(state['step'])
        return state
