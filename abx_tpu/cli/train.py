"""Training CLI (net-new; the reference ships no trainer).

Data-parallel training over a device mesh with cluster-based sampling
(reference dataset.py:46-73 semantics: one random member per cluster per
epoch), uniform-t forward noising on device, and the reconstructed loss
stack (abx_tpu/train/losses.py).

Example:
    python -m abx_tpu.cli.train --data_dir data/npz --name_idx clusters.txt \
        --is_cluster_idx --output_dir runs/exp1 --num_steps 10000
"""

from __future__ import annotations

import argparse
import logging
import os
import random
from typing import Iterator, List

import jax
import numpy as np

from abx_tpu.cli import runner
from abx_tpu.data import dataset as ds
from abx_tpu.train.trainer import TrainConfig, Trainer

logger = logging.getLogger(__name__)


def parse_cluster_file(path: str) -> List[List[str]]:
    """Each line = whitespace-separated complex names forming one cluster."""
    clusters = []
    with open(path, encoding='utf-8') as f:
        for line in f:
            items = line.split()
            if items:
                clusters.append(items)
    return clusters


def batch_iterator(data_dir: str, names, cfg, batch_size: int,
                   is_cluster_idx: bool, seed: int,
                   reduce_num: int = 0) -> Iterator:
    """Infinite iterator of stacked static-shape batches.

    ``reduce_num > 0`` visits only a per-epoch random subset of that many
    clusters (reference dataset.py:107-116: reseed ``2022 + epoch``,
    shuffle, take the first ``reduce_num``) — same deterministic
    epoch-keyed subsampling, scoped to a local RNG instead of reseeding
    the process-global ``random`` module.
    """
    rng = random.Random(seed)
    clusters = names if is_cluster_idx else [[n] for n in names]
    epoch = 0
    buffer = []
    while True:
        order = list(range(len(clusters)))
        if reduce_num and reduce_num > 0:
            random.Random(2022 + epoch).shuffle(order)
            order = order[:reduce_num]
        else:
            rng.shuffle(order)
        epoch += 1
        for ci in order:
            name = rng.choice(clusters[ci])
            path = os.path.join(data_dir, f'{name}.npz')
            if not os.path.exists(path):
                continue
            try:
                raw = ds.load_complex_npz(path, name)
                ex = ds._npz_to_example(raw)
                prep = ds.prepare_example(ex, cfg, is_training=True, rng=rng)
            except Exception as e:
                logger.warning('skip %s: %s', name, e)
                continue
            if prep is None:
                continue
            buffer.append(prep[0])
            if len(buffer) == batch_size:
                yield ds.stack_batch(buffer)
                buffer = []


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--data_dir', type=str, required=True)
    p.add_argument('--name_idx', type=str, required=True)
    p.add_argument('--is_cluster_idx', action='store_true')
    p.add_argument('--output_dir', type=str, required=True)
    p.add_argument('--init_checkpoint', type=str, default=None)
    p.add_argument('--model_config', type=str, default=None)
    p.add_argument('--batch_size', type=int, default=8)
    p.add_argument('--num_steps', type=int, default=10000)
    p.add_argument('--learning_rate', type=float, default=1e-4)
    p.add_argument('--decay_steps', type=int, default=0,
                   help='cosine-decay the LR over this many steps after '
                        'warmup (0 = warmup-then-constant)')
    p.add_argument('--ema_decay', type=float, default=0.999,
                   help='EMA decay for the inference checkpoint (0 disables)')
    p.add_argument('--resume', action='store_true',
                   help='restore the full training state (optimizer '
                        'moments, step, EMA) from <output_dir>/'
                        'params.msgpack.train if present')
    p.add_argument('--reduce_num', type=int, default=0,
                   help='per-epoch random subset size of clusters to visit '
                        '(reference dataset.py reduce_num; 0 = all)')
    p.add_argument('--prefetch', type=int, default=2,
                   help='batches built ahead by a background loader thread '
                        '(overlaps featurization + H2D with the device '
                        'step; 0 disables)')
    p.add_argument('--log_every', type=int, default=50)
    p.add_argument('--checkpoint_every', type=int, default=1000,
                   help='save the full train state every N steps (crash '
                        'resumability granularity)')
    p.add_argument('--use_orbax', action='store_true',
                   help='periodic checkpoints via async orbax under '
                        '<output_dir>/params.msgpack.orbax/')
    p.add_argument('--generate_area', type=str, default='cdr')
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--esm_checkpoint', type=str, default=None,
                   help='frozen ESM2 conditioning during training (the '
                        "reference's configuration); fair-esm .pt checkpoint")
    p.add_argument('--esm_random', action='store_true',
                   help='frozen RANDOM-weight ESM2 conditioning (smoke/'
                        'perf studies when no checkpoint is available; '
                        'shape via --esm_layers/--esm_dim)')
    p.add_argument('--esm_layers', type=int, default=None)
    p.add_argument('--esm_dim', type=int, default=None)
    p.add_argument('--tiny', action='store_true')
    p.add_argument('--platform', type=str, default=None)
    p.add_argument('--verbose', action='store_true')
    args = p.parse_args()
    if args.platform:
        jax.config.update('jax_platforms', args.platform)
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format='%(asctime)-15s [%(levelname)s] %(message)s')

    rt = runner.build_runtime(args.model_config, args.init_checkpoint,
                              tiny=args.tiny, seed=args.seed,
                              esm_checkpoint=args.esm_checkpoint,
                              esm_random=args.esm_random,
                              esm_layers=args.esm_layers,
                              esm_dim=args.esm_dim)
    if args.is_cluster_idx:
        names = parse_cluster_file(args.name_idx)
    else:
        with open(args.name_idx, encoding='utf-8') as f:
            names = [x.strip() for x in f if x.strip()]
    names = ds.shard_names(names, jax.process_index(), jax.process_count())

    os.makedirs(args.output_dir, exist_ok=True)
    trainer = Trainer(
        rt.model, rt.diffuser, rt.config.model, rt.config.loss,
        TrainConfig(learning_rate=args.learning_rate,
                    decay_steps=args.decay_steps,
                    generate_area=args.generate_area,
                    ema_decay=args.ema_decay,
                    log_every=args.log_every,
                    checkpoint_every=args.checkpoint_every,
                    use_orbax=args.use_orbax),
        esm_fn=rt.esm_fn, esm_params=rt.esm_params)
    ckpt = os.path.join(args.output_dir, 'params.msgpack')
    if args.resume and os.path.exists(ckpt + '.train'):
        state = trainer.load_train_state(ckpt, rt.params)
        logger.info('resumed full training state at step %d',
                    int(state['step']))
    else:
        state = trainer.init_state(rt.params)
        if args.init_checkpoint:
            logger.warning(
                'starting from params only: optimizer moments, LR-schedule '
                'step and EMA are fresh (use --resume with a .train '
                'checkpoint to continue training exactly)')
    data_iter = batch_iterator(args.data_dir, names, rt.data_config,
                               args.batch_size, args.is_cluster_idx,
                               args.seed, reduce_num=args.reduce_num)
    if args.prefetch > 0:
        from abx_tpu.data.pipeline import prefetch
        from abx_tpu.parallel import mesh as mesh_lib
        # Put batches ahead WITH the training sharding, so the producer's
        # H2D copy lands each shard on its device directly (a default
        # device_put would stage the whole batch on device 0 and re-shard
        # every step, ADVICE r4).  Multi-host: device_put to
        # non-addressable devices fails — fall back to host prefetch only.
        n_dev = trainer.mesh.devices.size
        put_ahead = (jax.process_count() == 1
                     and args.batch_size % n_dev == 0)
        data_iter = prefetch(
            data_iter, size=args.prefetch, device_put_ahead=put_ahead,
            device=(mesh_lib.batch_sharding(trainer.mesh)
                    if put_ahead else None))
    # --num_steps is the TOTAL step target: a resumed run finishes the
    # remainder instead of appending num_steps more.
    remaining = max(args.num_steps - int(state['step']), 0)
    if remaining < args.num_steps:
        logger.info('resuming at step %d: %d steps remain to the %d target',
                    int(state['step']), remaining, args.num_steps)
    trainer.fit(state, data_iter, remaining,
                jax.random.PRNGKey(args.seed), checkpoint_path=ckpt,
                metrics_path=os.path.join(args.output_dir, 'metrics.csv'))


if __name__ == '__main__':
    main()
