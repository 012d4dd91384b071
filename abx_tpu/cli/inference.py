"""Test-set design/optimize/trajectory CLI (reference inference.py).

Iterates a name index over a directory of per-complex .npz files (reference
preprocessing schema) and writes designed PDBs per sample.
"""

from __future__ import annotations

import argparse
import logging
import os

import jax

from abx_tpu.cli import runner
from abx_tpu.data.dataset import shard_names


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--data_dir', type=str, required=True)
    p.add_argument('--name_idx', type=str, required=True)
    p.add_argument('--output_dir', type=str, required=True)
    p.add_argument('--mode', type=str, default='design',
                   choices=['design', 'optimize', 'trajectory'])
    p.add_argument('--model', type=str, default=None)
    p.add_argument('--model_config', type=str, default=None)
    p.add_argument('--num_samples', type=int, default=100)
    p.add_argument('--num_t', type=int, default=None)
    p.add_argument('--generate_area', type=str, default='H3')
    p.add_argument('--optimize_steps', type=int, nargs='+',
                   default=[4, 8, 16, 32, 64])
    p.add_argument('--batch_samples', type=int, default=None)
    p.add_argument('--seed', type=int, default=42)
    p.add_argument('--tiny', action='store_true')
    p.add_argument('--resume', action='store_true',
                   help='skip samples whose output PDB already exists')
    p.add_argument('--esm_checkpoint', type=str, default=None,
                   help='ESM2 weights (.pt fair-esm or converted msgpack)')
    p.add_argument('--esm_reuse_recycles', action='store_true',
                   help='OPT-IN, output-changing: one ESM pass per diffusion '
                        'step, reused across recycle passes (~3x less ESM '
                        'compute; quality eval in docs/ESM.md)')
    p.add_argument('--esm_refresh_every', type=int, default=1,
                   help='OPT-IN, output-changing, needs --esm_reuse_recycles:'
                        ' refresh the cached ESM embedding every k steps '
                        '(further ~k x less ESM compute; docs/ESM.md)')
    p.add_argument('--seq_corrector_steps', type=int, default=0,
                   help='OPT-IN, output-changing: k Gibbs-corrector jumps '
                        'on the sequence track after each predictor step '
                        '(repairs tau-leaping error at reduced --num_t; '
                        'docs/SAMPLING.md)')
    p.add_argument('--bf16', action='store_true',
                   help='bfloat16 trunk compute')
    p.add_argument('--platform', type=str, default=None,
                   help="force a JAX platform (e.g. 'cpu')")
    p.add_argument('--coordinator', type=str, default=None,
                   help='multi-host: coordinator address host:port '
                        '(jax.distributed); requires --num_hosts/--host_id')
    p.add_argument('--num_hosts', type=int, default=None)
    p.add_argument('--host_id', type=int, default=None)
    p.add_argument('--aot_dir', type=str, default=None,
                   help='cache dir of AOT-exported sampler StableHLO '
                        '(skip re-tracing on warm starts)')
    p.add_argument('--verbose', action='store_true')
    args = p.parse_args()

    if args.platform:
        import jax
        jax.config.update('jax_platforms', args.platform)
    if args.coordinator:
        # Multi-host (DCN) initialisation; afterwards jax.process_index()
        # / jax.process_count() drive the complex-list sharding below.
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_hosts, process_id=args.host_id)

    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format='%(asctime)-15s [%(levelname)s] %(message)s')

    with open(args.name_idx, encoding='utf-8') as f:
        name_idx = [x.strip() for x in f if x.strip()]
    # Multi-host: shard the complex list over processes (DCN), samples over
    # the local mesh (ICI) — see abx_tpu/parallel/mesh.py.
    name_idx = shard_names(name_idx, jax.process_index(),
                           jax.process_count())

    rt = runner.build_runtime(args.model_config, args.model, tiny=args.tiny,
                              seed=args.seed, bf16=args.bf16,
                              esm_checkpoint=args.esm_checkpoint)
    complexes = runner.load_complexes(args.data_dir, name_idx, None, rt)
    out_dir = os.path.join(args.output_dir, args.mode)
    runner.run_sampling(
        rt, out_dir, args.mode, complexes, num_samples=args.num_samples,
        generate_area=args.generate_area, num_t=args.num_t,
        opt_steps=args.optimize_steps, seed=args.seed,
        batch_samples=args.batch_samples, resume=args.resume,
        aot_dir=args.aot_dir, esm_reuse_recycles=args.esm_reuse_recycles,
        esm_refresh_every=args.esm_refresh_every,
        seq_corrector_steps=args.seq_corrector_steps)


if __name__ == '__main__':
    main()
