"""Measure Picard parallel-in-time sampling at production shape (VERDICT r4
item 3 / weak 4): sweeps-to-fixpoint, wall per sweep, HBM high-water, and
the implied latency-vs-sequential on a v5e-8 time-sharded mesh.

The module's value proposition (sampling/picard.py:26-33) is wall-clock
latency ~ sweeps_used/D x sequential for a SINGLE design on D chips; it
only holds if sweeps_used << num_t.  This probe measures sweeps_used on the
real chip at the flagship shape (L=288, B=1, bf16, no-ESM trunk) for
num_t in {25, 100} at tol=0 (bitwise fixpoint) and tol=1e-4, plus the
sequential scan baseline, and writes runs/picard_probe/result.json for
BASELINE.md.

    python tools/probe_picard.py [--num_t 25 100] [--tiny]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def hbm_peak_gb():
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get('peak_bytes_in_use') or stats.get('bytes_in_use')
        return round(peak / 2**30, 2) if peak else None
    except Exception:
        return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--num_t', type=int, nargs='*', default=[25, 100])
    p.add_argument('--batch', type=int, default=1)
    p.add_argument('--tiny', action='store_true')
    p.add_argument('--no_bf16', action='store_true')
    p.add_argument('--out', type=str,
                   default=os.path.join(REPO, 'runs', 'picard_probe'))
    args = p.parse_args()

    from abx_tpu.cli import runner
    from abx_tpu.data import dataset as ds
    from abx_tpu.sampling.picard import draw_noise, picard_sample
    from abx_tpu.sampling.sampler import Sampler, SamplerConfig
    from abx_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()
    rt = runner.build_runtime(None, None, tiny=args.tiny, seed=0,
                              bf16=not args.no_bf16)
    pdb = os.path.join(REPO, 'testdata', '6ct7_H_L_S.pdb')
    ex = ds.complex_from_pdb(pdb, 'H', 'L', ['S'])
    feats, _ = ds.prepare_example(ex, rt.data_config)
    feats = {k: np.repeat(v[None], args.batch, axis=0)
             for k, v in feats.items()}

    results = {'device': str(jax.devices()[0]),
               'shape': {'batch': args.batch,
                         'L': int(feats['seq'].shape[1]),
                         'bf16': not args.no_bf16, 'esm': False},
               'configs': {}}
    for num_t in args.num_t:
        entry = {}
        scfg = SamplerConfig(num_t=num_t, mode='design',
                             generate_area='H3')
        sampler = Sampler(rt.model, rt.diffuser, rt.config.model, scfg)

        # -- sequential baseline (the scan path Picard competes with) ------
        t0 = time.time()
        out = sampler.sample(rt.params, feats, jax.random.PRNGKey(0))
        jax.block_until_ready(out)
        entry['seq_compile_s'] = round(time.time() - t0, 1)
        t0 = time.time()
        out = sampler.sample(rt.params, feats, jax.random.PRNGKey(1))
        jax.block_until_ready(out)
        seq_wall = time.time() - t0
        entry['sequential_wall_s'] = round(seq_wall, 3)

        # Shared noise so the Picard result is comparable/exact.
        n = int(sampler.reverse_steps.shape[0]) + 1  # + prime slot
        b, l = feats['seq'].shape
        noise = draw_noise(jax.random.PRNGKey(2), n, b, l)

        for tol_name, tol in (('tol0', 0.0), ('tol1e-4', 1e-4)):
            try:
                t0 = time.time()
                res = picard_sample(sampler, rt.params, feats,
                                    jax.random.PRNGKey(3), noise=noise,
                                    tol=tol)
                wall_cold = time.time() - t0
                sweeps = res['picard']['sweeps']
                # Steady-state: per-sweep wall without compile.
                t0 = time.time()
                res2 = picard_sample(sampler, rt.params, feats,
                                     jax.random.PRNGKey(3), noise=noise,
                                     tol=tol)
                wall_warm = time.time() - t0
                per_sweep = wall_warm / max(res2['picard']['sweeps'], 1)
                entry[tol_name] = {
                    'sweeps': sweeps,
                    'grid_len': n,
                    'wall_s': round(wall_warm, 3),
                    'wall_cold_s': round(wall_cold, 1),
                    'per_sweep_s': round(per_sweep, 3),
                    'deltas_first8': [round(d, 6)
                                      for d in res2['picard']['deltas'][:8]],
                    'hbm_peak_gb': hbm_peak_gb(),
                    # one-chip sweep does n positions serially-in-HW; on a
                    # D-way time-sharded mesh each device evaluates ~n/D
                    # positions, so sweep wall ~ per_sweep/D + boundary
                    # exchange => projected v5e-8 latency:
                    'projected_v5e8_wall_s': round(
                        res2['picard']['sweeps'] * per_sweep / 8, 3),
                    'latency_vs_sequential_v5e8': round(
                        seq_wall / (res2['picard']['sweeps'] * per_sweep / 8),
                        3),
                }
                if tol == 0.0:
                    # Exactness at the fixpoint: compare against the
                    # sequential sampler under the SAME injected noise.
                    out_same = sampler.sample(rt.params, feats,
                                              jax.random.PRNGKey(3),
                                              noise=noise)
                    seq_match = bool(np.array_equal(
                        np.asarray(res['seq']), np.asarray(out_same['seq'])))
                    atom_dev = float(np.max(np.abs(
                        np.asarray(res['atom14'], np.float32)
                        - np.asarray(out_same['atom14'], np.float32))))
                    entry[tol_name]['seq_matches_sequential'] = seq_match
                    entry[tol_name]['atom14_max_dev_A'] = round(atom_dev, 6)
            except Exception as e:  # OOM etc. — record, keep probing
                entry[tol_name] = {'error': f'{type(e).__name__}: {e}'[:300]}
        results['configs'][f't{num_t}'] = entry
        print(json.dumps({f't{num_t}': entry}))

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, 'result.json'), 'w',
              encoding='utf-8') as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
