"""A/B perf probe: time the flagship sampler under kernel-flag variants.

Builds the runtime ONCE, then for each `NAME=ENV_ASSIGNMENTS` variant from
the command line constructs a fresh Sampler (flags are read at trace time)
and reports steady-state steps/s.  Keys vary per repetition (the axon layer
caches identical dispatches).

    python tools/perf_probe.py base= tri96=ABX_PALLAS_TRIANGLE:1 \
        [--esm] [--num_t 20] [--batch 4] [--reps 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('variants', nargs='+',
                   help='NAME=VAR:VAL,VAR:VAL env-flag variants')
    p.add_argument('--esm', action='store_true')
    p.add_argument('--num_t', type=int, default=20)
    p.add_argument('--batch', type=int, default=4)
    p.add_argument('--reps', type=int, default=2)
    args = p.parse_args()

    from abx_tpu.utils.compile_cache import enable as enable_compile_cache
    enable_compile_cache()
    from abx_tpu.cli import runner
    from abx_tpu.data import dataset as ds
    from abx_tpu.sampling.sampler import Sampler, SamplerConfig

    rt = runner.build_runtime(None, None, tiny=False, seed=0, bf16=True,
                              esm_random=args.esm)
    pdb = os.path.join(REPO, 'testdata', '6ct7_H_L_S.pdb')
    ex = ds.complex_from_pdb(pdb, 'H', 'L', ['S'])
    feats, _ = ds.prepare_example(ex, rt.data_config)
    feats = {k: np.repeat(v[None], args.batch, axis=0)
             for k, v in feats.items()}

    results = {}
    for spec in args.variants:
        name, _, envs = spec.partition('=')
        saved = {}
        for pair in filter(None, envs.split(',')):
            k, _, v = pair.partition(':')
            saved[k] = os.environ.get(k)
            os.environ[k] = v
        try:
            sampler = Sampler(rt.model, rt.diffuser, rt.config.model,
                              SamplerConfig(num_t=args.num_t, mode='design',
                                            generate_area='H3'),
                              esm_fn=rt.esm_fn, esm_params=rt.esm_params)
            t0 = time.time()
            out = sampler.sample(rt.params, feats, jax.random.PRNGKey(0))
            jax.block_until_ready(out)
            compile_s = time.time() - t0
            t0 = time.time()
            for i in range(args.reps):
                out = sampler.sample(rt.params, feats,
                                     jax.random.PRNGKey(i + 1))
            jax.block_until_ready(out)
            dt = (time.time() - t0) / args.reps
            sps = args.batch * args.num_t / dt
            results[name] = sps
            print(f'{name}: {sps:.2f} batch-steps/s '
                  f'({args.num_t / dt:.2f} wall steps/s, '
                  f'compile {compile_s:.0f}s)', flush=True)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
    print({k: round(v, 2) for k, v in results.items()})


if __name__ == '__main__':
    main()
