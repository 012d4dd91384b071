"""AOT-export the jitted sampler to a serialized StableHLO artifact.

Serving story (ROADMAP): remote-tunnel TPU compiles of the full sampler
take minutes; `jax.export` serializes the traced computation once so a
serving process deserializes + compiles from StableHLO without re-tracing
Python (and the persistent XLA compile cache removes the compile too).

    python tools/export_sampler.py --out /tmp/sampler.stablehlo [--tiny]

Round trip is verified in-process: deserialize and run on the same inputs,
assert outputs match the live sampler.
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
    p.add_argument('--out', type=str, required=True)
    p.add_argument('--tiny', action='store_true')
    p.add_argument('--num_t', type=int, default=None)
    p.add_argument('--batch', type=int, default=4)
    p.add_argument('--platform', type=str, default=None)
    p.add_argument('--verify', action='store_true',
                   help='deserialize and check outputs match the live run')
    args = p.parse_args()
    if args.platform:
        jax.config.update('jax_platforms', args.platform)

    from abx_tpu.utils.compile_cache import enable as enable_compile_cache
    enable_compile_cache()

    from abx_tpu.cli import runner
    from abx_tpu.data import dataset as ds
    from abx_tpu.sampling.sampler import Sampler, SamplerConfig

    rt = runner.build_runtime(None, None, tiny=args.tiny, seed=0)
    pdb = os.path.join(REPO, 'testdata', '6ct7_H_L_S.pdb')
    ex = ds.complex_from_pdb(pdb, 'H', 'L', ['S'])
    feats, _ = ds.prepare_example(ex, rt.data_config)
    feats = {k: np.repeat(v[None], args.batch, axis=0)
             for k, v in feats.items()}

    num_t = args.num_t or (4 if args.tiny else 100)
    sampler = Sampler(rt.model, rt.diffuser, rt.config.model,
                      SamplerConfig(num_t=num_t, mode='design',
                                    generate_area='H3'),
                      esm_fn=rt.esm_fn, esm_params=rt.esm_params)

    key = jax.random.PRNGKey(0)
    exported = jax.export.export(sampler._run)(
        rt.params, sampler.esm_params, feats, key, {})
    blob = exported.serialize()
    with open(args.out, 'wb') as f:
        f.write(blob)
    print(f'exported {len(blob) / 1e6:.1f} MB StableHLO -> {args.out} '
          f'(num_t={num_t}, batch={args.batch})')

    if args.verify:
        t0 = time.time()
        rehydrated = jax.export.deserialize(
            open(args.out, 'rb').read())
        out2 = rehydrated.call(rt.params, sampler.esm_params, feats, key,
                               {})
        out1 = sampler.sample(rt.params, feats, key)
        np.testing.assert_allclose(np.asarray(out1['atom14']),
                                   np.asarray(out2['atom14']),
                                   rtol=1e-5, atol=1e-5)
        print(f'round trip verified in {time.time() - t0:.1f}s '
              f'(atom14 match)')


if __name__ == '__main__':
    main()
