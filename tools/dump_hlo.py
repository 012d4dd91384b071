"""Dump the TPU-compiled optimized HLO of the flagship sampler.

Perf tooling: the per-op profile (tools/profile_sampler.py) names hot ops
by their deduplicated fusion names (e.g. `fusion.4197`); this dump lets us
map those names back to the source computation to pick kernel-fusion
targets.  Usage:

    python tools/dump_hlo.py [--esm] [out.txt]
"""

from __future__ import annotations

import os
import sys

import jax
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    esm = '--esm' in sys.argv[1:]
    args = [a for a in sys.argv[1:] if not a.startswith('--')]
    out_path = args[0] if args else '/tmp/sampler_hlo.txt'
    num_t = int(os.environ.get('BENCH_NUM_T', 20))
    batch = int(os.environ.get('BENCH_BATCH', 4))

    from abx_tpu.utils.compile_cache import enable as enable_compile_cache
    enable_compile_cache()
    from abx_tpu.cli import runner
    from abx_tpu.data import dataset as ds
    from abx_tpu.sampling.sampler import Sampler, SamplerConfig

    rt = runner.build_runtime(None, None, tiny=False, seed=0, bf16=True,
                              esm_random=esm)
    pdb = os.path.join(REPO, 'testdata', '6ct7_H_L_S.pdb')
    ex = ds.complex_from_pdb(pdb, 'H', 'L', ['S'])
    feats, _ = ds.prepare_example(ex, rt.data_config)
    feats = {k: np.repeat(v[None], batch, axis=0) for k, v in feats.items()}

    scfg = SamplerConfig(num_t=num_t, mode='design', generate_area='H3')
    sampler = Sampler(rt.model, rt.diffuser, rt.config.model, scfg,
                      esm_fn=rt.esm_fn, esm_params=rt.esm_params)
    lowered = sampler._run.lower(
        rt.params, rt.esm_params, feats, jax.random.PRNGKey(0), {})
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(out_path, 'w') as f:
        f.write(txt)
    print(f'wrote {len(txt) / 1e6:.1f} MB to {out_path}')


if __name__ == '__main__':
    main()
