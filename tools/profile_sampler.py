"""Per-op TPU profile of the flagship sampler (perf tooling, repo-internal).

Runs a short steady-state sampling scan under jax.profiler and aggregates
the device-plane events into a per-op-category table — the data behind the
ROADMAP performance backlog.  Usage:

    BENCH_NUM_T=20 python tools/profile_sampler.py [--esm]

Prints total device time per step and the top op buckets.
"""

from __future__ import annotations

import collections
import glob
import os
import re
import sys
import time

import jax
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_workload(trace_dir: str):
    num_t = int(os.environ.get('BENCH_NUM_T', 20))
    batch = int(os.environ.get('BENCH_BATCH', 4))
    esm = '--esm' in sys.argv[1:]

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

    t0 = time.time()
    out = sampler.sample(rt.params, feats, jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    print(f'compile+first: {time.time() - t0:.1f}s', flush=True)

    t0 = time.time()
    out = sampler.sample(rt.params, feats, jax.random.PRNGKey(1))
    jax.block_until_ready(out)
    steady = time.time() - t0
    print(f'steady: {steady:.3f}s for {num_t} steps '
          f'-> {steady / num_t * 1e3:.1f} ms/step '
          f'({batch / steady * num_t:.1f} steps/s at B={batch})', flush=True)

    with jax.profiler.trace(trace_dir):
        out = sampler.sample(rt.params, feats, jax.random.PRNGKey(2))
        jax.block_until_ready(out)
    return num_t, steady


def _categorize(name: str, long_name: str) -> str:
    ln = long_name
    if name.startswith('while'):
        return 'while(container)'
    if 'triangle_attention_fused' in name:
        return 'pallas:tri_attention'
    if '= (bf16' in ln or 'custom-call' in name:
        return 'custom-call'
    if ' dot(' in ln or 'convolution' in ln:
        return 'matmul'
    if 'fusion' in name and ('%dot' in ln or 'dot(' in ln):
        return 'matmul'
    if name.startswith('copy') or 'transpose' in ln:
        return 'copy/transpose'
    if 'gather' in ln or ('dynamic-slice' in ln and 'fusion' in name):
        return 'gather'
    if 'reduce' in name or 'reduce(' in ln or 'reduce-window' in ln:
        return 'reduce(LN/softmax)'
    if 'rng' in ln:
        return 'rng'
    return 'elementwise/other'


def parse_trace(trace_dir: str, num_t: int, top: int = 45):
    import gzip
    import json as _json
    paths = sorted(glob.glob(os.path.join(
        trace_dir, 'plugins/profile/*/*.trace.json.gz')))
    assert paths, f'no trace.json.gz under {trace_dir}'
    with gzip.open(paths[-1]) as f:
        data = _json.load(f)

    # Find the device pid and the 'XLA Ops' tid.
    pid = tid = None
    for e in data['traceEvents']:
        if e.get('ph') == 'M' and e.get('name') == 'process_name' \
                and 'TPU' in e['args'].get('name', ''):
            pid = e['pid']
    for e in data['traceEvents']:
        if e.get('ph') == 'M' and e.get('name') == 'thread_name' \
                and e['pid'] == pid and e['args'].get('name') == 'XLA Ops':
            tid = e['tid']

    per_cat = collections.Counter()
    per_name = collections.Counter()
    name_meta = {}
    counts = collections.Counter()
    total = 0.0
    for e in data['traceEvents']:
        if e.get('ph') != 'X' or e.get('pid') != pid or e.get('tid') != tid:
            continue
        name = e['name']
        args = e.get('args', {})
        cat = _categorize(name, args.get('long_name', ''))
        dur = e.get('dur', 0) / 1e6
        if cat == 'while(container)':
            continue  # container op: children counted individually
        total += dur
        per_cat[cat] += dur
        key = args.get('deduplicated_name') or name
        per_name[key] += dur
        counts[key] += 1
        name_meta.setdefault(key, args.get('long_name', '')[:160])
    print(f'\ndevice leaf total: {total:.3f}s  '
          f'({total / num_t * 1e3:.2f} ms/step)')
    print('\nby category (ms/step):')
    for cat, dur in per_cat.most_common():
        print(f'  {dur / num_t * 1e3:8.2f}  {cat}')
    print(f'\ntop {top} deduplicated ops (ms/step, count/step):')
    for name, dur in per_name.most_common(top):
        print(f'  {dur / num_t * 1e3:8.3f}  x{counts[name]/num_t:5.1f}  '
              f'{name}  :: {name_meta[name][:120]}')


def main():
    trace_dir = os.environ.get('TRACE_DIR', '/tmp/abx_trace')
    os.makedirs(trace_dir, exist_ok=True)
    num_t, _ = run_workload(trace_dir)
    # +1 prime step in the scan
    parse_trace(trace_dir, num_t + 1)


if __name__ == '__main__':
    main()
