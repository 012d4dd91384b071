"""Re-validate the kernel stack's end-to-end quality after kernel changes.

Evaluates the f32-trained overfit model (runs/overfit_6ct7) in bf16 with
EVERY currently-default kernel active, using the same sampling protocol and
seed as tools/overfit_6ct7.py's eval (num_t=50, 4 samples, PRNGKey(1)), and
compares per-sample H3 RMSD/AAR against the stored f32 eval
(runs/overfit_6ct7/bf16_kernel_eval.json, `f32_h3_rmsd_per_sample`).

Run on the TPU after adding or changing any ops/ kernel; the committed
artifact is the proof the performance stack stayed quality-neutral.

    python tools/revalidate_kernels.py [--tag r3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--run_dir', default=os.path.join(REPO, 'runs',
                                                     'overfit_6ct7'))
    p.add_argument('--num_t', type=int, default=50)
    p.add_argument('--num_samples', type=int, default=4)
    p.add_argument('--tag', default='r3',
                   help='suffix for the output artifact')
    p.add_argument('--platform', default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update('jax_platforms', args.platform)

    from abx_tpu.cli import runner
    from abx_tpu.data import dataset as ds
    from abx_tpu.sampling.sampler import Sampler, SamplerConfig

    baseline_path = os.path.join(args.run_dir, 'bf16_kernel_eval.json')
    with open(baseline_path) as f:
        baseline = json.load(f)
    f32_rmsd = baseline['f32_h3_rmsd_per_sample']

    rt = runner.build_runtime(
        None, os.path.join(args.run_dir, 'params.msgpack'), bf16=True,
        seed=0)
    pdb = os.path.join(REPO, 'testdata', '6ct7_H_L_S.pdb')
    ex = ds.complex_from_pdb(pdb, 'H', 'L', ['S'])
    feats, _ = ds.prepare_example(ex, rt.data_config)

    scfg = SamplerConfig(num_t=args.num_t, mode='design', generate_area='H3')
    sampler = Sampler(rt.model, rt.diffuser, rt.config.model, scfg,
                      esm_fn=rt.esm_fn, esm_params=rt.esm_params)
    sfeats = {k: np.repeat(v[None], args.num_samples, axis=0)
              for k, v in feats.items()}
    out = sampler.sample(rt.params, sfeats, jax.random.PRNGKey(1))

    gt_ca = np.asarray(feats['atom14_gt_positions'][:, 1])
    mask = np.asarray(out['diffuse_mask'][0]) > 0
    gt_seq = np.asarray(feats['seq'])
    rmsds, aars = [], []
    for i in range(args.num_samples):
        pred_ca = np.asarray(out['atom14'][i, :, 1])
        rmsds.append(float(np.sqrt(np.mean(np.sum(
            (pred_ca[mask] - gt_ca[mask]) ** 2, -1)))))
        aars.append(float(np.mean(
            np.asarray(out['seq'][i])[mask] == gt_seq[mask])))
        print(f'sample {i}: rmsd={rmsds[-1]:.3f} A (f32 {f32_rmsd[i]:.3f})'
              f'  aar={aars[-1]:.3f}')

    deltas = [abs(a - b) for a, b in zip(rmsds, f32_rmsd)]
    result = {
        'what': (f'bf16 + full kernel stack ({args.tag}) eval of the '
                 'f32-trained overfit model, same seeds, '
                 f'num_t={args.num_t}, B={args.num_samples}, one v5e chip'),
        'f32_h3_rmsd_per_sample': [round(r, 3) for r in f32_rmsd],
        'bf16_h3_rmsd_per_sample': [round(r, 3) for r in rmsds],
        'f32_h3_rmsd_mean': round(float(np.mean(f32_rmsd)), 3),
        'bf16_h3_rmsd_mean': round(float(np.mean(rmsds)), 3),
        'max_per_sample_delta': round(max(deltas), 3),
        'aar_mean': round(float(np.mean(aars)), 3),
    }
    out_path = os.path.join(args.run_dir,
                            f'bf16_kernel_eval_{args.tag}.json')
    with open(out_path, 'w') as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    ok = max(deltas) <= 0.05 and float(np.mean(aars)) >= 0.99
    print('QUALITY', 'OK' if ok else 'REGRESSED')
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
