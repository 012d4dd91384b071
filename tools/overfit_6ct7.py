"""Trainer validation: overfit the flagship model on one complex (6ct7).

VERDICT round-1 item 5: prove the reconstructed loss stack actually trains —
overfit H3 design on 6ct7_H_L_S until the sampled H3 RMSD/AAR on the
training complex is good, with EMA evaluation and cosine LR decay.

Artifacts (committed): runs/overfit_6ct7/metrics.csv (training curve),
runs/overfit_6ct7/result.json (end-state sampled H3 RMSD/AAR).

    python tools/overfit_6ct7.py [--steps 2500] [--batch 2] [--tiny]
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
    p.add_argument('--steps', type=int, default=2500)
    p.add_argument('--batch', type=int, default=2)
    p.add_argument('--num_samples', type=int, default=4)
    p.add_argument('--num_t', type=int, default=50)
    p.add_argument('--lr', type=float, default=5e-4)
    p.add_argument('--generate_area', type=str, default='H3',
                   help="'H3' or 'cdr' (all six CDRs co-design)")
    p.add_argument('--tiny', action='store_true')
    p.add_argument('--exact_elbo', action='store_true',
                   help='train the sequence loss with the exact tau-leaping '
                        'CTMC ELBO instead of the CE surrogate')
    p.add_argument('--esm_random', action='store_true',
                   help='condition on a frozen random-weight ESM2 encoder '
                        '(real weights absent from this environment); '
                        'shape via --esm_layers/--esm_dim')
    p.add_argument('--esm_layers', type=int, default=6)
    p.add_argument('--esm_dim', type=int, default=320)
    p.add_argument('--eval_esm_reuse', action='store_true',
                   help='after training, EMA-eval with esm_reuse_recycles '
                        'ON and OFF and record both (quality study for the '
                        'opt-in sampler flag)')
    p.add_argument('--eval_esm_refresh', type=int, nargs='*', default=[],
                   help='additionally EMA-eval esm_refresh_every at these '
                        'k values (each implies esm_reuse_recycles)')
    p.add_argument('--eval_corrector', type=int, nargs='*', default=[],
                   help='additionally EMA-eval the sequence Gibbs corrector '
                        '(opt-in seq_corrector_steps) at these REDUCED num_t '
                        'values, corrector off vs k=2 for each — the '
                        'corrector claim is quality retention at fewer '
                        'steps (docs/SAMPLING.md)')
    p.add_argument('--eval_fast_recipe', action='store_true',
                   help='additionally EMA-eval the COMPOSED fast recipe '
                        '(num_t=25 + corrector k=2 + esm_reuse + '
                        'refresh_every=8) exactly as benched in bench.py '
                        'fast_recipe_t25 — the combined rung needs its own '
                        'quality row (VERDICT r4 weak 6)')
    p.add_argument('--eval_only', action='store_true',
                   help='skip training; load <out>/params.msgpack (the EMA '
                        'weights of a previous run) and just run the evals')
    p.add_argument('--platform', type=str, default=None)
    p.add_argument('--out', type=str,
                   default=os.path.join(REPO, 'runs', 'overfit_6ct7'))
    args = p.parse_args()
    if args.platform:
        jax.config.update('jax_platforms', args.platform)

    from abx_tpu.utils.compile_cache import enable as enable_compile_cache
    enable_compile_cache()

    from abx_tpu.cli import runner
    from abx_tpu.data import dataset as ds
    from abx_tpu.evaluation import metrics as eval_metrics
    from abx_tpu.sampling.sampler import Sampler, SamplerConfig
    from abx_tpu.train.trainer import TrainConfig, Trainer
    from abx_tpu.utils import checkpoint as ckpt_lib

    os.makedirs(args.out, exist_ok=True)
    rt = runner.build_runtime(None, None, tiny=args.tiny, seed=0,
                              esm_random=args.esm_random,
                              esm_layers=args.esm_layers,
                              esm_dim=args.esm_dim)
    if args.exact_elbo:
        with rt.config.unlocked():
            rt.config.loss.diffusion_seq.config.exact_elbo = True

    pdb = os.path.join(REPO, 'testdata', '6ct7_H_L_S.pdb')
    ex = ds.complex_from_pdb(pdb, 'H', 'L', ['S'])
    feats, _ = ds.prepare_example(ex, rt.data_config)
    batch = {k: np.repeat(v[None], args.batch, axis=0)
             for k, v in feats.items()}

    def data_iter():
        while True:
            yield dict(batch)

    if args.eval_only:
        # params.msgpack holds the EMA weights of the prior run (_save).
        ema = ckpt_lib.load_params(os.path.join(args.out, 'params.msgpack'))
    else:
        trainer = Trainer(
            rt.model, rt.diffuser, rt.config.model, rt.config.loss,
            TrainConfig(learning_rate=args.lr, warmup_steps=100,
                        decay_steps=max(args.steps - 100, 1),
                        generate_area=args.generate_area, log_every=50,
                        ema_decay=0.999,
                        checkpoint_every=args.steps),
            esm_fn=rt.esm_fn, esm_params=rt.esm_params)
        state = trainer.init_state(rt.params)
        state = trainer.fit(
            state, data_iter(), args.steps, jax.random.PRNGKey(0),
            checkpoint_path=os.path.join(args.out, 'params.msgpack'),
            metrics_path=os.path.join(args.out, 'metrics.csv'))

        # ---- EMA-eval: sample H3 designs on the training complex.
        ema = {'params': state.get('ema_params', state['params'])['params']}
    # Sample in chunks: the fused IPA attention kernel's scoped VMEM grows
    # with batch and f32 B>=8 exceeds the 16M limit (B=32: 27.4M, B=8:
    # 17.8M); B=4 is the shape every prior f32 eval ran.  One compiled
    # program per config, re-invoked per chunk with fresh keys.
    eval_chunk = min(args.num_samples, 4)
    sfeats = {k: np.repeat(v[None], eval_chunk, axis=0)
              for k, v in feats.items()}
    gt_ca = np.asarray(feats['atom14_gt_positions'][:, 1])   # (L, 3)
    gt_seq = np.asarray(feats['seq'])

    def eval_samples(esm_reuse=False, refresh_every=1, num_t=None,
                     corrector_steps=0):
        scfg = SamplerConfig(num_t=num_t or args.num_t, mode='design',
                             generate_area=args.generate_area,
                             esm_reuse_recycles=esm_reuse,
                             esm_refresh_every=refresh_every,
                             seq_corrector_steps=corrector_steps)
        sampler = Sampler(rt.model, rt.diffuser, rt.config.model, scfg,
                          esm_fn=rt.esm_fn, esm_params=rt.esm_params)
        rows = []
        tag = ('  [esm_reuse]' if esm_reuse else '') + (
            f'  [refresh_k={refresh_every}]' if refresh_every > 1 else '') + (
            f'  [num_t={num_t}]' if num_t else '') + (
            f'  [corrector_k={corrector_steps}]' if corrector_steps else '')
        for c0 in range(0, args.num_samples, eval_chunk):
            out = sampler.sample(ema, sfeats, jax.random.PRNGKey(1 + c0))
            mask = np.asarray(out['diffuse_mask'][0]) > 0
            for j in range(min(eval_chunk, args.num_samples - c0)):
                i = c0 + j
                pred_ca = np.asarray(out['atom14'][j, :, 1])
                # Framework fixed in place -> direct (unaligned) RMSD.
                rmsd = float(np.sqrt(np.mean(np.sum(
                    (pred_ca[mask] - gt_ca[mask]) ** 2, -1))))
                aar = float(np.mean(
                    np.asarray(out['seq'][j])[mask] == gt_seq[mask]))
                rows.append({'sample': i, 'h3_rmsd': rmsd, 'h3_aar': aar})
                print(f'sample {i}: {args.generate_area} rmsd={rmsd:.3f} A  '
                      f'aar={aar:.3f}' + tag)
        return rows

    def summarize(rows):
        """Mean +- 95% CI (VERDICT r4 weak 1: the eval instrument must
        carry error bars smaller than the effects it claims)."""
        rmsds = np.asarray([r['h3_rmsd'] for r in rows])
        aars = np.asarray([r['h3_aar'] for r in rows])
        n = len(rows)
        ci = 1.96 / np.sqrt(n) if n > 1 else float('nan')
        return {
            'n': n,
            'h3_rmsd_best': float(rmsds.min()),
            'h3_rmsd_mean': float(rmsds.mean()),
            'h3_rmsd_ci95': float(rmsds.std(ddof=1) * ci) if n > 1 else None,
            'h3_aar_best': float(aars.max()),
            'h3_aar_mean': float(aars.mean()),
            'h3_aar_ci95': float(aars.std(ddof=1) * ci) if n > 1 else None,
            'samples': rows,
        }

    rows = eval_samples()

    result = {
        'steps': args.steps,
        'exact_elbo': args.exact_elbo,
        'esm': ({'random_weights': True, 'layers': args.esm_layers,
                 'dim': args.esm_dim} if args.esm_random else False),
        'generate_area': args.generate_area,
        'h3_rmsd_best': min(r['h3_rmsd'] for r in rows),
        'h3_rmsd_mean': float(np.mean([r['h3_rmsd'] for r in rows])),
        'h3_aar_best': max(r['h3_aar'] for r in rows),
        'h3_aar_mean': float(np.mean([r['h3_aar'] for r in rows])),
        'samples': rows,
        'tiny': args.tiny,
    }
    if args.eval_only:
        # Merge onto the training run's record instead of clobbering it.
        prior_path = os.path.join(args.out, 'result.json')
        if os.path.exists(prior_path):
            with open(prior_path) as f:
                prior = json.load(f)
            prior.update({k: v for k, v in result.items()
                          if k not in prior or k.startswith('h3_')})
            result = prior
    if args.eval_esm_reuse:
        result['esm_reuse'] = summarize(eval_samples(esm_reuse=True))
    for k in args.eval_esm_refresh:
        result[f'esm_refresh_k{k}'] = summarize(
            eval_samples(esm_reuse=True, refresh_every=k))
    for nt in args.eval_corrector:
        result[f'corrector_t{nt}_off'] = summarize(
            eval_samples(num_t=nt, corrector_steps=0))
        result[f'corrector_t{nt}_k2'] = summarize(
            eval_samples(num_t=nt, corrector_steps=2))
    if args.eval_fast_recipe:
        result['fast_recipe_t25'] = summarize(eval_samples(
            esm_reuse=True, refresh_every=8, num_t=25, corrector_steps=2))
    with open(os.path.join(args.out, 'result.json'), 'w') as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != 'samples'}))


if __name__ == '__main__':
    main()
