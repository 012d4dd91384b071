"""Sequence plausibility (masked pseudo-log-likelihood) over designed PDBs.

Parity surface: /root/reference/eval/metric_scripts/calculate_pll.py
(AntiBERTy pLL) — computed here with any converted ESM2-family LM
(`--esm_checkpoint`); requires the checkpoint to contain the LM head.
"""

from __future__ import annotations

import argparse
import csv
import glob
import logging
import os

import numpy as np

from abx_tpu.data.pdb_io import parse_pdb

logger = logging.getLogger(__name__)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--data_dir', type=str, required=True)
    p.add_argument('--esm_checkpoint', type=str, required=True)
    p.add_argument('--num_layers', type=int, default=36)
    p.add_argument('--embed_dim', type=int, default=2560)
    p.add_argument('--num_heads', type=int, default=None,
                   help='override the released-size head-count table')
    p.add_argument('--output_csv', type=str, default=None)
    p.add_argument('--platform', type=str, default=None)
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update('jax_platforms', args.platform)
    logging.basicConfig(level=logging.INFO)

    import jax
    from abx_tpu.evaluation.pll import masked_pll
    from abx_tpu.models.esm import ESM2, ESM2Config, ESM2LMHead, esm2_num_heads
    from abx_tpu.utils.torch_convert import convert_esm2_ckpt

    cfg = ESM2Config(num_layers=args.num_layers, embed_dim=args.embed_dim,
                     attention_heads=esm2_num_heads(args.embed_dim,
                                                    override=args.num_heads))
    params = convert_esm2_ckpt(args.esm_checkpoint, cfg.num_layers)
    if 'lm_head' not in params['params']:
        raise SystemExit('checkpoint has no lm_head weights; PLL needs the '
                         'full masked-LM checkpoint')
    lm_params = {'params': params['params'].pop('lm_head')}
    embed_weight = params['params']['embed_tokens']['embedding']
    esm_model = ESM2(cfg)
    lm_head = ESM2LMHead(cfg)

    def lm_head_fn(features):
        return lm_head.apply(lm_params, features, embed_weight=embed_weight)

    rows = []
    for f in sorted(glob.glob(os.path.join(args.data_dir, '**', '*.pdb'),
                              recursive=True)):
        if 'reference' in f:
            continue
        name = os.path.splitext(os.path.basename(f))[0]
        parts = name.split('_')
        ab_chains = parts[1:3] if len(parts) >= 3 else ['H', 'L']
        chains = parse_pdb(f)
        for cid in ab_chains:
            if cid not in chains:
                continue
            pll = masked_pll(esm_model, params, lm_head_fn,
                             chains[cid].str_seq)
            rows.append({'name': name, 'chain': cid, 'pll': pll, 'file': f})
            logger.info('%s %s: pll=%.4f', name, cid, pll)
    if rows:
        csv_path = args.output_csv or os.path.join(args.data_dir, 'pll.csv')
        with open(csv_path, 'w', newline='', encoding='utf-8') as fh:
            w = csv.DictWriter(fh, fieldnames=sorted(rows[0]))
            w.writeheader()
            w.writerows(rows)
        print(f"mean pll: {np.mean([r['pll'] for r in rows]):.4f}; "
              f"wrote {csv_path}")


if __name__ == '__main__':
    main()
