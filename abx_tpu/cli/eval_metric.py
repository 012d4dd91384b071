"""Batch RMSD/AAR evaluation over an output directory (reference
eval_metric.py): compares every predicted PDB under `--data_dir` against the
matching ground truth in `<data_dir>/reference/`, writes results.csv.
"""

from __future__ import annotations

import argparse
import csv
import functools
import glob
import logging
import multiprocessing as mp
import os
from typing import Dict, Optional

import numpy as np

from abx_tpu.common import residue_constants as rc
from abx_tpu.data.pdb_io import parse_pdb
from abx_tpu.evaluation.metrics import calc_ab_metrics
from abx_tpu.preprocess.numbering import annotate_domain

logger = logging.getLogger(__name__)


def make_coords(pdb_file: str, heavy_chain: str, light_chain: str):
    """CA coordinates + concatenated sequence + CDR labels for a PDB."""
    chains = parse_pdb(pdb_file)
    ca = rc.atom_order['CA']
    seqs, coords, masks, cdr_defs = [], [], [], []
    for cid, tag in ((heavy_chain, 'H'), (light_chain, 'L')):
        if cid not in chains:
            return None
        data = chains[cid]
        ann = annotate_domain(data.str_seq, tag)
        if ann is None:
            return None
        sl = slice(ann.start, ann.end)
        seqs.append(data.str_seq[sl])
        coords.append(data.coords[sl, ca])
        masks.append(data.coord_mask[sl, ca])
        cdr_defs.append(ann.cdr_def)
    return {
        'seq': ''.join(seqs),
        'coords': np.concatenate(coords),
        'mask': np.concatenate(masks),
        'cdr_def': np.concatenate(cdr_defs),
    }


def eval_one(pred_file: str, ref: Dict) -> Optional[Dict]:
    name = os.path.splitext(os.path.basename(pred_file))[0]
    parts = name.split('_')
    heavy, light = (parts[1], parts[2]) if len(parts) >= 3 else ('H', 'L')
    pred = make_coords(pred_file, heavy, light)
    if pred is None or len(pred['seq']) != len(ref['seq']):
        logger.warning('skip %s (parse/length mismatch)', pred_file)
        return None
    mask = (pred['mask'] > 0) & (ref['mask'] > 0)
    metrics = calc_ab_metrics(ref['coords'], pred['coords'], mask,
                              ref['cdr_def'], ref['seq'], pred['seq'])
    metrics['name'] = name
    metrics['file'] = pred_file
    return metrics


def eval_with_energy(pred_file: str, ref: Dict,
                     energy: bool = False) -> Optional[Dict]:
    m = eval_one(pred_file, ref)
    if m is not None and energy:
        from abx_tpu.evaluation.relax import interface_energy
        name = os.path.splitext(os.path.basename(pred_file))[0]
        parts = name.split('_')
        ab = parts[1:3] if len(parts) >= 3 else ['H', 'L']
        ag = parts[3].split('|') if len(parts) > 3 else []
        try:
            e, backend = interface_energy(pred_file, ab, ag)
            m['interface_energy'] = e
            m['energy_backend'] = backend
        except Exception as exc:
            logger.warning('energy failed for %s: %s', pred_file, exc)
    return m


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--data_dir', type=str, required=True)
    p.add_argument('--output_csv', type=str, default=None)
    p.add_argument('--energy', action='store_true',
                   help='also compute interface energy (PyRosetta ref2015 '
                        'when available, else LJ proxy)')
    p.add_argument('--cpus', type=int, default=1)
    p.add_argument('--verbose', action='store_true')
    args = p.parse_args()
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO)

    ref_dir = os.path.join(args.data_dir, 'reference')
    refs = {}
    for f in glob.glob(os.path.join(ref_dir, '*.pdb')):
        name = os.path.splitext(os.path.basename(f))[0]
        parts = name.split('_')
        heavy, light = (parts[1], parts[2]) if len(parts) >= 3 else ('H', 'L')
        ref = make_coords(f, heavy, light)
        if ref is not None:
            refs[name] = ref

    pred_files = sorted(
        set(glob.glob(os.path.join(args.data_dir, '**', '*.pdb'),
                      recursive=True))
        - set(glob.glob(os.path.join(ref_dir, '*.pdb'))))

    jobs = []
    for f in pred_files:
        name = os.path.splitext(os.path.basename(f))[0].split('@')[0]
        if name in refs:
            jobs.append((f, refs[name]))

    worker = functools.partial(eval_with_energy, energy=args.energy)
    if args.cpus > 1:
        # eval_with_energy is module-level so the pool can pickle it
        # (--energy and --cpus compose).
        with mp.Pool(args.cpus) as pool:
            results = pool.starmap(worker, jobs)
    else:
        results = [worker(*j) for j in jobs]
    results = [r for r in results if r]

    if not results:
        logger.warning('no results')
        return

    csv_path = args.output_csv or os.path.join(args.data_dir, 'results.csv')
    keys = sorted({k for r in results for k in r})
    with open(csv_path, 'w', newline='', encoding='utf-8') as f:
        writer = csv.DictWriter(f, fieldnames=keys)
        writer.writeheader()
        writer.writerows(results)

    for metric in ['full_rmsd', 'h3_rmsd', 'h3_aar']:
        vals = [r[metric] for r in results if metric in r]
        if vals:
            print(f'{metric}: mean={np.mean(vals):.3f} n={len(vals)}')
    print(f'wrote {csv_path}')


if __name__ == '__main__':
    main()
