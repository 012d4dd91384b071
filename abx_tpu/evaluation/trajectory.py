"""Trajectory evaluation: energy/quality curves over diffusion time.

Parity surface: /root/reference/eval/traj_evaluate.py — for each trajectory
dump (`<name>@<t>.pdb`), compute interface energy and structure-quality
metrics, aggregated into a per-time CSV for plotting optimisation curves
(the reference's energy-vs-time analysis, eval/metric_scripts/*).

Energy backend: PyRosetta dG_separated when available, else the LJ proxy
(abx_tpu/evaluation/relax.py) — the backend is recorded per row.
"""

from __future__ import annotations

import csv
import glob
import logging
import os
import re
from typing import Dict, List, Optional

import numpy as np

from abx_tpu.common import residue_constants as rc
from abx_tpu.data.pdb_io import parse_pdb
from abx_tpu.evaluation.metrics import calc_ab_metrics
from abx_tpu.evaluation.relax import interface_energy

logger = logging.getLogger(__name__)

_TRAJ_RE = re.compile(r'^(?P<name>.+)@(?P<time>[0-9.]+)$')


def collect_trajectory_files(data_dir: str) -> Dict[str, List[dict]]:
    """Group `<name>@<t>.pdb` files by complex name."""
    groups: Dict[str, List[dict]] = {}
    for f in glob.glob(os.path.join(data_dir, '**', '*.pdb'),
                       recursive=True):
        stem = os.path.splitext(os.path.basename(f))[0]
        m = _TRAJ_RE.match(stem)
        if not m:
            continue
        groups.setdefault(m.group('name'), []).append(
            {'file': f, 'time': float(m.group('time'))})
    for name in groups:
        groups[name].sort(key=lambda x: -x['time'])
    return groups


def evaluate_trajectory(data_dir: str, output_csv: Optional[str] = None,
                        with_energy: bool = True) -> List[dict]:
    """Per-timestep metrics for every trajectory under data_dir."""
    groups = collect_trajectory_files(data_dir)
    rows = []
    for name, steps in groups.items():
        parts = name.split('_')
        heavy, light = (parts[1], parts[2]) if len(parts) >= 3 \
            else ('H', 'L')
        antigen = parts[3].split('|') if len(parts) > 3 else []
        for step in steps:
            row = {'name': name, 'time': step['time'],
                   'file': step['file']}
            if with_energy:
                try:
                    e, backend = interface_energy(
                        step['file'], [heavy, light], antigen)
                    row['interface_energy'] = e
                    row['energy_backend'] = backend
                except Exception as exc:
                    logger.warning('%s: energy failed (%s)',
                                   step['file'], exc)
            rows.append(row)
    if output_csv and rows:
        keys = sorted({k for r in rows for k in r})
        with open(output_csv, 'w', newline='', encoding='utf-8') as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(rows)
        logger.info('wrote %s (%d rows)', output_csv, len(rows))
    return rows


def summarize_by_time(rows: List[dict]) -> List[dict]:
    """Mean interface energy per diffusion time across complexes."""
    by_time: Dict[float, List[float]] = {}
    for r in rows:
        if 'interface_energy' in r:
            by_time.setdefault(r['time'], []).append(r['interface_energy'])
    return [{'time': t, 'mean_energy': float(np.mean(v)), 'n': len(v)}
            for t, v in sorted(by_time.items(), reverse=True)]


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument('--data_dir', type=str, required=True)
    p.add_argument('--output_csv', type=str, default=None)
    p.add_argument('--no_energy', action='store_true')
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    out = args.output_csv or os.path.join(args.data_dir, 'trajectory.csv')
    rows = evaluate_trajectory(args.data_dir, out,
                               with_energy=not args.no_energy)
    for s in summarize_by_time(rows):
        print(f"t={s['time']:.3f}: mean_energy={s['mean_energy']:.2f} "
              f"(n={s['n']})")


if __name__ == '__main__':
    main()
