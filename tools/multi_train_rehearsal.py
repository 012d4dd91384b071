"""Multi-complex training dress rehearsal (VERDICT r4 item 2).

The composed training path — cluster sampling x background prefetch x
static-shape mixed-complex batches x EMA x checkpoint/crash-resume — had
only per-unit tests and single-complex overfit runs.  This tool exercises
the WHOLE path end to end and commits the evidence:

  1. builds a ~16-complex synthetic corpus by procedural CDR mutation +
     length jitter of the two bundled complexes (through the real
     preprocess featurizer, abx_tpu/preprocess/make_data.py), grouped
     into clusters with one held-out variant;
  2. launches the REAL training CLI (python -m abx_tpu.cli.train) as a
     subprocess with --prefetch/--checkpoint_every, then SIGKILLs it
     mid-run after a periodic checkpoint lands;
  3. relaunches with --resume and trains to completion (the resumed run
     continues AdamW moments/LR step/EMA from the .train checkpoint);
  4. EMA-evaluates CDR design quality on the HELD-OUT variant.

Artifacts: runs/multi_train/{metrics.csv, result.json} — result.json
carries the kill/resume timeline with timestamps and the held-out eval.

Cluster semantics match reference abx/data/dataset.py:46-73 (one random
member per cluster per epoch); training config scale per
reference config/config_model.json:148-236.

    python tools/multi_train_rehearsal.py [--steps 300] [--kill_frac 0.5]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import random
import signal
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CDR_ENUMS = (1, 3, 5, 8, 10, 12)
AA = 'ARNDCQEGHILKMFPSTWYV'


def make_variant(feats, rng, n_mut=6, max_del=2):
    """Procedurally perturb one complex's npz-schema features.

    Mutations replace CDR residue identities (side-chain coords masked out
    — the backbone stays physical); length jitter deletes up to `max_del`
    residues from inside one CDR loop (all antibody arrays sliced
    consistently, residx keeps the gap like a real indel).
    """
    out = {k: (v.copy() if isinstance(v, np.ndarray) else v)
           for k, v in feats.items()}
    cdr = out['antibody_cdr_def']
    seq = list(out['antibody_str_seq'])

    cdr_pos = np.where(np.isin(cdr, CDR_ENUMS))[0]
    for p in rng.sample(list(cdr_pos), min(n_mut, len(cdr_pos))):
        old = seq[p]
        seq[p] = rng.choice([a for a in AA if a != old])
        out['antibody_coord_mask'][p, 4:] = False  # keep N/CA/C/O only

    n_del = rng.randrange(0, max_del + 1)
    if n_del:
        # Delete from the interior of one CDR (keeps anchors intact).
        loop = rng.choice(CDR_ENUMS)
        loop_pos = np.where(cdr == loop)[0]
        if len(loop_pos) > n_del + 2:
            start = rng.randrange(1, len(loop_pos) - n_del - 1)
            drop = loop_pos[start:start + n_del]
            keep = np.setdiff1d(np.arange(len(seq)), drop)
            seq = [seq[i] for i in keep]
            for k in ('antibody_coords', 'antibody_coord_mask',
                      'antibody_cdr_def', 'antibody_chain_ids',
                      'antibody_residx'):
                out[k] = out[k][keep]
    out['antibody_str_seq'] = ''.join(seq)
    return out


def build_corpus(corpus_dir, seed=0, per_parent=8):
    """16 variants (8 per bundled parent), 4 clusters, 1 held-out."""
    from abx_tpu.data.pdb_io import parse_pdb
    from abx_tpu.preprocess.make_data import make_complex_features

    parents = [
        ('6ct7', 'testdata/6ct7_H_L_S.pdb', 'H', 'L', ['S']),
        ('6qd7', 'testdata/6qd7_X_Z_F|E.pdb', 'X', 'Z', ['F', 'E']),
    ]
    rng = random.Random(seed)
    os.makedirs(corpus_dir, exist_ok=True)
    clusters, names = [], []
    for code, pdb, h, l, ags in parents:
        feats = make_complex_features(
            parse_pdb(os.path.join(REPO, pdb)), h, l, ags)
        assert feats is not None, code
        variants = []
        for vi in range(per_parent):
            name = f'{code}_v{vi}'
            var = make_variant(feats, rng)
            np.savez(os.path.join(corpus_dir, f'{name}.npz'), **var)
            variants.append(name)
        names.extend(variants)
        # Two clusters of 4 per parent (mimics SAbDab seq-identity
        # clusters: same-parent variants are near-identical sequences).
        clusters.append(variants[:per_parent // 2])
        clusters.append(variants[per_parent // 2:])
    holdout = clusters[0].pop()  # held out of training entirely
    cluster_path = os.path.join(corpus_dir, 'clusters.txt')
    with open(cluster_path, 'w', encoding='utf-8') as f:
        for c in clusters:
            f.write(' '.join(c) + '\n')
    return cluster_path, holdout, names


def wait_for_checkpoint(path, proc, min_mtime, timeout=3600):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if proc.poll() is not None:
            raise RuntimeError(f'trainer exited early rc={proc.returncode}')
        if os.path.exists(path) and os.path.getmtime(path) > min_mtime:
            return
        time.sleep(2.0)
    raise TimeoutError(f'no checkpoint at {path} within {timeout}s')


def now():
    return datetime.datetime.now().isoformat(timespec='seconds')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--steps', type=int, default=300)
    p.add_argument('--batch', type=int, default=4)
    p.add_argument('--checkpoint_every', type=int, default=50)
    p.add_argument('--kill_frac', type=float, default=0.5,
                   help='SIGKILL once a checkpoint >= this fraction of '
                        'steps has landed')
    p.add_argument('--lr', type=float, default=5e-4)
    p.add_argument('--num_t', type=int, default=50)
    p.add_argument('--num_samples', type=int, default=4)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--tiny', action='store_true')
    p.add_argument('--platform', type=str, default=None,
                   help="'cpu' forces CPU for BOTH the training "
                        'subprocesses and the in-process eval (the '
                        'environment pins JAX_PLATFORMS via sitecustomize; '
                        'env-var overrides are ignored)')
    p.add_argument('--out', type=str,
                   default=os.path.join(REPO, 'runs', 'multi_train'))
    p.add_argument('--work', type=str, default='/tmp/abx_multi_train')
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    corpus_dir = os.path.join(args.work, 'corpus')
    timeline = []

    timeline.append({'t': now(), 'event': 'corpus_build_start'})
    cluster_path, holdout, names = build_corpus(corpus_dir, seed=args.seed)
    timeline.append({'t': now(), 'event': 'corpus_built',
                     'n_complexes': len(names), 'holdout': holdout})

    # Training runs in the work dir; only metrics/result are committed.
    train_dir = os.path.join(args.work, 'train')
    os.makedirs(train_dir, exist_ok=True)
    metrics_path = os.path.join(train_dir, 'metrics.csv')
    for stale in (metrics_path, os.path.join(train_dir, 'params.msgpack'),
                  os.path.join(train_dir, 'params.msgpack.train'),
                  os.path.join(train_dir, 'params.msgpack.raw')):
        if os.path.exists(stale):
            os.remove(stale)
    base_cmd = [
        sys.executable, '-m', 'abx_tpu.cli.train',
        '--data_dir', corpus_dir, '--name_idx', cluster_path,
        '--is_cluster_idx', '--output_dir', train_dir,
        '--batch_size', str(args.batch), '--num_steps', str(args.steps),
        '--learning_rate', str(args.lr),
        '--decay_steps', str(max(args.steps - 100, 1)),
        '--checkpoint_every', str(args.checkpoint_every),
        '--prefetch', '2', '--log_every', '10', '--seed', str(args.seed),
    ]
    if args.tiny:
        base_cmd.append('--tiny')
    if args.platform:
        base_cmd.extend(['--platform', args.platform])

    # ---- phase 1: train, then SIGKILL mid-run ----------------------------
    ckpt_train = os.path.join(train_dir, 'params.msgpack.train')
    kill_after = max(1, int(args.steps * args.kill_frac
                            / args.checkpoint_every)) * args.checkpoint_every
    timeline.append({'t': now(), 'event': 'train_start',
                     'cmd': ' '.join(base_cmd)})
    t_start = time.time()
    proc = subprocess.Popen(base_cmd, cwd=REPO)
    try:
        # Wait for the checkpoint covering >= kill_after steps: poll the
        # .train file and read its step (cheap msgpack peek via mtime +
        # metrics.csv rows).
        target_rows = kill_after // 10  # log_every=10
        while True:
            if proc.poll() is not None:
                raise RuntimeError(
                    f'trainer exited early rc={proc.returncode}')
            rows = 0
            if os.path.exists(metrics_path):
                with open(metrics_path, encoding='utf-8') as f:
                    rows = max(sum(1 for _ in f) - 1, 0)
            if rows >= target_rows and os.path.exists(ckpt_train):
                break
            time.sleep(2.0)
        proc.send_signal(signal.SIGKILL)
        proc.wait()
    finally:
        if proc.poll() is None:
            proc.kill()
    timeline.append({'t': now(), 'event': 'sigkill',
                     'after_metric_rows': rows,
                     'wall_s': round(time.time() - t_start, 1)})

    # ---- phase 2: resume to completion -----------------------------------
    timeline.append({'t': now(), 'event': 'resume_start'})
    t_resume = time.time()
    rc = subprocess.run(base_cmd + ['--resume'], cwd=REPO).returncode
    if rc != 0:
        raise RuntimeError(f'resumed trainer failed rc={rc}')
    timeline.append({'t': now(), 'event': 'resume_done',
                     'wall_s': round(time.time() - t_resume, 1)})

    # ---- phase 3: EMA-eval on the HELD-OUT variant -----------------------
    import jax
    if args.platform:
        jax.config.update('jax_platforms', args.platform)
    from abx_tpu.cli import runner
    from abx_tpu.data import dataset as ds
    from abx_tpu.sampling.sampler import Sampler, SamplerConfig
    from abx_tpu.utils import checkpoint as ckpt_lib
    from abx_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()
    rt = runner.build_runtime(None, None, tiny=args.tiny, seed=0)
    raw = ds.load_complex_npz(
        os.path.join(corpus_dir, f'{holdout}.npz'), holdout)
    ex = ds._npz_to_example(raw)
    prep = ds.prepare_example(ex, rt.data_config)
    feats = prep[0] if isinstance(prep, tuple) else prep
    sfeats = {k: np.repeat(v[None], args.num_samples, axis=0)
              for k, v in feats.items()}
    ema = ckpt_lib.load_params(os.path.join(train_dir, 'params.msgpack'))
    sampler = Sampler(rt.model, rt.diffuser, rt.config.model,
                      SamplerConfig(num_t=args.num_t, mode='design',
                                    generate_area='cdr'))
    out = sampler.sample(ema, sfeats, jax.random.PRNGKey(1))
    mask = np.asarray(out['diffuse_mask'][0]) > 0
    gt_ca = np.asarray(feats['atom14_gt_positions'][:, 1])
    gt_seq = np.asarray(feats['seq'])
    rows_out = []
    for i in range(args.num_samples):
        pred_ca = np.asarray(out['atom14'][i, :, 1])
        rmsd = float(np.sqrt(np.mean(np.sum(
            (pred_ca[mask] - gt_ca[mask]) ** 2, -1))))
        aar = float(np.mean(np.asarray(out['seq'][i])[mask] == gt_seq[mask]))
        rows_out.append({'sample': i, 'cdr_rmsd': rmsd, 'cdr_aar': aar})
        print(f'holdout {holdout} sample {i}: cdr_rmsd={rmsd:.3f} A '
              f'aar={aar:.3f}')
    timeline.append({'t': now(), 'event': 'holdout_eval_done'})

    # ---- artifacts -------------------------------------------------------
    import shutil
    shutil.copyfile(metrics_path, os.path.join(args.out, 'metrics.csv'))
    with open(metrics_path, encoding='utf-8') as f:
        lines = f.read().strip().splitlines()
    result = {
        'corpus': {'n_complexes': len(names), 'clusters': 4,
                   'per_cluster': [4, 3, 4, 4], 'holdout': holdout,
                   'parents': ['6ct7_H_L_S', '6qd7_X_Z_F|E'],
                   'perturbation': '6 CDR mutations + 0-2 residue CDR '
                                   'deletion per variant'},
        'steps': args.steps, 'batch': args.batch,
        'checkpoint_every': args.checkpoint_every,
        'prefetch': 2, 'ema_decay': 0.999, 'metric_rows': len(lines) - 1,
        'timeline': timeline,
        'holdout_eval': {
            'generate_area': 'cdr', 'num_t': args.num_t,
            'cdr_rmsd_best': min(r['cdr_rmsd'] for r in rows_out),
            'cdr_rmsd_mean': float(np.mean([r['cdr_rmsd']
                                            for r in rows_out])),
            'cdr_aar_best': max(r['cdr_aar'] for r in rows_out),
            'cdr_aar_mean': float(np.mean([r['cdr_aar']
                                           for r in rows_out])),
            'samples': rows_out,
        },
        'tiny': args.tiny,
    }
    with open(os.path.join(args.out, 'result.json'), 'w',
              encoding='utf-8') as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items()
                      if k not in ('timeline',)}, indent=1))


if __name__ == '__main__':
    main()
