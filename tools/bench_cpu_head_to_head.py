"""Same-hardware head-to-head: PyTorch reference vs abx_tpu, both on CPU.

The reference publishes no throughput numbers (BASELINE.md), and this
environment has no CUDA GPU, so bench.py's `vs_baseline` uses an A100
*estimate*.  This tool produces the one comparison that CAN be measured
honestly here: the reference's real sampling loop
(/root/reference/inference.py:180 `sample_fn`, torch CPU) against the
abx_tpu production scan (jax CPU) — full-size model (512/128ch trunk,
8-layer IPA), num_recycle=2 (3 trunk passes per step, the released
protocol, /root/reference/abx/model/abx.py:89-102), ESM off on both sides
(no weights in this environment), IDENTICAL weights via the golden-tested
torch->flax converter, identical complex (6ct7_H_L_S), identical number of
reverse-diffusion steps.

Timing asymmetry (conservative, biases AGAINST abx_tpu): the timed jax
path is `sampler.sample`, whose jitted program INCLUDES feature building
and noisy-state initialisation, while the torch side receives a prebuilt
batch and is timed on the sampling loop alone.  Per-step figures divide
by (num_t + 1) because both loops run one extra model call — the
self-conditioning prime step (/root/reference/inference.py:209-211).

Usage:  JAX_PLATFORMS=cpu python tools/bench_cpu_head_to_head.py [--num_t 6]

Prints one JSON line:
  {"ref_s_per_design", "ours_s_per_design", "speedup", ...}
and is the measured anchor recorded in BASELINE.md (same-hardware ratio;
chip-vs-GPU ratios in bench.py remain estimates).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = '/root/reference'
sys.path.insert(0, REPO)

os.environ.setdefault('JAX_PLATFORMS', 'cpu')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--num_t', type=int, default=6,
                    help='reverse-diffusion steps per design (100 in the '
                         'released protocol; both sides run the same value, '
                         'and cost is linear in it)')
    ap.add_argument('--num_recycle', type=int, default=2)
    ap.add_argument('--reps', type=int, default=3,
                    help='timed repetitions per side; the MEDIAN is reported '
                         '(this is the measured anchor in BASELINE.md)')
    args = ap.parse_args()

    from tests.test_parity_network import _install_stubs, _to_torch_batch
    _install_stubs()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)

    import ml_collections
    import numpy as np
    import torch
    import jax
    # The axon site layer pins JAX_PLATFORMS and IGNORES env overrides;
    # jax.config (before any jax op) is the reliable way to force CPU.
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp

    assert jax.default_backend() == 'cpu', (
        'must run on CPU — the whole point is same-hardware')
    torch.manual_seed(0)

    # ---- reference side: full released config, ESM off ------------------
    with open(os.path.join(REFERENCE, 'config/config_model.json')) as f:
        ref_cfg = json.load(f)
    ref_cfg['model']['embeddings_and_seqformer']['esm']['enabled'] = False
    ref_cfg['model']['num_recycle'] = args.num_recycle
    ref_cfg['diffuser']['so3'].update(cache_dir='/tmp/ref_igso3_bench',
                                      use_cached_score=True)
    ref_conf = ml_collections.ConfigDict(ref_cfg)

    from diffuser.full_diffuser import FullDiffuser
    from abx.model.abx import ScoreNetwork as RefScoreNetwork
    ref_diffuser = FullDiffuser(ref_conf.diffuser)
    ref_model = RefScoreNetwork(model_conf=ref_conf.model,
                                diffuser=ref_diffuser)
    ref_model.eval()

    # ---- abx_tpu side: mirrored config, converted (identical) weights ---
    from abx_tpu.config import model_config
    from abx_tpu.diffusion.joint import JointConfig, JointDiffuser
    from abx_tpu.models.network import ScoreNetwork
    from abx_tpu.sampling.sampler import Sampler, SamplerConfig
    from abx_tpu.data import dataset as ds
    from abx_tpu.data.dataset import DataConfig
    from abx_tpu.utils.torch_convert import convert_score_network

    cfg = model_config()
    with cfg.unlocked():
        cfg.model.num_recycle = args.num_recycle
        cfg.model.embeddings_and_seqformer.esm.enabled = False
        cfg.diffuser.so3.cache_dir = '/tmp/igso3_bench'
    diffuser = JointDiffuser(JointConfig.from_dict(cfg.diffuser.to_dict()))
    model = ScoreNetwork(cfg.model, diffuser=diffuser,
                         antibody_len=cfg.data.max_antibody_len)

    pdb = os.path.join(REPO, 'testdata', '6ct7_H_L_S.pdb')
    ex = ds.complex_from_pdb(pdb, 'H', 'L', ['S'])
    feats, _meta = ds.prepare_example(
        ex, DataConfig(cfg.data.max_antibody_len, cfg.data.max_antigen_len))
    feats = {k: jnp.asarray(v[None]) for k, v in feats.items()}
    l_total = int(feats['seq'].shape[1])

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params = convert_score_network(sd, esm_enabled=False)

    sampler = Sampler(model, diffuser, cfg.model,
                      SamplerConfig(num_t=args.num_t, mode='design',
                                    generate_area='H3'))
    key = jax.random.PRNGKey(0)

    # Shared noisy init so both loops traverse comparable states.
    state, static, _static_acts, _dmask, _k = sampler._init(params, feats,
                                                            key)

    def _median(xs):
        xs = sorted(xs)
        n = len(xs)
        return xs[n // 2] if n % 2 else 0.5 * (xs[n // 2 - 1] + xs[n // 2])

    # ---- time abx_tpu (jax CPU), compile excluded -----------------------
    out = sampler.sample(params, feats, key)           # compile + run
    jax.block_until_ready(out)
    ours_times = []
    for i in range(args.reps):
        t0 = time.perf_counter()
        out = sampler.sample(params, feats, jax.random.PRNGKey(i + 1))
        jax.block_until_ready(out)
        ours_times.append(time.perf_counter() - t0)
    ours_s = _median(ours_times)

    # ---- time the reference loop (torch CPU) ----------------------------
    import importlib
    inference = importlib.import_module('inference')

    # abx_tpu-only hoisted features (static_*) never exist in the reference
    # batch; passing them through would inflate the torch side's per-rep
    # clone + sample_fn deepcopy with ~100 MB of dead tensors.
    torch_static = _to_torch_batch(
        {k: v for k, v in static.items()
         if not hasattr(v, 'rot') and not k.startswith('static_')
         and k not in ('rigidgroups_gt_frames', 'rigidgroups_alt_gt_frames')},
        model.antibody_len)
    torch_static['rigids_t'] = torch.tensor(np.asarray(state['rigids_t']),
                                            dtype=torch.float32)
    torch_static['seq_t'] = torch.tensor(np.asarray(state['seq_t'])).long()
    torch_static['atom14_gt_exists'] = torch_static['atom14_gt_exists'] > 0

    class _Args:
        mode = 'design'

    real_post = inference.postprocess_trajectory
    inference.postprocess_trajectory = lambda *a, **kw: None
    try:
        with torch.no_grad():
            # warm-up step count 1: exercises allocator/thread pools once.
            inference.sample_fn(
                {k: (v.clone() if hasattr(v, 'clone') else v)
                 for k, v in torch_static.items()},
                ref_conf, ref_diffuser, ref_model, _Args(),
                num_t=2, min_t=0.01, center=True, self_condition=True)
            ref_times = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                inference.sample_fn(
                    {k: (v.clone() if hasattr(v, 'clone') else v)
                     for k, v in torch_static.items()},
                    ref_conf, ref_diffuser, ref_model, _Args(),
                    num_t=args.num_t, min_t=0.01, center=True,
                    self_condition=True)
                ref_times.append(time.perf_counter() - t0)
            ref_s = _median(ref_times)
    finally:
        inference.postprocess_trajectory = real_post

    print(json.dumps({
        'protocol': {
            'num_t': args.num_t, 'num_recycle': args.num_recycle,
            'batch': 1, 'L': l_total, 'esm': False, 'dtype': 'f32',
            'hardware': f'cpu x{os.cpu_count()}',
            'weights': 'identical (torch->flax converter)',
            'reps': args.reps, 'stat': 'median (perf_counter)',
            'timing_note': 'jax side times sample() incl. in-jit feature '
                           'build + noise init; torch side gets a prebuilt '
                           'batch (conservative, favours the reference). '
                           'Per-step divides by num_t+1 (self-cond prime).',
        },
        'ref_s_per_design': round(ref_s, 2),
        'ours_s_per_design': round(ours_s, 2),
        'ref_s_per_step': round(ref_s / (args.num_t + 1), 3),
        'ours_s_per_step': round(ours_s / (args.num_t + 1), 3),
        'speedup': round(ref_s / ours_s, 2),
    }))


if __name__ == '__main__':
    main()
