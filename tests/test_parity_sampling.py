"""End-to-end sampling-trajectory parity vs the PyTorch reference under
SHARED NOISE — the project's north-star correctness criterion (SURVEY.md §7
Phase 5, BASELINE.md).

Both sides run the COMPLETE reverse loop — self-conditioning prime step,
per-step t features, score-network forward, joint SE(3) x sequence reverse,
final take-denoised step — from the SAME initial noisy state with IDENTICAL
per-step primitive noise:

  * the initial (rigids_t, seq_t) is prepared once by the abx_tpu pipeline
    and handed to the torch side verbatim (shared init noise, trivially);
  * per-step Gaussian draws (SO3 geodesic z, R3 Euler-Maruyama z) are
    pre-generated and injected: JAX side through `Sampler.sample(noise=...)`
    (the production scan path), torch side by monkeypatching `torch.randn`
    with a shape-checked queue;
  * the sequence tau-leap Poisson jumps are drawn by inverse CDF from shared
    uniforms on both sides (`discrete.poisson_counts_from_uniform`; the torch
    `Poisson` class is monkeypatched with the same recurrence).

The torch side runs the REAL reference loop: `inference.sample_fn`
(/root/reference/inference.py:180-273) with `postprocess_trajectory`
monkeypatched to capture instead of writing PDBs.  Weights are random,
converted torch->JAX via the golden-tested converter.

Pass criterion: per-step backbone deviation <= 0.1 A (north star; measured
orders of magnitude lower) and IDENTICAL sequence jump sites at every step.
"""

import os
import sys
from collections import deque

import numpy as np
import pytest

from tests.test_parity_network import (_install_stubs, _to_torch_batch,
                                       HAS_REFERENCE)

REFERENCE = '/root/reference'

pytestmark = pytest.mark.skipif(not HAS_REFERENCE,
                                reason='reference not mounted')


class _FakeArgs:
    mode = 'trajectory'

    def __init__(self, mode='trajectory'):
        self.mode = mode


# Mini ESM2 shape for the ESM-conditioned parity run (tests/mini_torch_esm2).
ESM_NL, ESM_DIM, ESM_HEADS = 2, 64, 4


def _install_mini_fair_esm(mini_model):
    """Expose the vendored mini torch ESM2 through the fair-esm API the
    reference consumes (`load_model_and_alphabet_local`, encoder.py:11,31).

    The alphabet/batch-converter below implements the PUBLISHED fair-esm
    conventions independently of abx_tpu's integer retokeniser (cls=0,
    pad=1, eos=2, aa ids 4..23 in 'LAGVSERTIDPKQNFYMHWC' order, X=24;
    [cls] + seq + [eos], right-padded), so the string-round-trip vs
    integer-retokenisation equivalence is part of what the parity run
    tests."""
    import torch

    class _Alphabet:
        padding_idx = 1

        def get_batch_converter(self):
            toks_of = {aa: i + 4
                       for i, aa in enumerate('LAGVSERTIDPKQNFYMHWC')}
            toks_of['X'] = 24

            def convert(data):
                seqs = [s for _, s in data]
                maxlen = max(len(s) for s in seqs)
                toks = torch.full((len(seqs), maxlen + 2), 1,
                                  dtype=torch.long)
                for i, s in enumerate(seqs):
                    toks[i, 0] = 0
                    for j, aa in enumerate(s):
                        toks[i, 1 + j] = toks_of[aa]
                    toks[i, 1 + len(s)] = 2
                return [lab for lab, _ in data], seqs, toks

            return convert

    class _FairESM(torch.nn.Module):
        """fair-esm forward API over MiniESM2."""

        def __init__(self, m):
            super().__init__()
            self.m = m

        def half(self):
            # Reference casts ESM to fp16 (encoder.py:32) — a precision
            # (not wiring) choice; stay f32 to match the flax side.
            return self

        def forward(self, tokens, repr_layers=(), need_head_weights=False):
            del need_head_weights
            hidden = self.m(tokens)
            return {'representations': {r: hidden[r] for r in repr_layers}}

    import abx.model.encoder as ref_encoder
    ref_encoder.load_model_and_alphabet_local = (
        lambda path: (_FairESM(mini_model), _Alphabet()))


def _make_fake_randn(queue):
    import torch

    real_randn = torch.randn

    def fake_randn(*args, size=None, device=None, **kw):
        if size is None:
            # Not a diffuser reverse draw (defensive); fall through.
            return real_randn(*args, device=device, **kw)
        arr = queue.popleft()
        assert tuple(size) == arr.shape, (tuple(size), arr.shape)
        return torch.tensor(arr, dtype=torch.float32)

    return fake_randn


def _make_fake_poisson(uqueue):
    import torch

    class FakePoisson:
        """Inverse-CDF Poisson from shared uniforms; same recurrence as
        abx_tpu.diffusion.discrete.poisson_counts_from_uniform."""

        def __init__(self, rate):
            self.rate = rate

        def sample(self):
            u = torch.tensor(uqueue.popleft(), dtype=torch.float32)
            lam = self.rate.float()
            term = torch.exp(-lam)
            cdf = term.clone()
            counts = (u > cdf).float()
            for j in range(1, 16):
                term = term * lam / j
                cdf = cdf + term
                counts = counts + (u > cdf).float()
            return counts

    return FakePoisson


def run_shared_noise_parity(num_t, seed=0, generate_area='cdr',
                            opt_step=None,
                            pdb='testdata/6ct7_H_L_S.pdb',
                            heavy='H', light='L', antigen=('S',),
                            noise_scale=1.0, ab_len=224, ag_len=16,
                            esm=False, num_recycle=0):
    """Run both samplers under shared noise; return per-step deviations.

    With `opt_step`, both sides run OPTIMIZE mode (reference
    inference.py:201-204): the t-grid truncates to steps <= opt_step/num_t
    and the initial state is the abx_tpu pipeline's forward-corruption of
    the ground truth at that t (handed to torch verbatim, as with design
    mode's init noise).  The reference then keeps only the final step
    (inference.py:269-270), so the comparison covers the end state — any
    mid-chain divergence propagates to it.  The queue-drained asserts
    additionally prove both sides ran the SAME truncated grid.

    Returns dict with 'bb_dev' (num_t,) max backbone deviation per step in
    Angstroms, 'seq_equal' (num_t,) bool, plus the final-step values.
    """
    _install_stubs()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import json
    import ml_collections
    import torch
    import jax
    import jax.numpy as jnp

    torch.manual_seed(seed)

    from abx_tpu.data import dataset as ds
    ex = ds.complex_from_pdb(pdb, heavy, light, list(antigen))
    mini_esm = None
    if esm:
        # ESM-conditioned loop: the vendored mini torch ESM2 plays fair-esm
        # on the reference side (exposed through the load_model_and_alphabet
        # _local API the reference imports, encoder.py:11); the SAME
        # checkpoint converts to the flax side via convert_esm2_ckpt.  The
        # reference pads the esm embedding only to max(h+l) across the
        # batch (pad_for_batch, encoder.py:108) while its seq act carries
        # the full static antibody length, so the antibody must be UNPADDED
        # here: set the shape budget to exactly h+l.
        h_real = int((ex['antibody_chain_ids'] == 0).sum())
        l_real = int((ex['antibody_chain_ids'] == 1).sum())
        ab_len = h_real + l_real
        from tests.mini_torch_esm2 import MiniESM2
        torch.manual_seed(seed + 7)
        mini_esm = MiniESM2(ESM_NL, ESM_DIM, ESM_HEADS)
        mini_esm.eval()

    with open(os.path.join(REFERENCE, 'config/config_model.json')) as f:
        ref_cfg = json.load(f)
    esm_c = ref_cfg['model']['embeddings_and_seqformer']['esm']
    esm_c['enabled'] = bool(esm)
    if esm:
        esm_c['embed_channel'] = ESM_DIM
        esm_c['num_layers'] = ESM_NL
        esm_c['esm_embed'].update(repr_layer=list(range(ESM_NL + 1)),
                                  model_path='mini', sep_pad_num=48)
    # num_recycle=2 is the flagship protocol (config_model.json:4): each
    # diffusion step runs 3 trunk passes with prev_* + predicted-sequence
    # feedback (abx.py:87-102); 0 keeps the fast single-pass runs.
    ref_cfg['model']['num_recycle'] = num_recycle
    ref_cfg['diffuser']['so3'].update(
        num_omega=200, num_sigma=100, cache_dir='/tmp/ref_igso3',
        use_cached_score=True)
    ref_conf = ml_collections.ConfigDict(ref_cfg)

    from diffuser.full_diffuser import FullDiffuser
    from abx.model.abx import ScoreNetwork as RefScoreNetwork
    if esm:
        _install_mini_fair_esm(mini_esm)
    ref_diffuser = FullDiffuser(ref_conf.diffuser)
    ref_model = RefScoreNetwork(model_conf=ref_conf.model,
                                diffuser=ref_diffuser)
    ref_model.eval()

    from abx_tpu.config import model_config
    from abx_tpu.diffusion.joint import JointConfig, JointDiffuser
    from abx_tpu.models.network import ScoreNetwork
    from abx_tpu.sampling.sampler import Sampler, SamplerConfig

    cfg = model_config()
    with cfg.unlocked():
        cfg.model.num_recycle = num_recycle
        cfg.diffuser.so3.num_omega = 200
        cfg.diffuser.so3.num_sigma = 100
        cfg.diffuser.so3.cache_dir = '/tmp/igso3_test'
        cfg.data.max_antibody_len = ab_len
        cfg.data.max_antigen_len = ag_len
        es = cfg.model.embeddings_and_seqformer.esm
        es.enabled = bool(esm)
        if esm:
            es.embed_channel = ESM_DIM
            es.num_layers = ESM_NL
            es.num_heads = ESM_HEADS
    diffuser = JointDiffuser(JointConfig.from_dict(cfg.diffuser.to_dict()))
    model = ScoreNetwork(cfg.model, diffuser=diffuser,
                         antibody_len=cfg.data.max_antibody_len)

    from abx_tpu.data.dataset import DataConfig
    feats, meta = ds.prepare_example(
        ex, DataConfig(cfg.data.max_antibody_len, cfg.data.max_antigen_len))
    feats = {k: jnp.asarray(v[None]) for k, v in feats.items()}

    from abx_tpu.utils.torch_convert import convert_score_network
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params = convert_score_network(sd, esm_enabled=bool(esm))

    esm_fn, esm_params = None, None
    if esm:
        # Same mini checkpoint -> flax via the golden-tested converter.
        import tempfile
        from abx_tpu.models.esm import (AntibodyESM, ESM2Config,
                                        stack_layer_params)
        from abx_tpu.utils.torch_convert import convert_esm2_ckpt
        with tempfile.TemporaryDirectory() as td:
            ck = os.path.join(td, 'mini_esm2.pt')
            torch.save({'model': mini_esm.state_dict()}, ck)
            esm_params = stack_layer_params(
                convert_esm2_ckpt(ck, num_layers=ESM_NL), ESM_NL)
        esm_cfg = ESM2Config(num_layers=ESM_NL, embed_dim=ESM_DIM,
                             attention_heads=ESM_HEADS)
        esm_fn = AntibodyESM(esm_cfg, ab_len, sep_pad_num=48,
                             dtype=jnp.float32, scan_layers=True)

    # ---- abx_tpu side: production scan path with injected noise ----------
    mode = 'optimize' if opt_step is not None else 'trajectory'
    sampler = Sampler(model, diffuser, cfg.model,
                      SamplerConfig(num_t=num_t, mode=mode,
                                    opt_step=opt_step,
                                    generate_area=generate_area,
                                    noise_scale=noise_scale,
                                    collect_trajectory=True),
                      esm_fn=esm_fn, esm_params=esm_params)
    key = jax.random.PRNGKey(seed)
    state, static, static_acts, dmask, k_scan = sampler._init(
        params, feats, key)

    b, l = np.asarray(static['seq']).shape
    n = int(sampler.reverse_steps.shape[0])
    rng = np.random.RandomState(seed + 1)
    rot_z = rng.standard_normal((n + 1, b, l, 3)).astype(np.float32)
    trans_z = rng.standard_normal((n + 1, b, l, 3)).astype(np.float32)
    seq_u = rng.random_sample((n + 1, b, l, 20)).astype(np.float32)
    noise = {'rot_z': jnp.asarray(rot_z), 'trans_z': jnp.asarray(trans_z),
             'seq_u': jnp.asarray(seq_u)}

    out = sampler.sample(params, feats, key, noise=noise)
    traj = jax.tree.map(np.asarray, out['trajectory'])

    # ---- torch side: the REAL reference loop -----------------------------
    import importlib
    inference = importlib.import_module('inference')

    torch_static = _to_torch_batch(
        {k: v for k, v in static.items()
         if not hasattr(v, 'rot') and k not in ('rigidgroups_gt_frames',
                                                'rigidgroups_alt_gt_frames')},
        model.antibody_len)
    torch_static['rigids_t'] = (
        torch.tensor(np.asarray(state['rigids_t']), dtype=torch.float32))
    torch_static['seq_t'] = (
        torch.tensor(np.asarray(state['seq_t'])).long())
    # Reference pipeline ships coord masks as bool (dataset.py:159); the
    # TMscore head fancy-indexes with them (head.py:135).
    torch_static['atom14_gt_exists'] = (
        torch_static['atom14_gt_exists'] > 0)
    if opt_step is not None:
        # Reference reads the optimize re-noise level from batch['t']
        # (inference.py:202).
        torch_static['t'] = torch.full((b,), opt_step / num_t,
                                       dtype=torch.float32)
    if esm:
        # The reference ESM embedding re-tokenises seq_t as STRINGS, using
        # these fields for chain lengths/labels (encoder.py:75-95).
        torch_static['name'] = ['parity']
        torch_static['str_heavy_seq'] = [meta['str_heavy_seq']]
        torch_static['str_light_seq'] = [meta['str_light_seq']]

    # Reference consumes per step (t > min_t): SO3 z then R3 z; our scan
    # slot j covers scan iteration j (0 = prime, discarded; n = final,
    # discarded) -> reference step k uses slot k+1.
    zqueue = deque()
    for k in range(n - 1):
        zqueue.append(rot_z[k + 1])    # (B, L, 3), SO3 draw first
        zqueue.append(trans_z[k + 1])  # then R3
    uqueue = deque([seq_u[k + 1] for k in range(n - 1)])

    captured = {}

    def capture(batch, traj_list, args):
        captured['batch'] = batch
        captured['traj'] = traj_list

    real_post = inference.postprocess_trajectory
    real_randn = __import__('torch').randn
    import torch.distributions.poisson as poisson_mod
    real_poisson = poisson_mod.Poisson
    inference.postprocess_trajectory = capture
    torch.randn = _make_fake_randn(zqueue)
    poisson_mod.Poisson = _make_fake_poisson(uqueue)
    try:
        with torch.no_grad():
            inference.sample_fn(
                torch_static, ref_conf, ref_diffuser, ref_model,
                _FakeArgs('optimize' if opt_step is not None
                          else 'trajectory'),
                num_t=num_t, min_t=0.01, center=True, self_condition=True,
                noise_scale=noise_scale)
    finally:
        inference.postprocess_trajectory = real_post
        torch.randn = real_randn
        poisson_mod.Poisson = real_poisson
    assert not zqueue and not uqueue, 'reference consumed unexpected draws'

    ref_traj = captured['traj']
    if opt_step is not None:
        # Optimize mode keeps only the final step (inference.py:269-270);
        # align it with our last scan slot.
        assert len(ref_traj) == 1
        ref_traj = [None] * (n - 1) + list(ref_traj)
    assert len(ref_traj) == n

    ab_len = model.antibody_len
    bb_exists = np.asarray(static['atom14_gt_exists'])[0, :ab_len, :3] > 0
    dmask_np = np.asarray(dmask)[0, :ab_len] > 0

    bb_dev = np.zeros((n,))
    seq_equal = np.zeros((n,), dtype=bool)
    for k in range(n):
        if ref_traj[k] is None:   # optimize mode: only the final step kept
            seq_equal[k] = True
            continue
        ref_atoms = ref_traj[k]['atom14_results'].detach().numpy()[0]
        my_atoms = traj['atom14'][k, 0, :ab_len]
        d = np.linalg.norm(my_atoms[:, :3] - ref_atoms[:, :3], axis=-1)
        bb_dev[k] = d[bb_exists.any(-1)].max()
        ref_seq = np.asarray(ref_traj[k]['seq'][0])
        my_seq = np.clip(traj['seq'][k, 0, :ab_len], 0, 19)
        seq_equal[k] = bool((ref_seq == my_seq).all())

    return {
        'bb_dev': bb_dev,
        'seq_equal': seq_equal,
        'n_diffused': int(dmask_np.sum()),
        'final_bb_dev': bb_dev[-1],
    }


class TestSharedNoiseSamplingParity:
    def test_full_loop_parity_tiny_T(self):
        # all-six-CDR co-design: 42 diffused sites on this complex (vs 4
        # for H3) — the widest wiring surface per unit runtime.
        res = run_shared_noise_parity(num_t=8, generate_area='cdr')
        assert res['seq_equal'].all(), res['seq_equal']
        assert res['final_bb_dev'] <= 0.1, res['bb_dev']
        assert res['bb_dev'].max() <= 0.1, res['bb_dev']

    def test_multichain_antigen_noise_scale_parity(self):
        # Multi-chain antigen assembly (6qd7: chains F+E merged) plus a
        # non-default reverse noise_scale, through the full loop.
        res = run_shared_noise_parity(
            num_t=6, generate_area='cdr', pdb='testdata/6qd7_X_Z_F|E.pdb',
            heavy='X', light='Z', antigen=('F', 'E'), noise_scale=0.5,
            ab_len=232)
        assert res['seq_equal'].all(), res['seq_equal']
        assert res['bb_dev'].max() <= 0.1, res['bb_dev']

    def test_esm_conditioned_parity(self):
        # Full loop WITH ESM conditioning: the reference side runs its real
        # string-round-trip ESMEmbedding over the vendored mini torch ESM2
        # (fair-esm API shim); our side runs the converted checkpoint
        # through AntibodyESM's integer retokeniser inside the scan.
        # Covers: tokenisation equivalence, [cls|heavy|G48|light|eos]
        # assembly, per-pass ESM re-runs on updated seq_t, layer-weighted
        # sum, and the trunk converter's esm branch (esm_embed_weights +
        # proj_esm_embed) — none of which the ESM-off runs touch.
        res = run_shared_noise_parity(num_t=6, generate_area='cdr',
                                      esm=True)
        assert res['seq_equal'].all(), res['seq_equal']
        assert res['bb_dev'].max() <= 0.1, res['bb_dev']

    def test_recycling_parity(self):
        # The FLAGSHIP protocol's 3-trunk-passes-per-step path
        # (num_recycle=2, config_model.json:4): prev_pos distogram +
        # prev_seq/prev_pair feedback and seq_t <- seq_0 between passes
        # (abx.py:87-102).  Every other parity run pins num_recycle=0, so
        # this is the only cross-implementation check of get_prev wiring,
        # pass ordering, and the recycled-sequence feedback.
        res = run_shared_noise_parity(num_t=5, generate_area='cdr',
                                      num_recycle=2)
        assert res['seq_equal'].all(), res['seq_equal']
        assert res['bb_dev'].max() <= 0.1, res['bb_dev']

    def test_recycling_parity_esm(self):
        # Recycling x ESM: the reference re-runs its string-round-trip ESM
        # embedding on the RECYCLED predicted sequence in every pass
        # (abx.py:89-102 + encoder.py:72-105); our side re-invokes esm_fn
        # inside each fori_loop body on the updated int seq_t.  A
        # stale-sequence ESM reuse bug would be invisible at num_recycle=0.
        res = run_shared_noise_parity(num_t=4, generate_area='cdr',
                                      esm=True, num_recycle=2)
        assert res['seq_equal'].all(), res['seq_equal']
        assert res['bb_dev'].max() <= 0.1, res['bb_dev']

    def test_optimize_mode_recycling_parity(self):
        # Cross-term: optimize mode's truncated grid + forward-corrupted
        # init TOGETHER WITH the 3-pass recycling path (the released
        # antibody-optimization protocol runs both at once).  The
        # recycled-seq_t reverse input interacts with the truncated grid's
        # final-step handling — neither single-feature test covers the
        # combination.
        res = run_shared_noise_parity(num_t=25, generate_area='cdr',
                                      opt_step=6, num_recycle=2)
        assert res['seq_equal'][-1], 'final sequences differ'
        assert res['final_bb_dev'] <= 0.1, res['final_bb_dev']

    def test_optimize_mode_parity(self):
        # Optimize mode: forward-corrupt to t = 8/25, reverse on the
        # truncated grid.  The drained-queue asserts inside the harness
        # prove both sides ran the same truncated grid; the final state
        # must match (divergence anywhere in the chain would propagate).
        res = run_shared_noise_parity(num_t=25, generate_area='cdr',
                                      opt_step=8)
        assert res['seq_equal'][-1], 'final sequences differ'
        assert res['final_bb_dev'] <= 0.1, res['final_bb_dev']

    @pytest.mark.skipif(os.environ.get('ABX_SLOW_PARITY', '0') != '1',
                        reason='set ABX_SLOW_PARITY=1 for the T=100 run')
    def test_full_loop_parity_T100(self):
        res = run_shared_noise_parity(num_t=100)
        assert res['seq_equal'].all()
        assert res['bb_dev'].max() <= 0.1, res['bb_dev']
