"""Sampler + training-step tests (tiny model, CPU; mesh via 8 virtual devs)."""

import os
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from abx_tpu.config import tiny_model_config
from abx_tpu.data import dataset as ds
from abx_tpu.data.dataset import DataConfig
from abx_tpu.data.features import FeatureBuilder, make_diffuser_features
from abx_tpu.diffusion.joint import JointConfig, JointDiffuser
from abx_tpu.models.network import ScoreNetwork
from abx_tpu.sampling.sampler import Sampler, SamplerConfig

PDB = 'testdata/6ct7_H_L_S.pdb'


def _make_feats(l_ab, l_ag, batch=1, seed=0):
    l = l_ab + l_ag
    rng = np.random.RandomState(seed)
    anchor = np.zeros((batch, l_ab), np.int32)
    anchor[:, 10] = 5
    anchor[:, 20] = 5
    return {
        'seq': rng.randint(0, 20, (batch, l)).astype(np.int32),
        'mask': np.ones((batch, l), np.float32),
        'atom14_gt_positions': (5.0 * rng.randn(batch, l, 14, 3)).astype(
            np.float32),
        'atom14_gt_exists': np.ones((batch, l, 14), np.float32),
        'cdr_def': np.zeros((batch, l), np.int32),
        'chain_id': np.zeros((batch, l), np.int32),
        'residx': np.tile(np.arange(l, dtype=np.int32), (batch, 1)),
        'anchor_flag': anchor,
    }


@pytest.fixture(scope='module')
def tiny_setup():
    cfg = tiny_model_config()
    diffuser = JointDiffuser(JointConfig.from_dict(cfg.diffuser.to_dict()))
    l_ab, l_ag = cfg.data.max_antibody_len, cfg.data.max_antigen_len
    model = ScoreNetwork(cfg.model, diffuser=diffuser, antibody_len=l_ab)
    feats = _make_feats(l_ab, l_ag)
    init_batch = FeatureBuilder()(
        {k: jnp.asarray(v) for k, v in feats.items()})
    init_batch = make_diffuser_features(
        init_batch, diffuser=diffuser, generate_area='H3',
        key=jax.random.PRNGKey(0), mode='design')
    params = model.init(jax.random.PRNGKey(0), init_batch, compute_loss=True)
    return cfg, diffuser, model, params, feats


class TestSampler:
    def test_design_mode(self, tiny_setup):
        cfg, diffuser, model, params, feats = tiny_setup
        sampler = Sampler(model, diffuser, cfg.model,
                          SamplerConfig(num_t=4, mode='design'))
        out = sampler.sample(params, feats, jax.random.PRNGKey(0))
        l = feats['seq'].shape[1]
        assert out['atom14'].shape == (1, l, 14, 3)
        assert out['seq'].shape == (1, l)
        assert np.all(np.isfinite(np.asarray(out['atom14'])))
        assert np.all(np.asarray(out['seq']) >= 0)
        assert np.all(np.asarray(out['seq']) <= 19)

    def test_deterministic_given_key(self, tiny_setup):
        cfg, diffuser, model, params, feats = tiny_setup
        sampler = Sampler(model, diffuser, cfg.model,
                          SamplerConfig(num_t=3, mode='design'))
        o1 = sampler.sample(params, feats, jax.random.PRNGKey(7))
        o2 = sampler.sample(params, feats, jax.random.PRNGKey(7))
        np.testing.assert_array_equal(np.asarray(o1['seq']),
                                      np.asarray(o2['seq']))
        np.testing.assert_allclose(np.asarray(o1['atom14']),
                                   np.asarray(o2['atom14']))
        o3 = sampler.sample(params, feats, jax.random.PRNGKey(8))
        assert not np.allclose(np.asarray(o1['atom14']),
                               np.asarray(o3['atom14']))

    def test_fixed_region_sequence_unchanged(self, tiny_setup):
        cfg, diffuser, model, params, feats = tiny_setup
        sampler = Sampler(model, diffuser, cfg.model,
                          SamplerConfig(num_t=3, mode='design'))
        out = sampler.sample(params, feats, jax.random.PRNGKey(0))
        diffuse_mask = np.asarray(out['diffuse_mask'])[0]
        seq = np.asarray(out['seq'])[0]
        orig = feats['seq'][0]
        fixed = diffuse_mask == 0
        np.testing.assert_array_equal(seq[fixed], np.clip(orig[fixed], 0, 19))

    def test_seq_corrector_opt_in(self, tiny_setup):
        """seq_corrector_steps>0 (Gibbs corrector on the sequence track)
        runs inside the jitted scan, keeps fixed sites fixed, and stays
        deterministic given the key; the structure-track outputs remain
        finite."""
        cfg, diffuser, model, params, feats = tiny_setup
        sampler = Sampler(model, diffuser, cfg.model,
                          SamplerConfig(num_t=4, mode='design',
                                        seq_corrector_steps=2))
        out = sampler.sample(params, feats, jax.random.PRNGKey(0))
        l = feats['seq'].shape[1]
        assert out['seq'].shape == (1, l)
        assert np.all(np.isfinite(np.asarray(out['atom14'])))
        assert np.all((np.asarray(out['seq']) >= 0)
                      & (np.asarray(out['seq']) <= 19))
        fixed = np.asarray(out['diffuse_mask'])[0] == 0
        np.testing.assert_array_equal(
            np.asarray(out['seq'])[0][fixed],
            np.clip(feats['seq'][0][fixed], 0, 19))
        out2 = sampler.sample(params, feats, jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(out['seq']),
                                      np.asarray(out2['seq']))

    def test_optimize_mode_short_grid(self, tiny_setup):
        cfg, diffuser, model, params, feats = tiny_setup
        sampler = Sampler(model, diffuser, cfg.model,
                          SamplerConfig(num_t=10, mode='optimize',
                                        opt_step=4))
        # optimize truncates the time grid to t <= 0.4.
        assert sampler.reverse_steps.shape[0] < 10
        out = sampler.sample(params, feats, jax.random.PRNGKey(0))
        assert np.all(np.isfinite(np.asarray(out['atom14'])))

    def test_trajectory_mode(self, tiny_setup):
        cfg, diffuser, model, params, feats = tiny_setup
        sampler = Sampler(model, diffuser, cfg.model,
                          SamplerConfig(num_t=3, mode='trajectory',
                                        collect_trajectory=True))
        out = sampler.sample(params, feats, jax.random.PRNGKey(0))
        traj = out['trajectory']
        assert traj['atom14'].shape[0] == 3
        assert traj['t'].shape[0] == 3


class TestShardedSampling:
    def test_batch_sharded_over_mesh(self, tiny_setup):
        from abx_tpu.parallel import mesh as mesh_lib
        cfg, diffuser, model, params, feats = tiny_setup
        n_dev = len(jax.devices())
        assert n_dev == 8, 'conftest should provide 8 virtual CPU devices'
        mesh = mesh_lib.make_mesh()
        feats8 = _make_feats(cfg.data.max_antibody_len,
                             cfg.data.max_antigen_len, batch=8)
        sharded = mesh_lib.shard_batch(mesh, feats8)
        sampler = Sampler(model, diffuser, cfg.model,
                          SamplerConfig(num_t=2, mode='design'))
        out = sampler.sample(params, sharded, jax.random.PRNGKey(0))
        assert out['atom14'].shape[0] == 8
        assert np.all(np.isfinite(np.asarray(out['atom14'])))

    def test_esm_conditioned_sharded_matches_unsharded(self, tiny_setup):
        """The FLAGSHIP configuration (frozen-ESM conditioning, the
        reference's actual setup — encoder.py:31) over the mesh: batch-
        sharded sampling with replicated trunk + ESM params must match the
        unsharded run (pure data parallelism; ESM params ride jit as a
        replicated runtime argument, never a per-shard one)."""
        from abx_tpu.models.esm import (AntibodyESM, ESM2, ESM2Config,
                                        build_esm_tokens,
                                        stack_layer_params)
        from abx_tpu.parallel import mesh as mesh_lib
        cfg, diffuser, _, _, _ = tiny_setup
        cfg = tiny_model_config()
        with cfg.unlocked():
            cfg.model.embeddings_and_seqformer.esm.enabled = True
            cfg.model.embeddings_and_seqformer.esm.num_layers = 2
            cfg.model.embeddings_and_seqformer.esm.embed_channel = 64
        l_ab, l_ag = cfg.data.max_antibody_len, cfg.data.max_antigen_len
        model = ScoreNetwork(cfg.model, diffuser=diffuser,
                             antibody_len=l_ab)
        feats8 = _make_feats(l_ab, l_ag, batch=8)
        feats8['heavy_len'] = np.full((8,), 30, np.int32)
        feats8['light_len'] = np.full((8,), 15, np.int32)

        esm_cfg = ESM2Config.tiny()
        esm_model = ESM2(esm_cfg, dtype=jnp.float32)
        tok = build_esm_tokens(jnp.asarray(feats8['seq'][:, :l_ab]),
                               jnp.asarray(feats8['heavy_len']),
                               jnp.asarray(feats8['light_len']))
        esm_params = stack_layer_params(
            esm_model.init(jax.random.PRNGKey(1), tok), esm_cfg.num_layers)
        esm_fn = AntibodyESM(esm_cfg, l_ab, dtype=jnp.float32,
                             scan_layers=True)

        init_batch = FeatureBuilder()(
            {k: jnp.asarray(v) for k, v in feats8.items()})
        init_batch = make_diffuser_features(
            init_batch, diffuser=diffuser, generate_area='H3',
            key=jax.random.PRNGKey(0), mode='design')
        params = model.init(
            jax.random.PRNGKey(0), init_batch,
            esm_fn=lambda *a, **kw: esm_fn(esm_params, *a, **kw))

        scfg = SamplerConfig(num_t=2, mode='design')
        ref = Sampler(model, diffuser, cfg.model, scfg,
                      esm_fn=esm_fn, esm_params=esm_params).sample(
                          params, feats8, jax.random.PRNGKey(3))

        mesh = mesh_lib.make_mesh()
        sampler = Sampler(model, diffuser, cfg.model, scfg, esm_fn=esm_fn,
                          esm_params=mesh_lib.replicate(mesh, esm_params))
        out = sampler.sample(mesh_lib.replicate(mesh, params),
                             mesh_lib.shard_batch(mesh, feats8),
                             jax.random.PRNGKey(3))
        np.testing.assert_allclose(np.asarray(out['atom14']),
                                   np.asarray(ref['atom14']),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_array_equal(np.asarray(out['seq']),
                                      np.asarray(ref['seq']))


class TestTrainStep:
    def test_loss_decreases_on_overfit(self, tiny_setup):
        from abx_tpu.train.trainer import Trainer, TrainConfig
        cfg, diffuser, model, params, feats = tiny_setup
        trainer = Trainer(model, diffuser, cfg.model, cfg.loss,
                          TrainConfig(learning_rate=1e-3, warmup_steps=1,
                                      generate_area='H3'))
        state = trainer.init_state(params)
        losses = []
        key = jax.random.PRNGKey(0)
        for i in range(6):
            # Same key every step -> same noising: pure overfit check.
            state, metrics = trainer.step(state, feats, jax.random.PRNGKey(3))
            losses.append(float(metrics['total']))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses

    def test_grads_flow_to_trunk(self, tiny_setup):
        """With non-degenerate weights and t inside every loss gate, nearly
        all parameters must receive gradient.

        NB: at AF2-style initialization many layers are zero-init ('final'/
        'gate'), which legitimately blocks upstream flow — so perturb params
        first.  t is pinned to 0.1 (< t_filter=0.25 and < rot threshold 0.2)
        so folding/distogram/plddt/rot-angle terms are all active.
        """
        from abx_tpu.data.features import (FeatureBuilder,
                                           make_diffuser_features)
        from abx_tpu.train.losses import total_loss
        cfg, diffuser, model, params, feats = tiny_setup

        leaves, treedef = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(jax.random.PRNGKey(99), len(leaves))
        leaves = [l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, keys)]
        params_p = jax.tree_util.tree_unflatten(treedef, leaves)

        def loss_fn(p):
            batch = FeatureBuilder(is_training=True)(
                {k: jnp.asarray(v) for k, v in feats.items()})
            batch = make_diffuser_features(
                batch, diffuser=diffuser, generate_area='H3',
                key=jax.random.PRNGKey(1), mode='optimize', t_value=0.1,
                is_training=True)
            out = model.apply(p, batch, compute_loss=True,
                              deterministic=True)
            return total_loss(batch, out, cfg.loss,
                              model.antibody_len)['loss']

        grads = jax.grad(loss_fn)(params_p)
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        zero = [jax.tree_util.keystr(path) for path, g in flat
                if not float(jnp.abs(g).max()) > 0]
        nan = [jax.tree_util.keystr(path) for path, g in flat
               if not np.all(np.isfinite(np.asarray(g)))]
        assert not nan, f'NaN grads: {nan[:10]}'
        assert len(zero) < 0.2 * len(flat), (
            f'{len(zero)}/{len(flat)} params get zero grad: {zero[:15]}')


class TestEndToEndPdb:
    def test_pdb_to_design_output(self, tmp_path, tiny_setup):
        from abx_tpu.sampling.output import (postprocess_reference,
                                             postprocess_sample)
        cfg, diffuser, model, params, _ = tiny_setup
        dcfg = DataConfig(cfg.data.max_antibody_len, cfg.data.max_antigen_len)
        ex = ds.complex_from_pdb(PDB, 'H', 'L', ['S'])
        # tiny config is too small for the real complex; crop the antibody.
        for k in ['antibody_coords', 'antibody_coord_mask', 'antibody_residx',
                  'antibody_chain_ids', 'antibody_cdr_def']:
            ex[k] = ex[k][80:120]
        ex['antibody_str_seq'] = ex['antibody_str_seq'][80:120]
        prep = ds.prepare_example(ex, dcfg)
        if prep is None:
            pytest.skip('crop removed the interface')
        feats, meta = prep
        batch = ds.stack_batch([feats])
        sampler = Sampler(model, diffuser, cfg.model,
                          SamplerConfig(num_t=2, mode='design'))
        out = sampler.sample(params, batch, jax.random.PRNGKey(0))
        out = jax.tree.map(np.asarray, out)
        f = postprocess_sample(str(tmp_path), meta, out)
        assert (tmp_path / f.split('/')[-1]).exists()


class TestResumableSampling:
    def test_chunked_equals_oneshot_and_resumes(self, tiny_setup, tmp_path):
        """sample_resumable == sample, and a mid-trajectory restart from the
        persisted state file completes to the same result."""
        cfg, diffuser, model, params, feats = tiny_setup
        sampler = Sampler(model, diffuser, cfg.model,
                          SamplerConfig(num_t=6, mode='design',
                                        generate_area='H3'))
        key = jax.random.PRNGKey(11)
        want = sampler.sample(params, feats, key)

        got = sampler.sample_resumable(params, feats, key, chunk_steps=3)
        np.testing.assert_allclose(np.asarray(got['atom14']),
                                   np.asarray(want['atom14']),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(got['seq']),
                                      np.asarray(want['seq']))

        # Simulate a crash: run chunks manually until the state file exists,
        # then resume from it.
        state_path = str(tmp_path / 'sampler_state.npz')
        ts, ts_model, is_prime, refresh = sampler._step_grids()
        state, static, static_acts, dmask, k_scan = sampler._init(
            params, feats, key)
        state, k_scan, _ = sampler._run_chunk(
            params, sampler.esm_params, static, static_acts, dmask, state,
            k_scan, (ts[:3], ts_model[:3], is_prime[:3], refresh[:3], {}))
        host = {k: np.asarray(v) for k, v in state.items()}
        host['__key__'] = np.asarray(k_scan)
        host['__chunk_pos__'] = np.asarray(3)
        np.savez(state_path, **host)

        resumed = sampler.sample_resumable(params, feats, key,
                                           chunk_steps=3,
                                           state_path=state_path)
        np.testing.assert_allclose(np.asarray(resumed['atom14']),
                                   np.asarray(want['atom14']),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(resumed['seq']),
                                      np.asarray(want['seq']))
        assert not os.path.exists(state_path)  # cleaned up on completion

    def test_bf16_npz_roundtrip(self):
        """bfloat16 carries must survive the state-file round trip (numpy
        serialises ml_dtypes bf16 as raw void otherwise)."""
        import ml_dtypes
        from abx_tpu.sampling.sampler import _load_npz, _save_npz
        import tempfile
        arrs = {
            'prev_pair': np.arange(12, dtype=np.float32).reshape(3, 4)
                           .astype(ml_dtypes.bfloat16),
            'rigids_t': np.ones((2, 7), np.float32),
            '__chunk_pos__': np.asarray(3),
        }
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, 's.npz')
            _save_npz(p, arrs)
            back = _load_npz(p)
        assert back['prev_pair'].dtype == ml_dtypes.bfloat16
        np.testing.assert_array_equal(
            back['prev_pair'].astype(np.float32),
            arrs['prev_pair'].astype(np.float32))
        np.testing.assert_array_equal(back['rigids_t'], arrs['rigids_t'])
        assert int(back['__chunk_pos__']) == 3

    def test_bf16_resume(self, tiny_setup, tmp_path):
        """Resume round-trips through disk with a bf16 trunk (the production
        config): prev_seq/prev_pair carries are bfloat16 (ADVICE r2)."""
        from abx_tpu.sampling.sampler import _save_npz
        import ml_dtypes
        cfg, diffuser, _, _, feats = tiny_setup
        l_ab = cfg.data.max_antibody_len
        model = ScoreNetwork(cfg.model, diffuser=diffuser,
                             antibody_len=l_ab, dtype=jnp.bfloat16)
        init_batch = FeatureBuilder()(
            {k: jnp.asarray(v) for k, v in feats.items()})
        init_batch = make_diffuser_features(
            init_batch, diffuser=diffuser, generate_area='H3',
            key=jax.random.PRNGKey(0), mode='design')
        params = model.init(jax.random.PRNGKey(0), init_batch,
                            compute_loss=True)
        sampler = Sampler(model, diffuser, cfg.model,
                          SamplerConfig(num_t=6, mode='design'))
        key = jax.random.PRNGKey(11)
        want = sampler.sample_resumable(params, feats, key, chunk_steps=3)

        # Crash sim: one chunk, persist state (bf16 carries), resume.
        state_path = str(tmp_path / 'bf16_state.npz')
        ts, ts_model, is_prime, refresh = sampler._step_grids()
        state, static, static_acts, dmask, k_scan = sampler._init(
            params, feats, key)
        assert state['prev_pair'].dtype == jnp.bfloat16
        state, k_scan, _ = sampler._run_chunk(
            params, sampler.esm_params, static, static_acts, dmask, state,
            k_scan, (ts[:3], ts_model[:3], is_prime[:3], refresh[:3], {}))
        host = {k: np.asarray(v) for k, v in state.items()}
        assert host['prev_pair'].dtype == ml_dtypes.bfloat16
        host['__key__'] = np.asarray(k_scan)
        host['__chunk_pos__'] = np.asarray(3)
        _save_npz(state_path, host)

        resumed = sampler.sample_resumable(params, feats, key,
                                           chunk_steps=3,
                                           state_path=state_path)
        np.testing.assert_allclose(np.asarray(resumed['atom14']),
                                   np.asarray(want['atom14']),
                                   rtol=2e-2, atol=2e-2)
        np.testing.assert_array_equal(np.asarray(resumed['seq']),
                                      np.asarray(want['seq']))

    def test_trajectory_resume_returns_full_trajectory(self, tiny_setup,
                                                       tmp_path):
        """With collect_trajectory, completed chunks persist beside the state
        file so a resumed run returns ALL steps (round-2 caveat removed)."""
        from abx_tpu.sampling.sampler import _save_npz
        cfg, diffuser, model, params, feats = tiny_setup
        sampler = Sampler(model, diffuser, cfg.model,
                          SamplerConfig(num_t=6, mode='trajectory',
                                        collect_trajectory=True))
        key = jax.random.PRNGKey(5)
        want = sampler.sample_resumable(params, feats, key, chunk_steps=3)
        assert want['trajectory']['t'].shape[0] == 6

        # Crash sim via the sampler's own persistence: first chunk, then
        # save state + trajectory sidecar the way sample_resumable does.
        state_path = str(tmp_path / 'traj_state.npz')
        ts, ts_model, is_prime, refresh = sampler._step_grids()
        state, static, static_acts, dmask, k_scan = sampler._init(
            params, feats, key)
        state, k_scan, steps_out = sampler._run_chunk(
            params, sampler.esm_params, static, static_acts, dmask, state,
            k_scan, (ts[:3], ts_model[:3], is_prime[:3], refresh[:3], {}))
        host = {k: np.asarray(v) for k, v in state.items()}
        host['__key__'] = np.asarray(k_scan)
        host['__chunk_pos__'] = np.asarray(3)
        _save_npz(state_path, host)
        acc = jax.tree.map(np.asarray, steps_out)
        _save_npz(state_path + '.traj',
                  {'steps/' + k: v for k, v in acc.items()})

        resumed = sampler.sample_resumable(params, feats, key,
                                           chunk_steps=3,
                                           state_path=state_path)
        assert resumed['trajectory']['t'].shape[0] == 6
        np.testing.assert_allclose(
            np.asarray(resumed['trajectory']['atom14']),
            np.asarray(want['trajectory']['atom14']),
            rtol=1e-5, atol=1e-5)
        assert not os.path.exists(state_path + '.traj')


class TestAotSampler:
    def test_aot_export_load_matches_jit(self, tiny_setup, tmp_path):
        """enable_aot: first call exports StableHLO, a FRESH sampler loads
        the blob (no retrace) and reproduces the jitted output."""
        cfg, diffuser, model, params, feats = tiny_setup
        scfg = SamplerConfig(num_t=3, mode='design')
        key = jax.random.PRNGKey(4)

        plain = Sampler(model, diffuser, cfg.model, scfg)
        want = plain.sample(params, feats, key)

        aot_dir = str(tmp_path / 'aot')
        s1 = Sampler(model, diffuser, cfg.model, scfg)
        s1.enable_aot(aot_dir)
        got1 = s1.sample(params, feats, key)
        blobs = os.listdir(aot_dir)
        assert len(blobs) == 1 and blobs[0].endswith('.stablehlo')

        s2 = Sampler(model, diffuser, cfg.model, scfg)
        s2.enable_aot(aot_dir)
        got2 = s2.sample(params, feats, key)
        assert os.listdir(aot_dir) == blobs  # reused, not re-exported

        for got in (got1, got2):
            np.testing.assert_allclose(np.asarray(got['atom14']),
                                       np.asarray(want['atom14']),
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_array_equal(np.asarray(got['seq']),
                                          np.asarray(want['seq']))
