"""ESM2 port tests: tokenization, extraction, encoder behavior, integration."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from abx_tpu.common import residue_constants as rc
from abx_tpu.models import esm as esm_lib
from abx_tpu.models.esm import (AATYPE_TO_ESM, ESM2, ESM2Config, ESM_CLS,
                                ESM_EOS, ESM_GLY, ESM_PAD, build_esm_tokens,
                                extract_antibody_reprs)


class TestTokenization:
    def test_aa_map_roundtrip(self):
        # Every aa maps to the fair-esm id of the same letter.
        for i, aa in enumerate(rc.restypes):
            assert AATYPE_TO_ESM[i] == esm_lib.ESM_TOKEN_OF_AA[aa]

    def test_build_tokens_layout(self):
        l_ab = 12
        h, lt = 5, 4
        aatype = np.arange(l_ab) % 20
        tokens = np.asarray(build_esm_tokens(
            jnp.asarray(aatype[None]), jnp.asarray([h]), jnp.asarray([lt]),
            sep_pad_num=3))[0]
        assert tokens[0] == ESM_CLS
        np.testing.assert_array_equal(tokens[1:1 + h],
                                      AATYPE_TO_ESM[aatype[:h]])
        np.testing.assert_array_equal(tokens[1 + h:1 + h + 3], ESM_GLY)
        np.testing.assert_array_equal(
            tokens[1 + h + 3:1 + h + 3 + lt],
            AATYPE_TO_ESM[aatype[h:h + lt]])
        assert tokens[1 + h + 3 + lt] == ESM_EOS
        assert np.all(tokens[1 + h + 3 + lt + 1:] == ESM_PAD)

    def test_extract_inverse_of_build(self):
        l_ab = 10
        h, lt = 6, 3
        # Fake reprs whose value encodes the esm position.
        l_esm = l_ab + 4 + 2
        reprs = jnp.tile(
            jnp.arange(l_esm, dtype=jnp.float32)[None, :, None, None],
            (1, 1, 2, 1))
        out = np.asarray(extract_antibody_reprs(
            reprs, jnp.asarray([h]), jnp.asarray([lt]), l_ab,
            sep_pad_num=4))[0, :, 0, 0]
        # Heavy positions 0..5 -> esm 1..6; light 6..8 -> esm 11..13.
        np.testing.assert_array_equal(out[:6], np.arange(1, 7))
        np.testing.assert_array_equal(out[6:9], np.arange(11, 14))
        # Padded tail is zeroed.
        assert np.all(out[9:] == 0)


class TestEncoder:
    @pytest.fixture(scope='class')
    def tiny_esm(self):
        cfg = ESM2Config.tiny()
        model = ESM2(cfg)
        tokens = jnp.asarray(
            np.random.RandomState(0).randint(4, 24, (2, 16)), jnp.int32)
        tokens = tokens.at[:, 0].set(ESM_CLS).at[:, -1].set(ESM_PAD)
        params = model.init(jax.random.PRNGKey(0), tokens)
        return cfg, model, params, tokens

    def test_output_shape(self, tiny_esm):
        cfg, model, params, tokens = tiny_esm
        out = model.apply(params, tokens)
        assert out.shape == (2, 16, cfg.embed_dim, cfg.num_layers + 1)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_padding_does_not_leak(self, tiny_esm):
        cfg, model, params, tokens = tiny_esm
        out1 = model.apply(params, tokens)
        # Change a PAD token's surroundings: set last position to a residue
        # in a copy, verify non-pad positions change only if input changed.
        tokens2 = tokens.at[:, -1].set(ESM_PAD)  # same
        out2 = model.apply(params, tokens2)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))

    def test_final_only_matches_last_layer(self, tiny_esm):
        """final_only returns the post-LN last layer without the stack."""
        cfg, model, params, tokens = tiny_esm
        full = model.apply(params, tokens)
        final = model.apply(params, tokens, final_only=True)
        assert final.shape == (2, 16, cfg.embed_dim)
        np.testing.assert_allclose(np.asarray(full[..., -1]),
                                   np.asarray(final), atol=1e-6)

    def test_released_size_head_table(self):
        """Released ESM2 sizes use 20 heads except 3B/15B (40); the naive
        embed_dim//64 miscounts the 150M/35M/8M models."""
        from abx_tpu.models.esm import esm2_num_heads
        assert esm2_num_heads(2560) == 40   # t36_3B
        assert esm2_num_heads(1280) == 20   # t33_650M
        assert esm2_num_heads(640) == 20    # t30_150M (not 10)
        assert esm2_num_heads(480) == 20    # t12_35M (not 7)
        assert esm2_num_heads(320) == 20    # t6_8M (not 5)
        assert esm2_num_heads(640, override=16) == 16

    def test_rotary_translation_sensitivity(self, tiny_esm):
        """Rotary attention is position-aware: permuting tokens changes
        outputs beyond the permutation itself."""
        cfg, model, params, tokens = tiny_esm
        rolled = jnp.roll(tokens, 1, axis=1)
        out1 = np.asarray(model.apply(params, tokens))
        out2 = np.asarray(model.apply(params, rolled))
        rolled_out1 = np.roll(out1, 1, axis=1)
        assert not np.allclose(out2, rolled_out1, atol=1e-4)

    def test_weighted_sum_matches_stack(self, tiny_esm):
        """The incremental layer-weighted path equals reducing the full
        stack (the trunk's einsum) — the stack is just never built."""
        cfg, model, params, tokens = tiny_esm
        w = jax.nn.softmax(jnp.asarray(
            np.random.RandomState(3).randn(cfg.num_layers + 1)))
        full = model.apply(params, tokens)
        expect = jnp.einsum('blcn,n->blc', full.astype(jnp.float32), w)
        got = model.apply(params, tokens, layer_weights=w)
        assert got.shape == (2, 16, cfg.embed_dim)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                                   atol=1e-5)

    def test_scan_layers_matches_unrolled(self, tiny_esm):
        """nn.scan over stacked layer params reproduces the unrolled
        encoder exactly (full stack and weighted paths)."""
        from abx_tpu.models.esm import stack_layer_params
        cfg, model, params, tokens = tiny_esm
        scan_model = ESM2(cfg, scan_layers=True)
        scan_params = stack_layer_params(params, cfg.num_layers)
        np.testing.assert_allclose(
            np.asarray(scan_model.apply(scan_params, tokens)),
            np.asarray(model.apply(params, tokens)), atol=2e-5)
        w = jax.nn.softmax(jnp.arange(cfg.num_layers + 1, dtype=jnp.float32))
        np.testing.assert_allclose(
            np.asarray(scan_model.apply(scan_params, tokens,
                                        layer_weights=w)),
            np.asarray(model.apply(params, tokens, layer_weights=w)),
            atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(scan_model.apply(scan_params, tokens,
                                        final_only=True)),
            np.asarray(model.apply(params, tokens, final_only=True)),
            atol=2e-5)


class TestIntegration:
    def test_esm_conditioned_model_forward(self):
        """Full ScoreNetwork with esm.enabled and a tiny ESM encoder."""
        from abx_tpu.config import tiny_model_config
        from abx_tpu.data.features import (FeatureBuilder,
                                           make_diffuser_features)
        from abx_tpu.diffusion.joint import JointConfig, JointDiffuser
        from abx_tpu.models.network import ScoreNetwork

        cfg = tiny_model_config()
        with cfg.unlocked():
            cfg.model.embeddings_and_seqformer.esm.enabled = True
            cfg.model.embeddings_and_seqformer.esm.num_layers = 2
            cfg.model.embeddings_and_seqformer.esm.embed_channel = 64
        diffuser = JointDiffuser(
            JointConfig.from_dict(cfg.diffuser.to_dict()))
        l_ab, l_ag = cfg.data.max_antibody_len, cfg.data.max_antigen_len
        l = l_ab + l_ag
        rng = np.random.RandomState(0)
        anchor = np.zeros((1, l_ab), np.int32)
        anchor[:, 10] = 5
        anchor[:, 20] = 5
        batch = {
            'seq': jnp.asarray(rng.randint(0, 20, (1, l)), jnp.int32),
            'mask': jnp.ones((1, l)),
            'atom14_gt_positions': jnp.asarray(
                5.0 * rng.randn(1, l, 14, 3), jnp.float32),
            'atom14_gt_exists': jnp.ones((1, l, 14)),
            'cdr_def': jnp.zeros((1, l), jnp.int32),
            'chain_id': jnp.zeros((1, l), jnp.int32),
            'residx': jnp.tile(jnp.arange(l, dtype=jnp.int32), (1, 1)),
            'anchor_flag': jnp.asarray(anchor),
            'heavy_len': jnp.asarray([30], jnp.int32),
            'light_len': jnp.asarray([15], jnp.int32),
        }
        batch = FeatureBuilder()(batch)
        batch = make_diffuser_features(
            batch, diffuser=diffuser, generate_area='H3',
            key=jax.random.PRNGKey(0), mode='design')

        # Tiny ESM with its own params, exposed as esm_fn.
        esm_cfg = ESM2Config.tiny()
        esm_model = ESM2(esm_cfg, dtype=jnp.float32)
        dummy_tokens = build_esm_tokens(
            batch['seq_t'][:, :l_ab], batch['heavy_len'],
            batch['light_len'])
        esm_params = esm_model.init(jax.random.PRNGKey(1), dummy_tokens)

        def esm_fn(ab_aatype, heavy_len, light_len, layer_weights=None):
            tokens = build_esm_tokens(ab_aatype, heavy_len, light_len)
            reprs = esm_model.apply(esm_params, tokens,
                                    layer_weights=layer_weights)
            return extract_antibody_reprs(reprs, heavy_len, light_len, l_ab)

        model = ScoreNetwork(cfg.model, diffuser=diffuser, antibody_len=l_ab)
        params = model.init(jax.random.PRNGKey(0), batch, esm_fn=esm_fn)
        out = model.apply(params, batch, esm_fn=esm_fn)
        assert np.all(np.isfinite(
            np.asarray(out['heads']['folding']['rigids'])))
        # ESM weights participate: changing ESM params changes the output.
        esm_params2 = jax.tree.map(lambda x: x + 0.05, esm_params)

        def esm_fn2(ab_aatype, heavy_len, light_len, layer_weights=None):
            tokens = build_esm_tokens(ab_aatype, heavy_len, light_len)
            reprs = esm_model.apply(esm_params2, tokens,
                                    layer_weights=layer_weights)
            return extract_antibody_reprs(reprs, heavy_len, light_len, l_ab)

        out2 = model.apply(params, batch, esm_fn=esm_fn2)
        assert not np.allclose(
            np.asarray(out['heads']['sequence_module']['logits']),
            np.asarray(out2['heads']['sequence_module']['logits']))


class TestSamplerWithESM:
    def test_esm_conditioned_sampling(self):
        """Tiny ESM threaded through the full scanned sampler."""
        from abx_tpu.config import tiny_model_config
        from abx_tpu.data.features import (FeatureBuilder,
                                           make_diffuser_features)
        from abx_tpu.diffusion.joint import JointConfig, JointDiffuser
        from abx_tpu.models.network import ScoreNetwork
        from abx_tpu.sampling.sampler import Sampler, SamplerConfig

        cfg = tiny_model_config()
        with cfg.unlocked():
            cfg.model.embeddings_and_seqformer.esm.enabled = True
            cfg.model.embeddings_and_seqformer.esm.num_layers = 2
            cfg.model.embeddings_and_seqformer.esm.embed_channel = 64
        diffuser = JointDiffuser(
            JointConfig.from_dict(cfg.diffuser.to_dict()))
        l_ab, l_ag = cfg.data.max_antibody_len, cfg.data.max_antigen_len
        l = l_ab + l_ag
        rng = np.random.RandomState(1)
        anchor = np.zeros((1, l_ab), np.int32)
        anchor[:, 10] = 5
        anchor[:, 20] = 5
        feats = {
            'seq': rng.randint(0, 20, (1, l)).astype(np.int32),
            'mask': np.ones((1, l), np.float32),
            'atom14_gt_positions': (5.0 * rng.randn(1, l, 14, 3)).astype(
                np.float32),
            'atom14_gt_exists': np.ones((1, l, 14), np.float32),
            'cdr_def': np.zeros((1, l), np.int32),
            'chain_id': np.zeros((1, l), np.int32),
            'residx': np.tile(np.arange(l, dtype=np.int32), (1, 1)),
            'anchor_flag': anchor,
            'heavy_len': np.asarray([30], np.int32),
            'light_len': np.asarray([15], np.int32),
        }
        # Production shape: pure esm_fn + explicit esm_params threaded
        # through jit as a runtime argument (scan-layers AntibodyESM).
        from abx_tpu.models.esm import AntibodyESM, stack_layer_params
        esm_cfg = ESM2Config.tiny()
        esm_model = ESM2(esm_cfg, dtype=jnp.float32)
        tok = build_esm_tokens(jnp.asarray(feats['seq'][:, :l_ab]),
                               jnp.asarray(feats['heavy_len']),
                               jnp.asarray(feats['light_len']))
        esm_params = stack_layer_params(
            esm_model.init(jax.random.PRNGKey(1), tok), esm_cfg.num_layers)
        esm_fn = AntibodyESM(esm_cfg, l_ab, dtype=jnp.float32,
                             scan_layers=True)

        model = ScoreNetwork(cfg.model, diffuser=diffuser, antibody_len=l_ab)
        init_batch = FeatureBuilder()(
            {k: jnp.asarray(v) for k, v in feats.items()})
        init_batch = make_diffuser_features(
            init_batch, diffuser=diffuser, generate_area='H3',
            key=jax.random.PRNGKey(0), mode='design')
        params = model.init(
            jax.random.PRNGKey(0), init_batch,
            esm_fn=lambda *a, **kw: esm_fn(esm_params, *a, **kw))

        sampler = Sampler(model, diffuser, cfg.model,
                          SamplerConfig(num_t=2, mode='design'),
                          esm_fn=esm_fn, esm_params=esm_params)
        out = sampler.sample(params, feats, jax.random.PRNGKey(0))
        assert np.all(np.isfinite(np.asarray(out['atom14'])))


class TestESMReuseRecycles:
    """Opt-in esm_reuse_recycles: one ESM pass per diffusion step, reused
    across recycle passes (SamplerConfig.esm_reuse_recycles)."""

    def _setup(self, num_recycle):
        from abx_tpu.config import tiny_model_config
        from abx_tpu.data.features import (FeatureBuilder,
                                           make_diffuser_features)
        from abx_tpu.diffusion.joint import JointConfig, JointDiffuser
        from abx_tpu.models.esm import AntibodyESM, stack_layer_params
        from abx_tpu.models.network import ScoreNetwork

        cfg = tiny_model_config()
        with cfg.unlocked():
            cfg.model.embeddings_and_seqformer.esm.enabled = True
            cfg.model.embeddings_and_seqformer.esm.num_layers = 2
            cfg.model.embeddings_and_seqformer.esm.embed_channel = 64
            cfg.model.num_recycle = num_recycle
        diffuser = JointDiffuser(
            JointConfig.from_dict(cfg.diffuser.to_dict()))
        l_ab, l_ag = cfg.data.max_antibody_len, cfg.data.max_antigen_len
        l = l_ab + l_ag
        rng = np.random.RandomState(3)
        anchor = np.zeros((1, l_ab), np.int32)
        anchor[:, 10] = 5
        anchor[:, 20] = 5
        feats = {
            'seq': rng.randint(0, 20, (1, l)).astype(np.int32),
            'mask': np.ones((1, l), np.float32),
            'atom14_gt_positions': (5.0 * rng.randn(1, l, 14, 3)).astype(
                np.float32),
            'atom14_gt_exists': np.ones((1, l, 14), np.float32),
            'cdr_def': np.zeros((1, l), np.int32),
            'chain_id': np.zeros((1, l), np.int32),
            'residx': np.tile(np.arange(l, dtype=np.int32), (1, 1)),
            'anchor_flag': anchor,
            'heavy_len': np.asarray([30], np.int32),
            'light_len': np.asarray([15], np.int32),
        }
        esm_cfg = ESM2Config.tiny()
        esm_model = ESM2(esm_cfg, dtype=jnp.float32)
        tok = build_esm_tokens(jnp.asarray(feats['seq'][:, :l_ab]),
                               jnp.asarray(feats['heavy_len']),
                               jnp.asarray(feats['light_len']))
        esm_params = stack_layer_params(
            esm_model.init(jax.random.PRNGKey(1), tok), esm_cfg.num_layers)
        esm_fn = AntibodyESM(esm_cfg, l_ab, dtype=jnp.float32,
                             scan_layers=True)
        model = ScoreNetwork(cfg.model, diffuser=diffuser, antibody_len=l_ab)
        init_batch = FeatureBuilder()(
            {k: jnp.asarray(v) for k, v in feats.items()})
        init_batch = make_diffuser_features(
            init_batch, diffuser=diffuser, generate_area='H3',
            key=jax.random.PRNGKey(0), mode='design')
        params = model.init(
            jax.random.PRNGKey(0), init_batch,
            esm_fn=lambda *a, **kw: esm_fn(esm_params, *a, **kw))
        return cfg, diffuser, model, params, esm_fn, esm_params, feats

    def _sample(self, setup, reuse, counter=None, refresh_every=1,
                num_t=2, resumable=None):
        from abx_tpu.sampling.sampler import Sampler, SamplerConfig
        cfg, diffuser, model, params, esm_fn, esm_params, feats = setup
        fn = esm_fn
        if counter is not None:
            def fn(ep, *a, **kw):
                counter[0] += 1
                return esm_fn(ep, *a, **kw)
        sampler = Sampler(model, diffuser, cfg.model,
                          SamplerConfig(num_t=num_t, mode='design',
                                        esm_reuse_recycles=reuse,
                                        esm_refresh_every=refresh_every),
                          esm_fn=fn, esm_params=esm_params)
        if resumable is not None:
            return sampler.sample_resumable(params, feats,
                                            jax.random.PRNGKey(0),
                                            chunk_steps=resumable)
        return sampler.sample(params, feats, jax.random.PRNGKey(0))

    def test_no_recycles_reuse_is_identity(self):
        """With num_recycle=0 every pass sees the step's input seq_t, so
        hoisting the ESM forward is exact: outputs match bitwise."""
        setup = self._setup(num_recycle=0)
        out_off = self._sample(setup, reuse=False)
        out_on = self._sample(setup, reuse=True)
        np.testing.assert_array_equal(np.asarray(out_off['atom14']),
                                      np.asarray(out_on['atom14']))
        np.testing.assert_array_equal(np.asarray(out_off['seq']),
                                      np.asarray(out_on['seq']))

    def test_one_esm_trace_per_step(self):
        """Trace-time ESM call count inside the scanned step: the default
        path embeds ESM twice in the program (fori-loop recycle body + final
        pass); reuse embeds it once."""
        setup = self._setup(num_recycle=2)
        c_off, c_on = [0], [0]
        out_off = self._sample(setup, reuse=False, counter=c_off)
        out_on = self._sample(setup, reuse=True, counter=c_on)
        assert c_off[0] == 2 and c_on[0] == 1
        assert np.all(np.isfinite(np.asarray(out_on['atom14'])))
        # Output-changing by design (recycle passes no longer see the
        # recycled predicted sequence through ESM).
        assert not np.array_equal(np.asarray(out_off['atom14']),
                                  np.asarray(out_on['atom14']))

    def test_refresh_every_runs_and_differs(self):
        """esm_refresh_every=2: the cached embedding rides the scan carry
        and is recomputed only on refresh steps — finite output, differs
        from per-step recomputation, and the ESM forward is embedded once
        (inside the lax.cond refresh branch)."""
        setup = self._setup(num_recycle=1)
        c1, c2 = [0], [0]
        out_k1 = self._sample(setup, reuse=True, counter=c1, num_t=4)
        out_k2 = self._sample(setup, reuse=True, counter=c2, num_t=4,
                              refresh_every=2)
        # k=1: one in-scan trace.  k=2: one in-scan trace (the cond's
        # refresh branch) plus one ABSTRACT eval_shape trace seeding the
        # carried cache (zero device FLOPs — jax.eval_shape).
        assert c1[0] == 1 and c2[0] == 2
        assert np.all(np.isfinite(np.asarray(out_k2['atom14'])))
        assert not np.array_equal(np.asarray(out_k1['atom14']),
                                  np.asarray(out_k2['atom14']))

    def test_refresh_cache_survives_chunked_resume(self):
        """sample_resumable carries the ESM cache across chunk boundaries:
        a chunked run matches the single-scan run bitwise."""
        setup = self._setup(num_recycle=1)
        want = self._sample(setup, reuse=True, num_t=4, refresh_every=3)
        got = self._sample(setup, reuse=True, num_t=4, refresh_every=3,
                           resumable=2)
        np.testing.assert_array_equal(np.asarray(want['atom14']),
                                      np.asarray(got['atom14']))
        np.testing.assert_array_equal(np.asarray(want['seq']),
                                      np.asarray(got['seq']))


class TestTrainerWithESM:
    def test_esm_conditioned_train_step(self):
        """Frozen-ESM conditioning through the training step (the
        reference's training configuration, encoder.py:32): loss finite,
        trunk params (incl. the esm projection) update, ESM params are a
        runtime argument that never enters the optimizer state."""
        from abx_tpu.config import tiny_model_config
        from abx_tpu.diffusion.joint import JointConfig, JointDiffuser
        from abx_tpu.models.esm import AntibodyESM, stack_layer_params
        from abx_tpu.models.network import ScoreNetwork
        from abx_tpu.train.trainer import TrainConfig, Trainer

        cfg = tiny_model_config()
        with cfg.unlocked():
            cfg.model.embeddings_and_seqformer.esm.enabled = True
            cfg.model.embeddings_and_seqformer.esm.num_layers = 2
            cfg.model.embeddings_and_seqformer.esm.embed_channel = 64
        diffuser = JointDiffuser(
            JointConfig.from_dict(cfg.diffuser.to_dict()))
        l_ab, l_ag = cfg.data.max_antibody_len, cfg.data.max_antigen_len
        l = l_ab + l_ag
        rng = np.random.RandomState(3)
        anchor = np.zeros((1, l_ab), np.int32)
        anchor[:, 10] = 5
        anchor[:, 20] = 5
        batch = {
            'seq': rng.randint(0, 20, (1, l)).astype(np.int32),
            'mask': np.ones((1, l), np.float32),
            'atom14_gt_positions': (5.0 * rng.randn(1, l, 14, 3)).astype(
                np.float32),
            'atom14_gt_exists': np.ones((1, l, 14), np.float32),
            'cdr_def': np.zeros((1, l), np.int32),
            'chain_id': np.zeros((1, l), np.int32),
            'residx': np.tile(np.arange(l, dtype=np.int32), (1, 1)),
            'anchor_flag': anchor,
            'heavy_len': np.asarray([30], np.int32),
            'light_len': np.asarray([15], np.int32),
        }
        batch = {k: jnp.asarray(v) for k, v in batch.items()}

        esm_cfg = ESM2Config.tiny()
        esm_model = ESM2(esm_cfg, dtype=jnp.float32)
        tok = build_esm_tokens(batch['seq'][:, :l_ab], batch['heavy_len'],
                               batch['light_len'])
        esm_params = stack_layer_params(
            esm_model.init(jax.random.PRNGKey(1), tok), esm_cfg.num_layers)
        esm_fn = AntibodyESM(esm_cfg, l_ab, dtype=jnp.float32,
                             scan_layers=True)

        model = ScoreNetwork(cfg.model, diffuser=diffuser,
                             antibody_len=l_ab)
        from abx_tpu.data.features import (FeatureBuilder,
                                           make_diffuser_features)
        init_batch = FeatureBuilder()(dict(batch))
        init_batch = make_diffuser_features(
            init_batch, diffuser=diffuser, generate_area='H3',
            key=jax.random.PRNGKey(0), mode='design')
        params = model.init(
            jax.random.PRNGKey(0), init_batch, compute_loss=True,
            esm_fn=lambda *a, **kw: esm_fn(esm_params, *a, **kw))

        trainer = Trainer(model, diffuser, cfg.model, cfg.loss,
                          TrainConfig(learning_rate=1e-3, warmup_steps=1,
                                      ema_decay=0.0),
                          esm_fn=esm_fn, esm_params=esm_params)
        state = trainer.init_state(params)
        # Two steps: warmup LR is 0 at the very first update.
        state2, metrics = trainer.step(state, batch, jax.random.PRNGKey(2))
        state2, metrics = trainer.step(state2, batch, jax.random.PRNGKey(3))
        assert np.isfinite(float(metrics['total']))
        # The esm projection weights receive gradient (ESM participates).
        def find_esm_proj(tree):
            flat = jax.tree_util.tree_flatten_with_path(tree)[0]
            return [(jax.tree_util.keystr(k), v) for k, v in flat
                    if 'esm' in jax.tree_util.keystr(k).lower()]
        before = dict(find_esm_proj(state['params']))
        after = dict(find_esm_proj(state2['params']))
        assert before, 'esm projection params missing from the trunk tree'
        changed = [k for k in before
                   if not np.allclose(np.asarray(before[k]),
                                      np.asarray(after[k]))]
        assert changed, 'no esm-related trunk param updated'


class TestTensorParallelESM:
    """Megatron-sharded frozen ESM over a ('data', 'model') mesh
    (parallel/esm_tp.py): column/row-sharded layer params via shard_map,
    exact agreement with the single-device module."""

    @pytest.fixture(scope='class')
    def setup(self):
        from abx_tpu.models.esm import AntibodyESM
        from abx_tpu.parallel.esm_tp import (TensorParallelAntibodyESM,
                                             mesh2d, shard_esm_params)
        cfg = ESM2Config(num_layers=2, embed_dim=64, attention_heads=4)
        l_ab = 24
        ref = AntibodyESM(cfg, l_ab, dtype=jnp.float32, scan_layers=True)
        rng = np.random.RandomState(0)
        aa = jnp.asarray(rng.randint(0, 20, (4, l_ab)), jnp.int32)
        hl = jnp.array([12, 10, 14, 12], jnp.int32)
        ll = jnp.array([8, 9, 6, 8], jnp.int32)
        params = ref.module.init(jax.random.PRNGKey(0),
                                 build_esm_tokens(aa, hl, ll))
        w = jax.nn.softmax(
            jnp.asarray(rng.randn(cfg.num_layers + 1), jnp.float32))
        mesh = mesh2d(2, 4)
        tp = TensorParallelAntibodyESM(mesh, cfg, l_ab, dtype=jnp.float32)
        return dict(cfg=cfg, l_ab=l_ab, ref=ref, aa=aa, hl=hl, ll=ll,
                    params=params, w=w, mesh=mesh, tp=tp,
                    sharded=shard_esm_params(mesh, params))

    def test_param_specs(self, setup):
        """Column-parallel leaves shard their last axis, row-parallel
        kernels their input axis; everything else is replicated."""
        from jax.sharding import PartitionSpec as P
        from abx_tpu.parallel.esm_tp import esm_param_specs
        specs = esm_param_specs(setup['params'])
        layer = specs['params']['layers']['layer']
        attn = layer['self_attn']
        assert attn['q_proj']['kernel'] == P(None, None, 'model')
        assert attn['q_proj']['bias'] == P(None, 'model')
        assert attn['out_proj']['kernel'] == P(None, 'model', None)
        assert attn['out_proj']['bias'] == P()
        assert layer['fc1']['kernel'] == P(None, None, 'model')
        assert layer['fc2']['kernel'] == P(None, 'model', None)
        assert layer['fc2']['bias'] == P()
        assert layer['self_attn_layer_norm']['scale'] == P()
        assert specs['params']['embed_tokens']['embedding'] == P()

    def test_sharded_param_footprint(self, setup):
        """Each device holds 1/tp of every column/row-sharded kernel."""
        k = setup['sharded']['params']['layers']['layer']['fc1']['kernel']
        shard = k.addressable_shards[0]
        assert shard.data.shape[-1] == k.shape[-1] // 4

    def test_matches_single_device(self, setup):
        s = setup
        out_ref = s['ref'](s['params'], s['aa'], s['hl'], s['ll'], s['w'])
        out_tp = s['tp'](s['sharded'], s['aa'], s['hl'], s['ll'], s['w'])
        np.testing.assert_allclose(np.asarray(out_tp), np.asarray(out_ref),
                                   rtol=1e-5, atol=1e-5)

    def test_matches_under_jit_and_replicated_input(self, setup):
        s = setup
        out_ref = s['ref'](s['params'], s['aa'], s['hl'], s['ll'], s['w'])
        fn = jax.jit(lambda p, a: s['tp'](p, a, s['hl'], s['ll'], s['w']))
        np.testing.assert_allclose(np.asarray(fn(s['sharded'], s['aa'])),
                                   np.asarray(out_ref), rtol=1e-5, atol=1e-5)
        # A replicated tree is resharded to the in_specs by shard_map.
        out_rep = s['tp'](s['params'], s['aa'], s['hl'], s['ll'], s['w'])
        np.testing.assert_allclose(np.asarray(out_rep), np.asarray(out_ref),
                                   rtol=1e-5, atol=1e-5)

    def test_sampler_end_to_end_tp(self):
        """Full scanned sampler with the tp esm_fn over a (2, 4) mesh ==
        the single-device esm_fn run (dp=2 batch sharding x tp=4 ESM)."""
        from abx_tpu.config import tiny_model_config
        from abx_tpu.data.features import (FeatureBuilder,
                                           make_diffuser_features)
        from abx_tpu.diffusion.joint import JointConfig, JointDiffuser
        from abx_tpu.models.esm import AntibodyESM, stack_layer_params
        from abx_tpu.models.network import ScoreNetwork
        from abx_tpu.parallel import mesh as mesh_lib
        from abx_tpu.parallel.esm_tp import (TensorParallelAntibodyESM,
                                             mesh2d, shard_esm_params)
        from abx_tpu.sampling.sampler import Sampler, SamplerConfig

        cfg = tiny_model_config()
        with cfg.unlocked():
            cfg.model.embeddings_and_seqformer.esm.enabled = True
            cfg.model.embeddings_and_seqformer.esm.num_layers = 2
            cfg.model.embeddings_and_seqformer.esm.embed_channel = 64
        diffuser = JointDiffuser(
            JointConfig.from_dict(cfg.diffuser.to_dict()))
        l_ab, l_ag = cfg.data.max_antibody_len, cfg.data.max_antigen_len
        l = l_ab + l_ag
        b = 2
        rng = np.random.RandomState(1)
        anchor = np.zeros((b, l_ab), np.int32)
        anchor[:, 10] = 5
        anchor[:, 20] = 5
        feats = {
            'seq': rng.randint(0, 20, (b, l)).astype(np.int32),
            'mask': np.ones((b, l), np.float32),
            'atom14_gt_positions': (5.0 * rng.randn(b, l, 14, 3)).astype(
                np.float32),
            'atom14_gt_exists': np.ones((b, l, 14), np.float32),
            'cdr_def': np.zeros((b, l), np.int32),
            'chain_id': np.zeros((b, l), np.int32),
            'residx': np.tile(np.arange(l, dtype=np.int32), (b, 1)),
            'anchor_flag': anchor,
            'heavy_len': np.full((b,), 30, np.int32),
            'light_len': np.full((b,), 15, np.int32),
        }
        esm_cfg = ESM2Config.tiny()
        esm_model = ESM2(esm_cfg, dtype=jnp.float32)
        tok = build_esm_tokens(jnp.asarray(feats['seq'][:, :l_ab]),
                               jnp.asarray(feats['heavy_len']),
                               jnp.asarray(feats['light_len']))
        esm_params = stack_layer_params(
            esm_model.init(jax.random.PRNGKey(1), tok), esm_cfg.num_layers)
        esm_fn = AntibodyESM(esm_cfg, l_ab, dtype=jnp.float32,
                             scan_layers=True)

        model = ScoreNetwork(cfg.model, diffuser=diffuser, antibody_len=l_ab)
        init_batch = FeatureBuilder()(
            {k: jnp.asarray(v) for k, v in feats.items()})
        init_batch = make_diffuser_features(
            init_batch, diffuser=diffuser, generate_area='H3',
            key=jax.random.PRNGKey(0), mode='design')
        params = model.init(
            jax.random.PRNGKey(0), init_batch,
            esm_fn=lambda *a, **kw: esm_fn(esm_params, *a, **kw))

        scfg = SamplerConfig(num_t=2, mode='design')
        ref_out = Sampler(model, diffuser, cfg.model, scfg, esm_fn=esm_fn,
                          esm_params=esm_params).sample(
                              params, feats, jax.random.PRNGKey(0))

        mesh = mesh2d(2, 4)
        tp_fn = TensorParallelAntibodyESM(mesh, esm_cfg, l_ab,
                                          dtype=jnp.float32)
        tp_out = Sampler(model, diffuser, cfg.model, scfg, esm_fn=tp_fn,
                         esm_params=shard_esm_params(mesh, esm_params)
                         ).sample(
                             mesh_lib.replicate(mesh, params),
                             mesh_lib.shard_batch(mesh, feats),
                             jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(tp_out['atom14']),
                                   np.asarray(ref_out['atom14']),
                                   rtol=2e-5, atol=2e-5)
